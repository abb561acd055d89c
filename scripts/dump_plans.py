#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python scripts/dump_plans.py OUTDIR q1,q2,... [SUFFIX]

Writes OUTDIR/<name>_<SUFFIX>.txt (suffix defaults to "after").
Queries whose plan construction itself runs control-plane jobs (dbscan,
coverage greedy, iterative trainers) execute those jobs here — that is
part of their plan shape and is noted in the dump header.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_coded_wordcount_spark.registry import QUERIES
from hadoop_coded_wordcount_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir = sys.argv[1]
    names = [s.strip() for s in sys.argv[2].split(",") if s.strip()]
    suffix = sys.argv[3] if len(sys.argv) > 3 else "after"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="hcw-dump-plans")
    jvm = spark.sparkContext._jvm
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        finally:
            spark.catalog.clearCache()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF_DIR} ({suffix})\n{txt}")
        print(path, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
