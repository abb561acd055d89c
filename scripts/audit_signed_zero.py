"""Engine-wide signed-zero / representation-drift audit.

Runs every registry query against its DuckDB oracle at sf0.01 under the
repr-strict harness and reports, per query:

- ``exact``: values repr-identical after canonical sort (the driver's
  stringified-hash semantics) — a False here predicts a gate failure;
- ``signed_zeros``: count of float cells on EITHER leg whose repr is
  '-0.0'.  Even when both legs agree today, the sign of a sum that
  rounds to zero is engine-order-dependent, so any non-zero count is a
  latent gate hazard (the class that cost embedding_covariance the r7
  gate) and the operator should canonicalize with ``+ 0.0`` after the
  round.

Usage: python scripts/audit_signed_zero.py [--only name1,name2]
Writes a JSON report to /tmp/signed_zero_audit.json and prints offenders.
"""

from __future__ import annotations

import json
import sys
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))

    from oracle_harness import compare
    from hadoop_coded_wordcount_spark.registry import QUERIES
    from hadoop_coded_wordcount_spark.session import get_spark

    spark = get_spark(shuffle_partitions=16)
    report: dict = {}
    names = [n for n in QUERIES if only is None or n in only]
    for i, name in enumerate(names):
        try:
            res = compare(name, spark, verbose=False)
        except Exception as exc:  # keep auditing; report the blowup
            traceback.print_exc()
            res = {"error": f"{type(exc).__name__}: {exc}"}
        report[name] = res
        bad = (
            res.get("error")
            or res.get("exact") is False
            or res.get("signed_zeros", 0) > 0
            or not res.get("rows", True)
        )
        tag = "BAD " if bad else "ok  "
        print(
            f"[{i + 1}/{len(names)}] {tag}{name} "
            f"sz={res.get('signed_zeros', 0)} exact={res.get('exact')}",
            flush=True,
        )
    with open("/tmp/signed_zero_audit.json", "w") as f:
        json.dump(report, f, indent=1)

    offenders = {
        n: r
        for n, r in report.items()
        if r.get("error")
        or r.get("exact") is False
        or r.get("signed_zeros", 0) > 0
        or not r.get("rows", True)
    }
    print("\n=== offenders:", len(offenders))
    for n, r in offenders.items():
        print(" ", n, json.dumps(r))
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
