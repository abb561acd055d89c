"""Local replica of the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet directory, then compares row count, column-name set, and values
(order-insensitive: rows sorted by every column, columns sorted by name).

We demand *exact* value equality (with a tiny float tolerance escape hatch
reported separately) — if values match exactly here, any order-insensitive
value hash the driver computes matches too.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from hadoop_coded_wordcount_spark.sources.catalog import TABLES

SF001 = "/root/testdata/sf0.01"


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # repr-strict, not ==: the driver hashes STRINGIFIED frames, so
        # float-equal values with different representations must fail here
        # exactly as they fail there.  The concrete failure class this
        # catches is the signed zero: 0.0 == -0.0 is True but
        # '0.0' != '-0.0' cost embedding_covariance the r7 gate.
        return repr(a) == repr(b)
    if isinstance(a, float) != isinstance(b, float):
        # int-vs-float REPRESENTATION drift (e.g. DuckDB HUGEINT sums
        # arriving as float64): Python says 99111 == 99111.0, but the
        # driver compares stringified frames ('99111' != '99111.0') —
        # mirror the stricter semantics or this harness green-lights
        # queries the driver will fail.
        return False
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        # element-wise so nested floats get the same repr-strict treatment
        # ([-0.0] == [0.0] is True in Python but mismatches stringified)
        return len(a) == len(b) and all(
            _values_equal(x, y) for x, y in zip(a, b)
        )
    return a == b


def _count_signed_zeros(v) -> int:
    """Count float cells whose repr is '-0.0', recursing into containers.

    A signed zero is a latent gate hazard even when BOTH engines emit it
    today: the sign of a sum that rounds to zero is engine-order-dependent
    in the last ulps, so agreement is luck, not a property.  Operators
    should canonicalize (``+ 0.0`` after the round) instead.
    """
    if hasattr(v, "tolist"):  # numpy scalar or array -> python
        v = v.tolist()
    if isinstance(v, float):
        return 1 if repr(v) == "-0.0" else 0
    if isinstance(v, (list, tuple)):
        return sum(_count_signed_zeros(x) for x in v)
    if isinstance(v, dict):
        return sum(_count_signed_zeros(x) for x in v.values())
    return 0


def compare(name: str, spark, sf_dir: str = SF001, verbose: bool = True) -> dict:
    """Returns {'rows': bool, 'schema': bool, 'exact': bool, 'close': bool}."""
    from hadoop_coded_wordcount_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pd = pd.DataFrame(
        [r.asDict(recursive=True) for r in sdf.collect()], columns=sdf.columns
    )
    if name not in ORACLES:
        out = {
            # no oracle → at least demand the query produces rows (the
            # driver's smoke expectation); a broken empty result must fail
            "rows": len(spark_pd) > 0,
            "schema": True,
            "exact": None,
            "close": None,
            "n": len(spark_pd),
            "signed_zeros": int(
                sum(
                    _count_signed_zeros(v)
                    for col in spark_pd.columns
                    for v in spark_pd[col]
                )
            ),
        }
        if verbose:
            print(f"{name}: rows-only check, n={len(spark_pd)}")
        return out
    con = duckdb_con(sf_dir)
    duck_pd = con.execute(ORACLES[name]).fetchdf()
    con.close()

    res = {"rows": len(spark_pd) == len(duck_pd)}
    res["schema"] = sorted(spark_pd.columns) == sorted(map(str, duck_pd.columns))
    res["n"] = len(spark_pd)
    res["signed_zeros"] = int(
        sum(
            _count_signed_zeros(v)
            for frame in (spark_pd, duck_pd)
            for col in frame.columns
            for v in frame[col]
        )
    )
    exact = close = res["rows"] and res["schema"]
    if exact:
        a, b = _canon(spark_pd), _canon(duck_pd)
        for col in a.columns:
            av, bv = list(a[col]), list(b[col])
            for x, y in zip(av, bv):
                # normalize numpy scalars -> python
                x = x.item() if hasattr(x, "item") else x
                y = y.item() if hasattr(y, "item") else y
                if not _values_equal(x, y):
                    exact = False
                    if isinstance(x, float) and isinstance(y, float) and (
                        math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                    ):
                        continue
                    close = False
                    if verbose:
                        print(f"  {name}.{col}: {x!r} != {y!r}")
                    break
            if not close:
                break
    res["exact"], res["close"] = exact, close
    if verbose:
        flag = "OK " if exact else ("~ok" if close else "FAIL")
        print(f"{name}: {flag} rows={res['rows']} schema={res['schema']} n={res['n']}")
    return res
