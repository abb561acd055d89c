"""Full oracle sweep: every registry entry vs DuckDB at sf0.01.

This is the in-repo twin of the driver's correctness gate, independent of
registry insertion order: all 87 oracled queries are value-compared
(rows + schema + exact values under the driver's stricter stringified
semantics), and the 11 rows-only entries are checked non-empty.  Any query
added to the registry is picked up automatically.
"""

from __future__ import annotations

import pytest
from conftest import SF001
from oracle_harness import compare

from hadoop_coded_wordcount_spark.registry import ORACLES, QUERIES

ORACLED = [n for n in QUERIES if n in ORACLES]
ROWS_ONLY = [n for n in QUERIES if n not in ORACLES]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_exact(spark, name):
    res = compare(name, spark, SF001, verbose=True)
    assert res["rows"] and res["schema"] and res["exact"], (name, res)
    # signed-zero hazard (the ±0.0 class that cost embedding_covariance
    # the r7 gate): a '-0.0' cell on EITHER leg is a latent stringified-
    # hash failure even when both legs agree today — the zero's sign is
    # engine-order-dependent. Canonicalize with + 0.0 after the round.
    assert res["signed_zeros"] == 0, (name, res)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_nonempty(spark, name):
    res = compare(name, spark, SF001, verbose=True)
    assert res["rows"], (name, res)
    assert res["signed_zeros"] == 0, (name, res)
