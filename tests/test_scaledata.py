"""scripts/make_scaledata.py must preserve referential integrity and
perturb content across copies — checked with DuckDB only (no Spark)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def sf2x(tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "make_scaledata",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "make_scaledata.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.SRC = "/root/testdata/sf0.01"  # small source keeps the test fast
    out = str(tmp_path_factory.mktemp("scaledata") / "sf2x")
    import sys

    argv = sys.argv
    sys.argv = ["make_scaledata.py", out, "2"]
    try:
        mod.main()
    finally:
        sys.argv = argv
    return out


def test_row_counts_scale_and_dims_fixed(sf2x):
    con = duckdb.connect()
    for t, mult in [("orders", 2), ("lineitem", 2), ("customer", 2),
                    ("events", 2), ("documents", 2), ("embeddings", 2),
                    ("region", 1), ("nation", 1)]:
        src = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        ).fetchone()[0]
        got = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{sf2x}/{t}.parquet')"
        ).fetchone()[0]
        assert got == src * mult, t


def test_referential_integrity_across_copies(sf2x):
    con = duckdb.connect()
    orphans = con.execute(f"""
        SELECT COUNT(*) FROM read_parquet('{sf2x}/orders.parquet') o
        LEFT JOIN read_parquet('{sf2x}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL""").fetchone()[0]
    assert orphans == 0
    orphans = con.execute(f"""
        SELECT COUNT(*) FROM read_parquet('{sf2x}/lineitem.parquet') l
        LEFT JOIN read_parquet('{sf2x}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL""").fetchone()[0]
    assert orphans == 0


def test_copies_are_content_perturbed(sf2x):
    con = duckdb.connect()
    # no text collides across copies (dedup workloads keep their shape)
    n, d = con.execute(f"""
        SELECT COUNT(*), COUNT(DISTINCT text)
        FROM read_parquet('{sf2x}/documents.parquet')""").fetchone()
    src_d = con.execute("""
        SELECT COUNT(DISTINCT text)
        FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
    """).fetchone()[0]
    assert d == 2 * src_d
    # embeddings: every copied vector differs from its source
    same = con.execute(f"""
        SELECT COUNT(*)
        FROM read_parquet('{sf2x}/embeddings.parquet') a
        JOIN read_parquet('{sf2x}/embeddings.parquet') b
          ON b.vec_id = a.vec_id + 1000000
        WHERE a.embedding = b.embedding""").fetchone()[0]
    assert same == 0
