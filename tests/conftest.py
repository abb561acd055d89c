from __future__ import annotations

import hashlib
import os

import pytest

from hadoop_coded_wordcount_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

# Tiered suite (r13, VERDICT item 2): the full suite — dominated by the
# two whole-registry parametrized sweeps (oracle sweep + empty-input,
# 434 cases each) — takes ~63 min, which outruns the driver's verify
# window (VERIFY_r12 cut the run at ~73% with zero failures and the
# round lost its green test gate to a timeout).  Default runs therefore
# execute a DETERMINISTIC SAMPLE of each whole-registry sweep — enough
# to exercise the machinery end-to-end on every run — while
# ``SPARK_GRAFT_FULL_SUITE=1`` restores the exhaustive sweeps (the
# builder's certification runs and any pre-close gate still use it).
FULL_SUITE = os.environ.get("SPARK_GRAFT_FULL_SUITE") == "1"


def registry_sample(names, k: int = 30, salt: str = "") -> list:
    """Deterministic pseudo-random sample of registry names.

    Full list when SPARK_GRAFT_FULL_SUITE=1; otherwise the ``k`` names
    whose salted sha1 sorts first — stable across runs and machines,
    insensitive to registry insertion order, and disjoint-ish between
    call sites via ``salt``.
    """
    names = sorted(names)
    if FULL_SUITE or len(names) <= k:
        return names
    names.sort(key=lambda n: hashlib.sha1((salt + n).encode()).hexdigest())
    return sorted(names[:k])


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hcw-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
