"""Cache-lifecycle hygiene: operators that persist a shared intermediate
must release it before returning (``finish_cached`` / explicit
unpersist), or cached blocks accumulate in executor storage across a
long many-hundred-query session — the leak class the r7 advice flagged
in matryoshka_recall, bm25_prf_topk, keyness_terms, source_loo_value,
dsir_selection and image_ahash_neardup.
"""

from __future__ import annotations

import pytest
from conftest import SF001

FIXED = [
    "matryoshka_recall",
    "bm25_prf_topk",
    "keyness_terms",
    "source_loo_value",
    "dsir_selection",
    "image_ahash_neardup",
]


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", FIXED)
def test_operator_releases_its_cache(spark, name):
    from hadoop_coded_wordcount_spark.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF001)
    assert df.collect()  # the caller's action still works post-release
    assert _cache_empty(spark), f"{name} left entries in the CacheManager"
