"""Cache-lifecycle hygiene: operators that persist a shared intermediate
must release it before returning (``finish_cached`` / explicit
unpersist), or cached blocks accumulate in executor storage across a
long many-hundred-query session — the leak class the r7 advice flagged
in matryoshka_recall, bm25_prf_topk, keyness_terms, source_loo_value,
dsir_selection and image_ahash_neardup.
"""

from __future__ import annotations

import os

import pytest
from conftest import SF001

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXED = [
    "matryoshka_recall",
    "bm25_prf_topk",
    "keyness_terms",
    "source_loo_value",
    "dsir_selection",
    "image_ahash_neardup",
    # second batch: every other bounded-output operator that persisted
    # a shared intermediate
    "conformal_interval",
    "logistic_gd",
    "ols_normal_equations",
    "gbm_stumps",
    "als_rank1",
    "huber_irls",
    "permutation_test",
    "matrix_profile_hourly",
    "theil_decomposition",
    "bm25_topk",
    "naive_bayes_langid",
    "boilerplate_ngrams",
    "qlm_dirichlet_topk",
    "burrows_delta",
    "lsh_tuning_curve",
    "triangle_count_suppliers",
    "contamination_check",
]

#: Operators whose OUTPUT is data-sized (pair sets, per-document stats,
#: vocabulary tables): eagerly checkpointing the output would be worse
#: at scale than the lazy persist, so these keep it — the caller (or a
#: long session's clearCache cadence) owns the lifecycle.
DATA_SIZED_ALLOWED = {
    "minhash_lsh_pairs",
    "simhash_pairs",
    "passage_dedup",
    "_containment_candidates_prefix",
    "local_clustering_coefficient",
    "embedding_lsh_pairs",
    "semdedup",
    "dbscan_embeddings",
    "gopher_repetition",
    "unigram_surprisal",
    "ngram_novelty",
    "trigram_lm",
}


def test_every_persisting_function_releases_or_is_allowlisted():
    """Static policy: a function that persist()s must either release the
    cache before returning (finish_cached / unpersist) or be on the
    explicit data-sized-output allowlist above — so a new leak shows up
    as a test failure, not as executor storage creep in round N+3."""
    import ast
    import glob
    import os

    root = os.path.join(ROOT, "hadoop_coded_wordcount_spark")
    leaks = []
    for path in sorted(glob.glob(os.path.join(root, "**/*.py"), recursive=True)):
        with open(path) as f:
            src = f.read()
        if ".persist()" not in src:
            continue
        for node in ast.walk(ast.parse(src)):
            if isinstance(node, ast.FunctionDef):
                seg = ast.get_source_segment(src, node) or ""
                if (
                    ".persist()" in seg
                    and "unpersist" not in seg
                    and "finish_cached" not in seg
                    and node.name not in DATA_SIZED_ALLOWED
                ):
                    leaks.append(f"{path}:{node.lineno} {node.name}")
    assert not leaks, leaks


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", FIXED)
def test_operator_releases_its_cache(spark, name):
    from hadoop_coded_wordcount_spark.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF001)
    assert df.collect()  # the caller's action still works post-release
    assert _cache_empty(spark), f"{name} left entries in the CacheManager"
