"""Similarity-search tests — planted-cluster fixture (FIXTURES.md §3.2)
plus recall/structure checks against the real embeddings table."""

from __future__ import annotations

import pytest

from hadoop_coded_wordcount_spark.operators import similarity as sim
from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vectors(spark):
    # Three planted clusters along coordinate axes plus scaled copies:
    # cosine(identical)=1, cosine(scaled copy)=1, cosine(orthogonal)=0.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [2.0, 0.0, 0.0, 0.0], 0),  # scaled copy of 0
        (2, [0.9, 0.1, 0.0, 0.0], 0),  # near 0
        (10, [0.0, 1.0, 0.0, 0.0], 1),
        (11, [0.0, 3.0, 0.0, 0.0], 1),  # scaled copy of 10
        (12, [0.0, 0.8, 0.2, 0.0], 1),  # near 10
        (20, [0.0, 0.0, 0.0, 1.0], 2),
        (21, [0.0, 0.0, 0.1, 0.9], 2),  # near 20
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_bruteforce_topk_planted(vectors):
    out = sim.cosine_topk(vectors, query_mod=10, k=2, dim=4).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    # query 0: rank-1 neighbor is its scaled copy at cosine exactly 1
    assert sorted(by_query[0])[0] == (1, 1, 1.0)
    assert sorted(by_query[10])[0] == (1, 11, 1.0)
    # orthogonal cluster never outranks in-cluster neighbors
    assert by_query[20][0][1] in (21,)


def test_bruteforce_excludes_self(vectors):
    out = sim.cosine_topk(vectors, query_mod=10, k=5, dim=4).collect()
    assert all(r.neighbor_id != r.query_id for r in out)


def test_ivf_recovers_planted_clusters(vectors):
    # centroid_mod=10 -> centroids {0,10,20}: one per planted cluster.
    out = sim.cosine_ivf_topk(
        vectors, centroid_mod=10, nprobe=1, query_mod=10, k=2, dim=4
    ).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    # with one probe per query, every query still finds its in-cell copy
    assert sorted(by_query[0])[0] == (1, 1, 1.0)
    assert sorted(by_query[10])[0] == (1, 11, 1.0)
    # all results come from the probed (own) cell: labels match the query's
    assert {n for _, n, _ in by_query[0]} <= {1, 2}
    assert {n for _, n, _ in by_query[10]} <= {11, 12}


def test_ivf_structure_and_recall_on_driver_table(spark):
    """On near-random embeddings IVF recall is modest by design; assert the
    structural contract (rank bounds, no self-pairs, cosine agrees with the
    brute-force score for the same pair) and a recall floor."""
    emb = load_table(spark, SF001, "embeddings")
    exact = sim.cosine_topk(emb, k=10).collect()
    approx = sim.cosine_ivf_topk(emb, k=10).collect()

    assert approx, "ivf must return candidates"
    assert all(1 <= r.rank <= 10 and r.neighbor_id != r.query_id for r in approx)

    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:  # same pair -> identical score
            assert r.cosine == exact_scores[key]

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in approx if r.neighbor_id in exact_sets.get(r.query_id, set())
    )
    recall = hits / max(1, len(exact))
    assert recall >= 0.1, f"recall@10 {recall:.2f} below sanity floor"


def test_neardup_pairs_symmetric_threshold(vectors):
    pairs = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.embedding_neardup_pairs(vectors, threshold=0.9, dim=4).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (10, 11) in pairs
    # orthogonal same-label pairs excluded
    assert all(a < b for a, b in pairs)


def test_embedding_lsh_finds_planted_copies(vectors):
    """Scale-copy pairs (cosine exactly 1) agree on every sketch bit, so
    sign-LSH must recover them with certainty; orthogonal pairs must not
    pass the verify threshold."""
    pairs = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.embedding_lsh_pairs(
            vectors, bits=32, bands=4, threshold=0.9, dim=4
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(10, 11)] == 1.0
    assert all(c >= 0.9 for c in pairs.values())


def test_embedding_lsh_shuffled_attach_matches_broadcast(spark):
    """The r12 broadcast guard: forcing the vector-attach past
    _LSH_BROADCAST_BYTES_MAX (corpus_rows huge) must switch to the
    shuffled hash join and return the EXACT same pair set and cosines
    as the broadcast path — the fallback is a physical-plan choice,
    never a semantic one."""
    emb = load_table(spark, SF001, "embeddings")
    bcast = sorted(
        map(tuple, sim.embedding_lsh_pairs(emb, threshold=0.3).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            sim.embedding_lsh_pairs(
                emb, threshold=0.3, corpus_rows=10**12
            ).collect(),
        )
    )
    assert bcast == shuffled and bcast


def test_embedding_lsh_subset_of_blocked_exact(spark):
    """Every LSH-verified pair on the driver table must carry the same
    cosine the blocked exact query computes (identical arithmetic), and be
    nonempty."""
    emb = load_table(spark, SF001, "embeddings")
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.embedding_lsh_pairs(emb, threshold=0.3).collect()
    }
    assert lsh, "sign-LSH should surface some cos>=0.3 pairs"
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.embedding_neardup_pairs(
            emb, threshold=0.3, block_on=None
        ).collect()
    }
    for pair, c in lsh.items():
        assert exact[pair] == c


def test_pandas_topk_matches_builtin(spark):
    """The Arrow/BLAS variant must agree with the JVM-side exact top-k:
    identical (query, neighbor, rank) triples, cosines within 1e-9 (numpy
    pairwise summation vs SQL fold may differ in the last ulp)."""
    emb = load_table(spark, SF001, "embeddings")
    jvm = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine)
        for r in sim.cosine_topk(emb).collect()
    }
    arrow = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine)
        for r in sim.cosine_topk_pandas(emb).collect()
    }
    assert jvm.keys() == arrow.keys()
    for key, (rank, cos) in jvm.items():
        arank, acos = arrow[key]
        assert arank == rank, key
        assert abs(acos - cos) < 1e-9, key


def test_pandas_topk_query_collect_is_bounded(spark):
    """query_mod=1 selects the WHOLE corpus as queries — the max_queries
    cap must bound the driver collect (deterministically: lowest vec_ids)
    instead of collecting corpus-proportionally."""
    emb = load_table(spark, SF001, "embeddings")
    out = sim.cosine_topk_pandas(emb, query_mod=1, k=3, max_queries=7)
    qids = {r.query_id for r in out.collect()}
    low7 = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(7).collect()]
    assert qids == set(low7)


def test_kmeans_centroids_improve_ivf_recall(spark):
    """Lloyd's rounds must beat the id-sample init: trained-IVF recall@10
    (vs exact brute force) strictly above untrained, centroids unit-norm.
    Everything is deterministic, so the margin is stable."""
    emb = load_table(spark, SF001, "embeddings")
    cents = sim.kmeans_centroids(emb, k=24, iters=3)
    rows = cents.collect()
    assert len(rows) <= 24
    for r in rows:  # unit-normalized
        assert abs(sum(x * x for x in r.c_emb) - 1.0) < 1e-9

    truth = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(emb).collect()}
    plain = {(r.query_id, r.neighbor_id) for r in sim.cosine_ivf_topk(emb).collect()}
    trained = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_ivf_topk(emb, centroids=cents).collect()
    }
    r_plain = len(plain & truth) / len(truth)
    r_trained = len(trained & truth) / len(truth)
    assert r_trained > r_plain
    assert r_trained >= 0.5


def test_semdedup_drops_planted_duplicates(spark):
    """SemDeDup on the planted fixture: exact/scaled copies (cosine 1.0)
    are dropped keeping the smallest vec_id; orthogonal clusters never
    evict each other; keep-set is layout-deterministic."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [2.0, 0.0, 0.0, 0.0], 0),   # scaled copy of 0 -> dropped
        (2, [0.9, 0.1, 0.0, 0.0], 0),   # cos≈0.994 to 0 -> dropped @0.95
        (10, [0.0, 1.0, 0.0, 0.0], 1),
        (11, [0.0, 3.0, 0.0, 0.0], 1),  # scaled copy of 10 -> dropped
        (20, [0.0, 0.0, 0.0, 1.0], 2),
        (21, [0.0, 0.0, 0.1, 0.9], 2),  # cos≈0.9939 to 20 -> dropped
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = sim.semdedup(df, k=3, threshold=0.95, iters=3, dim=4)
    kept = {r["vec_id"] for r in out.collect() if r["keep"]}
    assert 0 in kept and 10 in kept and 20 in kept
    assert 1 not in kept and 11 not in kept
    # one row per vector, keep+dropped partition the input
    assert out.count() == len(rows)

    again = {
        r["vec_id"]
        for r in sim.semdedup(
            df.repartition(7), k=3, threshold=0.95, iters=3, dim=4
        ).collect()
        if r["keep"]
    }
    assert again == kept


def test_semdedup_real_embeddings_accounting(spark):
    """On the real table: every vector appears exactly once, kept rows
    have NULL evicted_by_cos, dropped rows record a cosine ≥ threshold."""
    emb = load_table(spark, SF001, "embeddings")
    out = sim.semdedup(emb, k=24, threshold=0.95).collect()
    assert len(out) == emb.count()
    for r in out:
        if r["keep"]:
            assert r["evicted_by_cos"] is None
        else:
            assert r["evicted_by_cos"] >= 0.95


def test_random_projection_preserves_distances(spark):
    """JL property: squared-distance ratios after an 8-dim ±1 projection
    concentrate around 1; assert the empirical mean ratio over real
    pairs is within a generous band (not per-pair — ε at p=8 is large)."""
    import numpy as np

    emb = load_table(spark, SF001, "embeddings").limit(200)
    orig = {
        r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()
    }
    proj = {
        r.vec_id: np.array([r[f"y{j}"] for j in range(8)])
        for r in sim.random_projection(emb).collect()
    }
    ids = sorted(orig)[:60]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        do = float(np.sum((orig[a] - orig[b]) ** 2))
        dp = float(np.sum((proj[a] - proj[b]) ** 2))
        if do > 0:
            ratios.append(dp / do)
    m = sum(ratios) / len(ratios)
    assert 0.7 < m < 1.3, m


def test_embedding_covariance_matches_numpy_and_is_psd(spark):
    import numpy as np

    emb = load_table(spark, SF001, "embeddings")
    x = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=float
    )[:, :16]
    want = np.cov(x, rowvar=False, bias=True)
    got = np.zeros((16, 16))
    for r in sim.embedding_covariance(emb).collect():
        got[r.i - 1, r.j - 1] = r.cov
        got[r.j - 1, r.i - 1] = r.cov
    assert np.max(np.abs(got - want)) < 1e-5
    # the driver-sized eigen step: PSD up to rounding noise
    evals = np.linalg.eigvalsh(got)
    assert evals.min() > -1e-6


def test_embedding_covariance_no_signed_zero(spark):
    """Regression for the r7 gate failure: a cell that rounds to exact
    zero must stringify as '0.0', never '-0.0' — the driver hashes the
    STRINGIFIED frame, so float equality is not enough.  Assert
    repr-level canonicalization on every emitted cell, and specifically
    that a planted frame engineered to produce a tiny negative
    covariance (rounding to zero at 6 decimals) emits '+0.0'."""
    from pyspark.sql import Row

    emb = load_table(spark, SF001, "embeddings")
    for r in sim.embedding_covariance(emb).collect():
        assert repr(r.cov) != "-0.0", (r.i, r.j)

    # planted: dims 0 and 1 anticorrelate with covariance -2.5e-9,
    # which rounds to zero at 6 decimals and would keep the negative
    # sign without the + 0.0 canonicalization
    eps = 1e-4
    rows = [
        Row(vec_id=1, embedding=[+eps, -eps] + [0.0] * 14),
        Row(vec_id=2, embedding=[-eps, +eps] + [0.0] * 14),
        Row(vec_id=3, embedding=[0.0] * 16),
        Row(vec_id=4, embedding=[0.0] * 16),
    ]
    planted = spark.createDataFrame(rows)
    out = {
        (r.i, r.j): r.cov
        for r in sim.embedding_covariance(planted).collect()
    }
    assert repr(out[(1, 2)]) == "0.0", out[(1, 2)]


def test_hybrid_rrf_internal_consistency(spark):
    """RRF scores must recompute exactly from the emitted rank columns,
    ranks must order by score (tie-break neighbor_id), and the fusion
    must actually fuse: on the real corpus at least one candidate is
    retrieved by only one of the two rankings (rank 0 on the other)."""
    out = sim.hybrid_rrf_topk(
        load_table(spark, SF001, "documents"),
        load_table(spark, SF001, "embeddings"),
    ).collect()
    assert out
    by_query: dict[int, list] = {}
    for r in out:
        expected = (1.0 / (60 + r.dense_rank) if r.dense_rank else 0.0) + (
            1.0 / (60 + r.sparse_rank) if r.sparse_rank else 0.0
        )
        assert abs(r.rrf_score - round(expected, 6)) < 1e-12, r
        assert r.dense_rank or r.sparse_rank, r
        by_query.setdefault(r.query_id, []).append(r)
    single_source = [r for r in out if not (r.dense_rank and r.sparse_rank)]
    assert single_source, "expected at least one single-ranking candidate"
    for rows in by_query.values():
        rows.sort(key=lambda r: r.rrf_rank)
        assert [r.rrf_rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.rrf_score for r in rows]
        # ranking used the unrounded score, so rounded scores may tie
        # across distinct rank pairs — assert monotonicity only.
        assert scores == sorted(scores, reverse=True)


def test_pq_topk_planted_clusters_and_real_recall(spark):
    """PQ with a codebook containing the exact cluster prototypes must
    rank same-cluster members (pq_dist 0) above all others (Lloyd
    rounds on exact-copy members are a fixed point, so training keeps
    the prototypes); on the real corpus the TRAINED codebook must beat
    the untrained id-sample init on recall@10 vs brute-force L2, and
    the default exact re-rank of the ADC shortlist must beat pure ADC
    (VERDICT r7 item 7; deterministic pipelines -> stable values;
    measured 0.28 ADC-untrained, 0.36 ADC-trained, 0.50 rerank-trained
    at 3 Lloyd rounds, rerank_mult=3)."""
    import numpy as np
    from collections import defaultdict

    # planted: 4 prototype directions in 64-d, members = exact copies.
    # code_mod=31 samples vec_ids 0,31,62,93 as the codebook — make
    # those the prototypes and give every member id % 31 != 0.
    protos = {}
    rng_dims = [0, 16, 32, 48]
    rows = []
    for c, base in enumerate([0, 31, 62, 93]):
        v = [0.0] * 64
        for d in range(rng_dims[c], rng_dims[c] + 16):
            v[d] = 1.0 + c
        protos[base] = v
        rows.append((base, v, c))
        # two exact-copy members per prototype (ids avoid % 31 == 0)
        rows.append((base + 1, list(v), c))
        rows.append((base + 2, list(v), c))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    out = sim.pq_topk(emb, code_mod=31, query_mod=31, k=2)
    got = defaultdict(list)
    for r in sorted(out.collect(), key=lambda r: (r.query_id, r.rank)):
        got[r.query_id].append((r.neighbor_id, r.pq_dist))
    for base in protos:
        assert [n for n, _ in got[base]] == [base + 1, base + 2]
        assert all(d == 0.0 for _, d in got[base])

    # real-corpus recall floor
    real = load_table(spark, SF001, "embeddings")
    emb_rows = real.collect()
    ids = np.array([r.vec_id for r in emb_rows])
    X = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    def mean_recall(df):
        res = defaultdict(set)
        for r in df.collect():
            res[r.query_id].add(r.neighbor_id)
        recalls = []
        for q, neigh in res.items():
            qi = int(np.where(ids == q)[0][0])
            d = ((X - X[qi]) ** 2).sum(axis=1)
            order = [
                int(ids[i]) for i in np.argsort(d, kind="stable")
                if ids[i] != q
            ][:10]
            recalls.append(len(neigh & set(order)) / 10)
        return sum(recalls) / len(recalls)

    r_adc_untrained = mean_recall(
        sim.pq_topk(real, train_iters=0, rerank_mult=None)
    )
    r_adc_trained = mean_recall(sim.pq_topk(real, rerank_mult=None))
    r_rerank_trained = mean_recall(sim.pq_topk(real))
    assert r_adc_trained > r_adc_untrained, (
        r_adc_trained,
        r_adc_untrained,
    )
    # the r7 verdict's bar: strictly above the 0.36 ADC-trained level
    assert r_rerank_trained > r_adc_trained, (
        r_rerank_trained,
        r_adc_trained,
    )
    assert r_rerank_trained > 0.36
    assert r_rerank_trained >= 0.5


def test_ann_recall_metrics_match_python_replay(spark):
    """Recall/MRR rows must equal a Python recomputation from the two
    underlying rankings, and every metric obeys its bounds."""
    emb = load_table(spark, SF001, "embeddings")
    exact = {}
    for r in sim.cosine_topk(emb).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in sim.cosine_ivf_topk(emb).collect():
        approx.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = {r.query_id: r for r in sim.ann_recall_metrics(emb).collect()}
    assert set(got) == set(approx)
    for q, rows in approx.items():
        hits = [rk for rk, n in rows if n in exact.get(q, set())]
        assert got[q].n_hits == len(hits)
        assert got[q].recall_at_k == round(len(hits) / 10, 6)
        assert got[q].mrr == (round(1.0 / min(hits), 6) if hits else 0.0)
        assert 0 <= got[q].recall_at_k <= 1


def test_ivf_pq_composition_consistency(spark):
    """In the SHARED-codebook form (residual=False), IVF-PQ scores must
    agree exactly with plain pure-ADC PQ on shared (query, neighbor)
    pairs (same codebooks, same ADC tables); rank sequences must be
    contiguous and distance-sorted in both forms."""
    emb = load_table(spark, SF001, "embeddings")
    pq = {
        (r.query_id, r.neighbor_id): r.pq_dist
        for r in sim.pq_topk(emb, rerank_mult=None).collect()
    }
    composed = sim.ivf_pq_topk(
        emb, residual=False, max_queries=None
    ).collect()
    assert composed
    by_q = {}
    for r in composed:
        by_q.setdefault(r.query_id, []).append(r)
        if (r.query_id, r.neighbor_id) in pq:
            assert pq[(r.query_id, r.neighbor_id)] == r.pq_dist, r
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        dists = [r.pq_dist for r in rows]
        assert dists == sorted(dists)
    # residual (IVFADC) form: same contiguity/sort invariants hold
    residual = sim.ivf_pq_topk(emb, max_queries=None).collect()
    assert residual
    by_q = {}
    for r in residual:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        dists = [r.pq_dist for r in rows]
        assert dists == sorted(dists)


def test_ivf_pq_residual_recovers_planted_clusters(spark):
    """Residual IVFADC on PLANTED clusters: members of a cluster share
    their cell, their residuals vs the cell-mean anchor are identical
    for exact copies, so the encoded distance between a query and its
    exact-copy members is 0 and they rank first — the geometry residual
    encoding is designed to exploit."""
    rows = []
    # centroid_mod=37 samples vec_ids 0, 37, 74, 111 as IVF centroids —
    # make them the prototypes, members exact copies on nearby ids
    for c, base in enumerate([0, 37, 74, 111]):
        v = [0.0] * 64
        for d in range(c * 16, c * 16 + 16):
            v[d] = 1.0 + c
        rows.append((base, v))
        rows.append((base + 1, list(v)))
        rows.append((base + 2, list(v)))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = sim.ivf_pq_topk(
        emb, query_mod=37, k=2, max_queries=None
    ).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.pq_dist))
    for base in (0, 37, 74, 111):
        assert [n for n, _ in got[base]] == [base + 1, base + 2], got
        assert all(d == 0.0 for _, d in got[base]), got


def test_ann_ndcg_matches_python_replay(spark):
    """NDCG rows must equal a Python recomputation (same per-term 6dp
    rounding) from the two rankings, and obey 0 <= ndcg <= 1 with
    equality iff the approximate order matches truth exactly."""
    import math
    from decimal import Decimal

    emb = load_table(spark, SF001, "embeddings")
    exact = {}
    for r in sim.cosine_topk(emb).collect():
        exact.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    approx = {}
    for r in sim.cosine_ivf_topk(emb).collect():
        approx.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = {r.query_id: r for r in sim.ann_ndcg(emb).collect()}
    assert set(got) == set(approx)
    for q, rows in approx.items():
        dcg = sum(
            Decimal(
                str(
                    round(
                        (11 - exact[q][n] if n in exact[q] else 0)
                        / math.log2(rk + 1),
                        6,
                    )
                )
            )
            for rk, n in rows
        )
        idcg = sum(
            Decimal(str(round((11 - rk) / math.log2(rk + 1), 6)))
            for rk in exact[q].values()
        )
        assert got[q].dcg == float(dcg)
        assert got[q].idcg == float(idcg)
        assert got[q].ndcg == round(float(dcg) / float(idcg), 6)
        assert 0.0 <= got[q].ndcg <= 1.0
        perfect = all(n in exact[q] and exact[q][n] == rk for rk, n in rows)
        assert (got[q].ndcg == 1.0) == perfect


def test_mmr_diversifies_away_from_duplicate_results(spark):
    """Corpus: two identical near-copies of the query and one moderately
    relevant but novel vector. Plain top-2 returns the two copies; MMR
    round 2 must skip the second copy (novelty penalty = 1) and take
    the novel vector."""
    import numpy as np

    def vec(a, b, c):
        v = np.zeros(64)
        v[0], v[1], v[2] = a, b, c
        n = np.linalg.norm(v)
        return [float(x) for x in v / n]

    rows = [
        (0, vec(1.0, 0.0, 0.0), 0),  # query (id % 100 == 0)
        (1, vec(0.95, 0.3122, 0.0), 0),  # near-copy A1
        (2, vec(0.95, 0.3122, 0.0), 0),  # near-copy A2 (identical to A1)
        # novel direction: rel 0.5, sim to A1 = 0.475 < rel, so its MMR
        # score (0.5-0.475)/2 beats the duplicate's (0.95-1)/2 < 0
        (3, vec(0.5, 0.0, 0.866), 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {
        r.mmr_round: r
        for r in sim.mmr_topk(emb, k_cand=3, k_out=3).collect()
    }
    assert got[1].neighbor_id in (1, 2)  # highest relevance, id tie-break
    assert got[1].neighbor_id == 1
    assert got[2].neighbor_id == 3  # novelty beats the duplicate
    assert got[3].neighbor_id == 2  # the copy comes last
    # the duplicate's round-3 score carries the full sim=1 penalty
    assert got[3].mmr_score < 0 < got[2].mmr_score


def test_embedding_drift_identical_halves_and_shifted(spark):
    """Mirrored halves have cosine 1 / L2 0; shifting one half moves
    both metrics the right way."""
    import numpy as np

    def vec(seed, shift=0.0):
        rng = np.random.RandomState(seed)
        v = rng.rand(64) + shift
        return [float(x) for x in v]

    same = [(2 * i + h, vec(i), 0) for i in range(20) for h in (0, 1)]
    emb = spark.createDataFrame(
        same, "vec_id bigint, embedding array<float>, label int"
    )
    r = sim.embedding_drift(emb).collect()[0]
    assert (r.n_a, r.n_b) == (20, 20)
    assert r.centroid_cosine == 1.0 and r.centroid_l2 == 0.0
    shifted = [
        (2 * i + h, vec(i, shift=2.0 * h), 0)
        for i in range(20)
        for h in (0, 1)
    ]
    emb2 = spark.createDataFrame(
        shifted, "vec_id bigint, embedding array<float>, label int"
    )
    r2 = sim.embedding_drift(emb2).collect()[0]
    assert r2.centroid_l2 > 10  # +2 shift on 64 dims: sqrt(64*4) = 16
    assert r2.centroid_cosine < 1.0


def test_pca_power_iteration_recovers_planted_axis(spark):
    """Variance planted on dim 1 (values ±10), dims 2..16 constant: the
    dominant component is e1 with eigenvalue = Var = 100; the pivot
    convention pins loading(dim 1) = +1."""
    rows = []
    for i in range(40):
        vec = [10.0 if i % 2 == 0 else -10.0] + [0.5] * 15
        rows.append((i, vec, 0))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {r.dim: r for r in sim.pca_power_iteration(emb).collect()}
    assert len(got) == 16
    assert got[1].loading == 1.0
    assert all(got[d].loading == 0.0 for d in range(2, 17))
    assert got[1].eigenvalue_est == 100.0


def test_pca_power_iteration_mixed_axes_ranked(spark):
    """Two planted axes with different variances: the iterate converges
    to the HIGH-variance one (dim 2 at ±8 beats dim 5 at ±2); the weak
    axis loading shrinks toward 0 after 3 rounds."""
    rows = []
    for i in range(48):
        v2 = 8.0 if i % 2 == 0 else -8.0
        v5 = 2.0 if i % 3 == 0 else (-1.0 if i % 3 == 1 else -1.0)
        vec = [0.0, v2, 0.0, 0.0, v5] + [0.0] * 11
        rows.append((i, vec, 0))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {r.dim: r for r in sim.pca_power_iteration(emb).collect()}
    assert got[2].loading == 1.0  # dominant axis is the pivot
    assert abs(got[5].loading) < 0.05
    assert got[2].eigenvalue_est > 50.0


def test_dbscan_embeddings_cores_and_noise(spark):
    """Four near-identical vectors form one core cluster labeled by the
    minimum vec_id; an orthogonal vector has no ε-neighbors → noise."""
    from hadoop_coded_wordcount_spark.operators import similarity as sim

    def vec(axis, bump=0.0):
        v = [0.0] * 64
        v[axis] = 1.0
        v[10] = bump
        return v

    rows = [
        (5, vec(0, 0.00), 0),
        (6, vec(0, 0.01), 0),
        (7, vec(0, 0.02), 0),
        (8, vec(0, 0.03), 0),
        (9, vec(1), 0),   # orthogonal → noise
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {r.vec_id: r for r in sim.dbscan_embeddings(emb).collect()}
    for v in (5, 6, 7, 8):
        assert got[v].role == "core" and got[v].cluster_id == 5
    assert got[9].role == "noise" and got[9].cluster_id is None


def test_neardup_cell_candidates_complete_at_default_threshold(spark):
    """The ball-bound candidate path is exact, not probabilistic: on a
    fixture dense with BORDERLINE pairs (cosines straddling the 0.3
    default threshold — the regime where sign-LSH banding materially
    misses), the pair set must equal the numpy brute force within each
    label block, pair for pair (VERDICT r5 item 3's completeness pin)."""
    import math

    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for blk in range(2):
        for c in range(3):
            base = np.zeros(64)
            base[16 * c] = 1.0
            alt = np.zeros(64)
            alt[16 * c + 5] = 1.0
            for _ in range(12):
                phi = rng.uniform(0, 1.35)
                v = (
                    math.cos(phi) * base
                    + math.sin(phi) * alt
                    + rng.normal(0, 0.05, 64)
                )
                rows.append((vid, [float(x) for x in v], blk))
                vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_neardup_pairs(
            emb, threshold=0.3, cell_block_min=0
        ).collect()
    }
    via_quadratic = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    assert got == via_quadratic
    X = np.array([r[1] for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = set()
    n_borderline = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][2] != rows[j][2]:
                continue
            cos = float(X[i] @ X[j])
            if cos >= 0.3:
                want.add((i, j))
                if cos < 0.56:
                    n_borderline += 1
    assert n_borderline >= 10, "fixture must exercise the borderline regime"
    assert got == want


def test_l2_topk_exact_matches_numpy_and_ivf_pq_recall_bounds(spark):
    """The integer-L2 truth ranking must equal a numpy recomputation on
    the quantized vectors (same micro-unit rounding), and the composed
    IVF-PQ recall metrics obey their bounds with at least one hit
    somewhere (the index is better than random)."""
    import numpy as np
    from collections import defaultdict

    real = load_table(spark, SF001, "embeddings")
    rows = sorted(real.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    raw = np.array([r.embedding for r in rows], np.float64) * 1e6
    # half-AWAY rounding (numpy's round is banker's; Spark/DuckDB round
    # half away from zero)
    X = np.sign(raw) * np.floor(np.abs(raw) + 0.5)
    got = defaultdict(list)
    for r in sorted(
        sim.l2_topk_exact(real).collect(), key=lambda r: (r.query_id, r.rank)
    ):
        got[r.query_id].append(r.neighbor_id)
    for q, neigh in got.items():
        qi = int(np.where(ids == q)[0][0])
        d = ((X - X[qi]) ** 2).sum(axis=1)
        order = [
            int(ids[i])
            for i in np.argsort(d, kind="stable")
            if ids[i] != q
        ][:10]
        # ties broken by neighbor_id in the operator; numpy argsort is
        # stable over the vec_id-sorted input, so orders agree
        assert neigh == order, q

    mets = sim.ivf_pq_recall(real).collect()
    assert mets and all(0 <= r.recall_at_k <= 1 and 0 <= r.mrr <= 1
                        for r in mets)
    assert sum(r.n_hits for r in mets) > 0


def test_shared_qids_equal_derived_qids(spark):
    """The r9 one-projection refactor threads ONE budgeted query-id set
    (ivf_pq_recall's) into both the truth and index legs via the new
    ``qids`` parameter. Passing the set explicitly must be value-
    identical to each leg deriving its own — same md5 order, same
    budget — at a budget SMALLER than the id-mod count, so the cap
    actually binds (at the default mod there are too few sf0.01 ids to
    exercise it)."""
    real = load_table(spark, SF001, "embeddings")
    qids = sim.audit_qids(real.select("vec_id"), 10, 5)
    assert qids.count() == 5
    for fn in (sim.l2_topk_exact, sim.ivf_pq_topk):
        derived = fn(real, query_mod=10, max_queries=5).collect()
        shared = fn(real, query_mod=10, max_queries=5, qids=qids).collect()
        assert sorted(map(tuple, derived)) == sorted(map(tuple, shared)), fn
        assert len({r.query_id for r in derived}) == 5, fn


def test_ivf_pq_empty_centroid_set_returns_empty_not_crash(spark):
    """A corpus with NO id hitting the centroid mod (small tenants,
    filtered shards) must yield an empty result with the full output
    schema — exercised on both residual and shared-codebook paths,
    which route every downstream frame (assignment, anchors, codebook)
    through the empty centroid set."""
    rows = [(i, [float(i % 7), 1.0, 0.5, 0.25] * 16, 0) for i in range(1, 30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    for residual in (True, False):
        out = sim.ivf_pq_topk(
            emb, centroid_mod=1009, query_mod=5, residual=residual
        )
        assert out.columns == ["query_id", "neighbor_id", "rank", "pq_dist"]
        assert out.count() == 0, residual


# ---------------------------------------------------------------------------
# sample-based PQ codebook training (VERDICT r9 item 5 / SURVEY §14)
# ---------------------------------------------------------------------------


def test_pq_train_sample_bounded_deterministic_md5_order(spark):
    """The training set is the md5-first-N vector owners (the audit_qids
    order a DuckDB oracle replays), all m subvectors each, twice the
    same — the frame whose size, not the corpus's, prices every Lloyd
    round."""
    import hashlib

    emb = load_table(spark, SF001, "embeddings")
    svecs = sim._pq_subvecs(emb, 8, 64)
    s1 = sim._pq_train_sample(svecs, 32).collect()
    ids = {r.vec_id for r in s1}
    assert len(s1) == 32 * 8 and len(ids) == 32
    all_ids = [r.vec_id for r in emb.select("vec_id").collect()]
    want = set(
        sorted(
            all_ids,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:32]
    )
    assert ids == want
    s2 = sim._pq_train_sample(svecs, 32).collect()
    key = lambda r: (r.vec_id, r.j, tuple(r.sv))  # noqa: E731
    assert sorted(map(key, s1)) == sorted(map(key, s2))


def test_pq_covering_sample_reproduces_full_codebook(spark):
    """A sample budget >= the corpus must train the EXACT full-corpus
    codebook — the property that makes the ANN_TRAIN_SAMPLE default safe
    under the oracle freeze (every gate corpus is smaller than the
    budget)."""
    emb = load_table(spark, SF001, "embeddings")
    svecs = sim._pq_subvecs(emb, 8, 64)
    full = sim._pq_train_codebook(svecs, 31, 3, 8)
    cover = sim._pq_train_codebook(svecs, 31, 3, 8, train_sample=10**6)
    key = lambda r: (r.j, r.code_id, tuple(r.cv))  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(
        map(key, cover.collect())
    )


def test_default_sampled_training_keeps_gate_values(spark):
    """ivf_pq_topk under the ANN_TRAIN_SAMPLE default must equal the
    unsampled form row for row at gate SF — the registry freeze pin for
    flipping the default."""
    emb = load_table(spark, SF001, "embeddings")
    a = sorted(map(tuple, sim.ivf_pq_topk(emb).collect()))
    b = sorted(map(tuple, sim.ivf_pq_topk(emb, train_sample=None).collect()))
    assert a == b and a


def test_pq_binding_sample_keeps_recall(spark):
    """With a BINDING budget (128 of 500 vectors) the sampled codebook
    must still search: recall@10 vs brute-force L2 stays in the
    full-trained neighborhood (production PQ trains on a fixed sample
    for exactly this reason). Deterministic pipeline -> stable values."""
    from collections import defaultdict

    import numpy as np

    emb = load_table(spark, SF001, "embeddings")
    emb_rows = emb.collect()
    ids = np.array([r.vec_id for r in emb_rows])
    X = np.array([r.embedding for r in emb_rows], dtype=np.float64)

    def mean_recall(df):
        res = defaultdict(set)
        for r in df.collect():
            res[r.query_id].add(r.neighbor_id)
        recalls = []
        for q, neigh in res.items():
            qi = int(np.where(ids == q)[0][0])
            d = ((X - X[qi]) ** 2).sum(axis=1)
            order = [
                int(ids[i])
                for i in np.argsort(d, kind="stable")
                if ids[i] != q
            ][:10]
            recalls.append(len(neigh & set(order)) / 10)
        return sum(recalls) / len(recalls)

    r_full = mean_recall(sim.ivf_pq_topk(emb, train_sample=None))
    r_bind = mean_recall(sim.ivf_pq_topk(emb, train_sample=128))
    assert r_bind >= 0.2, (r_bind, r_full)
    assert r_bind >= r_full - 0.1, (r_bind, r_full)


def test_density_probe_estimates_planted_degree(vectors):
    """Probe math on the planted fixture: per 4-vector... per-label
    blocks of 3/3/2, sample covers every row, so est_avg_degree is the
    EXACT average degree (hits = within-block pairs at cos >= eps)."""
    out = {r.blk: r for r in sim.dbscan_density_probe(
        vectors, eps_sim=0.2, dim=4
    ).collect()}
    # label 0: pairs (0,1)=1, (0,2)~.994, (1,2)~.994 -> hits=3, ns=3
    r0 = out[0]
    assert (r0.blkn, r0.ns, r0.hits) == (3, 3, 3)
    assert r0.est_avg_degree == 2.0  # 2*3/(3*2) * (3-1)
    # label 2: single pair at cos ~0.9938 -> hits=1, est = 1.0
    r2 = out[2]
    assert (r2.blkn, r2.ns, r2.hits) == (2, 2, 1)
    assert r2.est_avg_degree == 1.0


def test_dbscan_unrouted_default_on_planted(vectors):
    """Blocks of 2-3 rows sit far under probe_min: the default never
    probes, never routes, and approx is False everywhere."""
    out = {r.vec_id: r for r in sim.dbscan_embeddings(
        vectors, dim=4, min_neighbors=2
    ).collect()}
    assert not any(r.approx for r in out.values())
    # the axis clusters are cores of their own components
    assert out[0].role == "core" and out[0].cluster_id == 0
    assert out[1].cluster_id == 0 and out[10].cluster_id == 10


def test_dbscan_forced_routing_matches_full_oracle_replay(spark):
    """The ROUTED branch value-pinned end to end on real data: with
    route_degree=0 / probe_min=0 every block with any qualifying sample
    pair takes the sign-LSH path, and the output (roles, cluster ids,
    approx flags) must equal the DuckDB replay of the SAME parameters —
    probe, BIGINT routing inequality, LSH sketch/banding, closure. The
    gate corpora never route (est degree <= 13 vs budget 32), so this
    test is the live value-check of the branch the gate can't reach."""
    import duckdb

    from hadoop_coded_wordcount_spark.registry import _dbscan_oracle_sql

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    got = sorted(
        map(
            tuple,
            sim.dbscan_embeddings(
                emb, route_degree=0, probe_min=0
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                _dbscan_oracle_sql(route_degree=0, probe_min=0)
            ).fetchall(),
        )
    )
    assert got == want and got
    # and the routing actually fired: every row flagged approximate
    assert all(r[3] for r in got)
