"""Round-6 operator additions: Gopher rule battery, vocabulary overlap,
corpus datasheet, Cohen's kappa, and the bucketed band join."""

from __future__ import annotations

from hadoop_coded_wordcount_spark.operators import (
    mleval as ml,
    relational as rel,
    textstats as ts,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )


def test_gopher_flags_each_rule_fails_its_planted_doc(spark):
    good = "the quick brown fox jumps over a lazy dog and runs to town " * 5
    rows = [
        (0, good, "en", "s", len(good)),
        # too short (but long words, stopworded) -> only r_wordcount fails
        (1, "the words here are fine quality text for sure okay", "en",
         "s", 51),
        # single-letter words -> only mean word length < 3
        (2, "a b c d e f g h i j " * 6 + "the of to in is for and a", "en",
         "s", 100),
        # hash block -> only symbol ratio fails (one long # token keeps
        # the other rules green)
        (3, "the a of to " * 15 + "#" * 300, "en", "s", 480),
        # digit words -> only alpha-word share < 0.8
        (4, "the a 1111 2222 3333 4444 5555 6666 7777 8888 9999 0000 " * 6,
         "en", "s", 100),
        # no stopwords -> only the stopword probe fails
        (5, "quick brown fox jump run town word gram " * 8, "en", "s", 100),
    ]
    out = {r.source: r for r in
           ts.gopher_quality_flags(_docs(spark, rows)).collect()}["s"]
    assert out.n_docs == 6
    assert out.n_r_wordcount == 5      # doc 1 fails
    assert out.n_r_mean_word_len == 5  # doc 2 fails
    assert out.n_r_symbol_ratio == 5   # doc 3 fails
    assert out.n_r_alpha_words == 5    # doc 4 fails
    assert out.n_r_stopwords == 5      # doc 5 fails
    assert out.n_pass_all == 1 and out.pass_rate == round(1 / 6, 6)


def test_vocab_overlap_jaccard_exact(spark):
    rows = [
        (0, "alpha beta gamma", "en", "s1", 10),
        (1, "beta gamma delta", "en", "s2", 10),
        (2, "epsilon zeta", "en", "s3", 10),
    ]
    got = {
        (r.source_a, r.source_b): r
        for r in ts.vocab_overlap_sources(_docs(spark, rows)).collect()
    }
    r12 = got[("s1", "s2")]
    assert (r12.n_common, r12.va, r12.vb) == (2, 3, 3)
    assert r12.jaccard == 0.5
    assert ("s1", "s3") not in got  # zero-overlap pairs drop (inner join)


def test_corpus_datasheet_counts_dups_within_source(spark):
    rows = [
        (0, "one two three", "en", "s1", 13),
        (1, "one two three", "en", "s1", 13),   # exact dup of 0
        (2, "four five", "de", "s1", 9),
        (3, "one two three", "en", "s2", 13),   # same text, OTHER source
    ]
    got = {r.source: r for r in
           ts.corpus_datasheet(_docs(spark, rows)).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_tokens, s1.n_langs) == (3, 8, 2)
    assert s1.n_dup_docs == 2 and s1.dup_rate == round(2 / 3, 6)
    assert got["s2"].n_dup_docs == 0


def test_cohens_kappa_matches_hand_computation(spark):
    # quality >= 0.5 vs n_tokens >= 60: build docs hitting all 4 cells
    import string

    long_good = "the quick brown fox jumps over a lazy dog again " * 12
    # 55 DISTINCT clean words: diversity + cleanliness max out the
    # quality score while staying under the 60-token rater-B threshold
    short_good = " ".join(
        a + b for a, b in zip(string.ascii_lowercase * 3,
                              (string.ascii_lowercase * 3)[1:])
    )[: 55 * 3 - 1]
    short_good = " ".join(dict.fromkeys(short_good.split()))
    rows = [
        (0, long_good, "en", "s", 100),      # ra=1, rb=1 (120 toks)
        (1, short_good, "en", "s", 100),     # ra=1, rb=0 (36 toks)
        (2, "::: ;;; !!! ??? ,,, " * 20, "en", "s", 100),  # ra=0, rb=1
        (3, "::: ;;;", "en", "s", 10),       # ra=0, rb=0
    ]
    out = ml.cohens_kappa(_docs(spark, rows)).collect()[0]
    assert (out.n, out.n11, out.n10, out.n01, out.n00) == (4, 1, 1, 1, 1)
    # po = 0.5, pe = 0.5 -> kappa = 0 (chance-level agreement)
    assert out.p_observed == 0.5 and out.p_expected == 0.5
    assert out.kappa == 0.0


def test_band_join_crosses_bucket_boundaries(spark):
    # prices straddle a floor(price/0.25) bucket edge: 99.99 and 100.01
    # are in DIFFERENT buckets but within delta -> the neighbor-bucket
    # candidate generation must still pair them (completeness).
    rows = [
        ("B1", 1, 99.99),
        ("B1", 2, 100.01),   # pairs with 1 (diff 0.02, cross-bucket)
        ("B1", 3, 100.20),   # pairs with 2 (0.19); NOT with 1 (0.21 <= 0.25
                             # -> actually pairs with 1 too)
        ("B1", 4, 150.00),   # pairs with nobody
        ("B2", 5, 99.99),    # other brand: never pairs with B1
    ]
    df = spark.createDataFrame(
        rows, "p_brand string, p_partkey bigint, p_retailprice double"
    )
    got = {(r.key_a, r.key_b): r.price_diff
           for r in rel.band_join_parts(df).collect()}
    assert set(got) == {(1, 2), (2, 3), (1, 3)}
    assert got[(1, 2)] == 0.02
    assert all(d <= 0.25 for d in got.values())


def test_negative_sampling_excludes_positives_and_is_deterministic(spark):
    from hadoop_coded_wordcount_spark.operators import pipeline as pl
    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    out = pl.negative_sampling(orders, lineitem, part).collect()
    assert out
    positives = {
        (r.custkey, r.partkey)
        for r in orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .selectExpr("o_custkey AS custkey", "l_partkey AS partkey")
        .distinct()
        .collect()
    }
    per_cust = {}
    for r in out:
        assert (r.custkey, r.partkey) not in positives
        per_cust.setdefault(r.custkey, []).append(r.neg_rank)
    for ranks in per_cust.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # determinism: a second run returns the identical triple set
    again = {
        (r.custkey, r.partkey, r.neg_rank)
        for r in pl.negative_sampling(orders, lineitem, part).collect()
    }
    assert again == {(r.custkey, r.partkey, r.neg_rank) for r in out}


def test_preference_pairs_picks_extremes_with_margin(spark):
    from hadoop_coded_wordcount_spark.operators import pipeline as pl

    rows = [
        # cell (s1, en): clear quality spread -> one pair
        (0, " ".join(f"word{i}" for i in range(60)), "en", "s1", 100),
        (1, ";;; ::: !!!", "en", "s1", 11),
        (2, "middle quality doc words here", "en", "s1", 29),
        # cell (s2, en): two identical docs -> margin 0 -> filtered out
        (10, "same text here", "en", "s2", 14),
        (11, "same text here", "en", "s2", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    got = pl.preference_pairs(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.source, r.chosen_id, r.rejected_id) == ("s1", 0, 1)
    assert r.quality_margin >= 0.05


def test_label_propagation_recovers_planted_cliques(spark):
    from hadoop_coded_wordcount_spark.operators import graph as gr
    from itertools import combinations

    edges = [
        *combinations([1, 2, 3, 4], 2),      # clique A
        *combinations([10, 11, 12, 13], 2),  # clique B
        (4, 10),                             # one bridge
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r.node: r for r in gr.label_propagation(df).collect()}
    a = {out[n].community for n in (1, 2, 3, 4)}
    b = {out[n].community for n in (10, 11, 12, 13)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert all(out[n].community_size == 4 for n in (1, 2, 3, 10, 11, 12))
    # deterministic: rerun yields the identical labeling
    again = {r.node: r.community for r in gr.label_propagation(df).collect()}
    assert again == {n: r.community for n, r in out.items()}


def test_dedup_token_impact_tiers(spark):
    from hadoop_coded_wordcount_spark.operators import dedup as dd

    rows = [
        # s1: doc 1 is an exact copy of doc 0 (both exact- and
        # near-removable); doc 2 is unique
        (0, "alpha beta gamma delta epsilon zeta eta theta", "en", "s1", 48),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s1", 48),
        (2, "totally different words entirely here now", "en", "s1", 41),
        # s2: unique doc only
        (10, "one two three four five six", "en", "s2", 27),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    got = {r.source: r for r in dd.dedup_token_impact(df).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_tokens) == (3, 22)
    assert s1.exact_removable_tokens == 8   # doc 1 (8 tokens)
    assert s1.near_removable_tokens >= 8    # near tier drops doc 1 too
    s2 = got["s2"]
    assert s2.exact_removable_tokens == 0
    assert s2.near_removable_tokens == 0
