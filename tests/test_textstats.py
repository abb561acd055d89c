"""Text-analysis operator edge semantics (the oracle sweep covers the
bulk arithmetic; these pin tie-breaks and degenerate inputs)."""

from __future__ import annotations

import pytest

from conftest import SF001

from hadoop_coded_wordcount_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog is in the house", "en", "s", 35),
        (1, "el perro y la casa es un lugar en la ciudad", "es", "s", 43),
        (2, "xyzzy plugh", "zz", "s", 11),  # no stopword hits anywhere
        (3, "a!b?c.", "en", "s", 6),  # punctuation-heavy
        (4, "short", "en", "s", 5),  # shorter than fingerprint k-gram
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_lang_id_votes_and_tiebreak(docs):
    out = {r.doc_id: (r.pred_lang, r.score) for r in ts.lang_id(docs).collect()}
    assert out[0] == ("en", 4)  # the, and, is, in
    assert out[1][0] == "es"
    # zero hits everywhere -> deterministic tie-break to first lang code
    assert out[2] == ("de", 0)


def test_text_stats_values(docs):
    r = {x.doc_id: x for x in ts.text_stats(docs).collect()}
    assert r[0].n_tokens == 9
    assert r[0].punct_ratio == 0.0
    assert r[3].n_tokens == 1 and r[3].max_token_len == 6
    assert r[3].punct_ratio == pytest.approx(3 / 6)


def test_quality_score_bounds(docs):
    for r in ts.quality_score(docs).collect():
        assert 0.0 <= r.quality <= 1.0


def test_token_count_bpe_splits_punct(docs):
    r = {x.doc_id: x for x in ts.token_count(docs).collect()}
    # "a!b?c." -> a ! b ? c .  = 6 BPE-ish tokens from 1 ws token
    assert r[3].n_ws_tokens == 1
    assert r[3].n_bpe_tokens == 6


def test_winnowing_excludes_short_docs(docs):
    ids = {r.doc_id for r in ts.winnowing_fingerprint(docs, k=8).collect()}
    assert 4 not in ids  # 5 chars < k
    assert 0 in ids
    fp = {r.doc_id: r.fingerprint for r in ts.winnowing_fingerprint(docs).collect()}
    assert all(len(v) == 32 for v in fp.values())  # md5 hex


def test_token_frequency_sketch_estimates(spark):
    """Decode the CMS blob and pin estimates: exact for heavy hitters at
    this scale, and never an underestimate (the CMS guarantee)."""
    from pyspark.sql import functions as F

    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    row = ts.token_frequency_sketch(docs).collect()[0]
    assert row.n_tokens > 0
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row.sketch)
    )
    true_counts = {
        r.tok: r.cnt
        for r in docs.select(
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(5)
        .collect()
    }
    for tok, cnt in true_counts.items():
        est = jcms.estimateCount(tok)
        assert est >= cnt  # never underestimates
        assert est <= cnt * 1.01 + 10  # eps-tight at this scale


def test_gopher_repetition_planted(spark):
    rows = [
        (0, "spam spam spam spam ham", "en", "s", 23),  # heavy repetition
        (1, "all words here are unique tokens", "en", "s", 32),
        (2, "solo", "en", "s", 4),  # < 2 tokens -> excluded
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {r.doc_id: r for r in ts.gopher_repetition(docs).collect()}
    assert set(got) == {0, 1}
    assert got[0].n_tokens == 5
    assert got[0].top_token_frac == pytest.approx(4 / 5)
    # bigrams: 'spam spam' x3 of 4 bigrams
    assert got[0].top_bigram_frac == pytest.approx(3 / 4)
    # the operator rounds to 6 decimals — compare against the same rounding
    assert got[1].top_token_frac == round(1 / 6, 6)
    assert got[1].top_bigram_frac == round(1 / 5, 6)


def test_inverted_index_postings(spark):
    rows = [(i, "alpha beta " + ("gamma" if i % 2 else "delta"), "en", "s", 1)
            for i in range(10)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {r.term: r for r in ts.inverted_index(docs, min_df=5).collect()}
    assert set(got) == {"alpha", "beta", "gamma", "delta"}
    assert got["alpha"].df == 10
    assert got["gamma"].df == 5
    assert got["gamma"].postings_head == "1,3,5,7,9"
    assert got["alpha"].postings_head == "0,1,2,3,4,5,6,7,8,9"


def test_tfidf_ranks_rare_terms_first(spark):
    rows = [
        (0, "common rare0 common", "en", "s", 1),
        (1, "common rare1", "en", "s", 1),
        (2, "common rare2", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {(r.doc_id, r.rank): r for r in ts.tfidf_topk(docs, k=2).collect()}
    # rare term (df=1) outranks the common one (df=3) despite tf=2 on doc 0:
    # doc0: rare0 = 1*3/1 = 3.0 ; common = 2*3/3 = 2.0
    assert got[(0, 1)].term == "rare0" and got[(0, 1)].tfidf == 3.0
    assert got[(0, 2)].term == "common" and got[(0, 2)].tfidf == 2.0
    assert got[(1, 1)].term == "rare1"


def test_pii_redact_masks_everything(spark):
    """After redaction no PII pattern may survive, and counts mirror the
    deterministic injection schedule (email 2/3, phone 1/2, IP all)."""
    import pyspark.sql.functions as F

    from hadoop_coded_wordcount_spark.operators import textstats as ts
    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    out = ts.pii_redact(load_table(spark, SF001, "documents")).persist()
    n = out.count()
    leftovers = out.where(
        F.col("redacted").rlike(ts.PII_EMAIL)
        | F.col("redacted").rlike(ts.PII_PHONE)
        | F.col("redacted").rlike(ts.PII_IPV4)
    ).count()
    assert leftovers == 0
    agg = out.agg(
        F.sum("n_email").alias("e"), F.sum("n_phone").alias("p"), F.sum("n_ip").alias("i")
    ).collect()[0]
    out.unpersist()
    assert agg["i"] == n  # every doc gets an IP
    assert 0 < agg["e"] < n and 0 < agg["p"] < n
    assert out.where(F.col("redacted").contains("[EMAIL]")).count() == out.where(
        F.col("n_email") > 0
    ).count()


def test_bigram_lm_edges_and_probabilities(spark):
    """Sub-2-token docs contribute nothing (the sequence(1,0) descending
    trap), pairs count adjacency with multiplicity, and P(w2|w1) sums to
    1 per w1."""
    from hadoop_coded_wordcount_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a"),
            (3, ""),
            (4, "  "),
            (5, "b c"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r.w1, r.w2): (r.cnt, r.cond_p) for r in ts.bigram_lm(docs).collect()}
    assert rows[("a", "b")] == (2, 1.0)         # both 'a b' occurrences
    assert rows[("b", "a")] == (1, round(1 / 3, 6))
    assert rows[("b", "c")] == (2, round(2 / 3, 6))
    assert ("c", "a") not in rows               # no cross-document pairs
    import collections

    totals = collections.defaultdict(float)
    for (w1, _), (_, p) in rows.items():
        totals[w1] += p
    assert all(abs(t - 1.0) < 1e-6 for t in totals.values())


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in ts.char_entropy(docs).collect()}
    assert got[1].entropy_bits == 0.0 and got[1].distinct_chars == 1
    assert got[2].entropy_bits == 1.0  # two equiprobable symbols
    assert got[3].entropy_bits == 2.0  # four equiprobable symbols
    assert got[3].n_chars == 4


def test_perplexity_buckets_orders_quality(spark):
    """Repetitive text = predictable bigrams = low NLL = bucket 1; docs
    of unique-vocabulary text land in the tail bucket."""
    rep = "the cat sat . " * 10
    docs = spark.createDataFrame(
        [(i, rep) for i in range(6)]
        + [(10 + i, f"zq{i} xv{i} wk{i} jm{i} qq{i} zz{i}") for i in range(6)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in ts.perplexity_buckets(docs, buckets=2).collect()
    }
    assert len(got) == 12
    for i in range(6):
        assert got[i].ppl_bucket == 1, got[i]
        assert got[10 + i].ppl_bucket == 2, got[10 + i]
        assert got[i].avg_nll < got[10 + i].avg_nll


def test_bpe_train_classic_corpus(spark):
    """The Sennrich corpus: merges must match a reference in-memory BPE
    exactly — including the left-to-right non-overlapping rewrite and
    lexicographic tie-breaks."""
    import collections

    from hadoop_coded_wordcount_spark.operators import textstats as ts

    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = spark.createDataFrame(
        [(1, " ".join(w for w, c in freq.items() for _ in range(c)))],
        "doc_id bigint, text string",
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in ts.bpe_train(docs, n_merges=6).collect()
    ]

    vocab = {tuple(w): c for w, c in freq.items()}
    exp = []
    for rank in range(1, 7):
        pc = collections.Counter()
        for w, c in vocab.items():
            for i in range(len(w) - 1):
                pc[(w[i], w[i + 1])] += c
        m = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == m)[0]
        exp.append((rank, a, b, m))
        new = {}
        for w, c in vocab.items():
            out = []
            for ch in w:
                if out and out[-1] == a and ch == b:
                    out[-1] = a + b
                else:
                    out.append(ch)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    assert got == exp


def test_bpe_train_empty_and_single_char(spark):
    """Empty corpus -> empty merge table; single-char words produce no
    pairs and must not crash the argmax round."""
    from hadoop_coded_wordcount_spark.operators import textstats as ts

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert ts.bpe_train(empty, n_merges=3).count() == 0
    singles = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id bigint, text string"
    )
    assert ts.bpe_train(singles, n_merges=3).count() == 0


def test_textrank_hub_word_ranks_first(spark):
    """A word adjacent to every other word must take the most rank
    mass; self-pairs are excluded; empty corpus yields a typed empty
    frame."""
    from hadoop_coded_wordcount_spark.operators.textstats import (
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "hub spoke1"), (2, "hub spoke2"), (3, "hub spoke3"),
         (4, "loop loop")],
        ["doc_id", "text"],
    )
    out = textrank_keywords(docs, k=10).collect()
    # 'loop loop' has only a self-pair -> contributes no node at all
    assert {r.word for r in out} == {"hub", "spoke1", "spoke2", "spoke3"}
    assert out[0].word == "hub" and out[0].rank_pos == 1
    spokes = [r for r in out if r.word != "hub"]
    assert len({r.rank_scaled for r in spokes}) == 1  # symmetric spokes tie
    assert [r.rank_pos for r in sorted(out, key=lambda r: r.rank_pos)] == [
        1, 2, 3, 4,
    ]
    empty = textrank_keywords(
        spark.createDataFrame([], "doc_id bigint, text string")
    )
    assert empty.collect() == []


def test_source_diversity_known_mixtures(spark):
    """Uniform 4-source mix -> H = ln 4, Simpson 0.25, effective 4;
    single-source monoculture -> H = 0, Simpson 1, effective 1."""
    import math

    from hadoop_coded_wordcount_spark.operators.textstats import (
        source_diversity,
    )

    rows = []
    did = 0
    for s in ("a", "b", "c", "d"):
        for _ in range(5):
            did += 1
            rows.append((did, "x", "en", s, 1))
    for _ in range(7):
        did += 1
        rows.append((did, "x", "fr", "only", 1))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    )
    got = {r.lang: r for r in source_diversity(docs).collect()}
    en, fr = got["en"], got["fr"]
    assert (en.n_docs, en.n_sources) == (20, 4)
    assert en.shannon_nats == round(math.log(4), 6)
    assert en.simpson == 0.25 and en.effective_sources == 4.0
    assert (fr.n_docs, fr.n_sources) == (7, 1)
    assert fr.shannon_nats == 0.0 and fr.simpson == 1.0
    assert fr.effective_sources == 1.0


def test_source_overlap_hand_sets(spark):
    """Vocabulary sets {a,b,c}/{b,c,d} -> Jaccard 2/4; a disjoint
    source pairs with others at 0 common terms (no row at all, since
    pairs meet only on shared vocabulary)."""
    from hadoop_coded_wordcount_spark.operators.textstats import (
        source_overlap,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "b c d", "en", "s2", 5),
            (3, "b c", "en", "s2", 3),   # dup terms within source collapse
            (4, "x y z", "en", "s3", 5),
        ],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    got = {(r.src_a, r.src_b): r for r in source_overlap(docs).collect()}
    assert set(got) == {("s1", "s2")}  # s3 shares nothing -> no row
    r = got[("s1", "s2")]
    assert (r.terms_a, r.terms_b, r.n_common) == (3, 3, 2)
    assert r.jaccard == 0.5


def test_tokenizer_fertility_hand_corpus(spark):
    """Corpus 'ab ab cd' x many: after 1 merge ('a','b')->'ab', the word
    'ab' is 1 token and 'cd' stays 2 chars->... with n_merges=1 the pair
    (a,b) (count 2 per doc) merges first, so fertility of the single
    lang = (2*1 + 1*2)/3 tokens per word."""
    docs = spark.createDataFrame(
        [(1, "ab ab cd", "en", "s", 8), (2, "ab ab cd", "en", "s", 8)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = ts.tokenizer_fertility(docs, n_merges=1).collect()
    assert len(got) == 1
    r = got[0]
    # per doc: words ab, ab, cd -> occurrences: ab x2 (1 BPE token after
    # the merge), cd x1 (2 tokens: merge rank 1 only merged (a,b))
    assert r.lang == "en"
    assert r.n_words == 6
    assert r.n_bpe_tokens == 2 * 2 * 1 + 2 * 1 * 2
    assert r.n_chars == 12
    assert r.fertility == round(8 / 6, 6)
    assert r.chars_per_token == round(12 / 8, 6)


def test_readability_scores_hand_text(spark):
    """'the cat sat. it ran!' -> 5 words, 2 sentences, 5 vowel groups;
    Flesch ease = 206.835 - 1.015*2.5 - 84.6*1.0."""
    docs = spark.createDataFrame(
        [(1, "the cat sat. it ran!", "en", "s", 20)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = ts.readability_scores(docs).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    assert r.flesch_ease == round(206.835 - 1.015 * 2.5 - 84.6 * 1.0, 6)
    assert r.fk_grade == round(0.39 * 2.5 + 11.8 * 1.0 - 15.59, 6)


def test_readability_unpunctuated_is_one_sentence(spark):
    docs = spark.createDataFrame(
        [(1, "plain words only here", "en", "s", 21)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = ts.readability_scores(docs).collect()[0]
    assert r.n_sentences == 1 and r.n_words == 4


def test_bigram_heldout_xent_python_replay(spark):
    """Tiny split corpus replayed in Python with the same add-one
    smoothing, per-term rounding, and decimal accumulation."""
    import math
    from decimal import Decimal

    docs = spark.createDataFrame(
        [
            (0, "a b a b", "en", "s", 7),  # train: bigrams ab, ba, ab
            (2, "a c", "en", "s", 3),  # train: ac
            (1, "a b c d", "en", "s", 7),  # eval: ab, bc, cd
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = ts.bigram_heldout_xent(docs).collect()[0]
    # train vocab {a,b,c} -> V=3; c1: a->3, b->1; c12: (a,b)->2, (b,a)->1,
    # (a,c)->1. eval bigrams: (a,b) seen, (b,c) unseen pair (c1(b)=1),
    # (c,d) unseen history (c1=0).
    assert (r.n_eval_bigrams, r.n_unseen_bigrams) == (3, 2)
    terms = [
        round(-math.log((2 + 1) / (3 + 3)), 6),  # (a,b)
        round(-math.log((0 + 1) / (1 + 3)), 6),  # (b,c)
        round(-math.log((0 + 1) / (0 + 3)), 6),  # (c,d)
    ]
    total = sum(Decimal(str(t)) for t in terms)
    mean = round(float(total) / 3, 6)
    assert r.mean_nll == mean
    assert r.ppl == round(math.exp(mean), 4)


def test_vocab_growth_monotone_and_accounting(spark):
    from conftest import SF001

    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    docs = load_table(spark, SF001, "documents")
    rows = sorted(
        ts.vocab_growth_curve(docs).collect(), key=lambda r: r.slice_id
    )
    assert [r.slice_id for r in rows] == list(range(10))
    assert rows[0].new_types == rows[0].cum_types  # slice 0 is all-new
    # cumulative columns really are running sums
    assert rows[-1].cum_tokens == sum(r.n_tokens for r in rows)
    assert rows[-1].cum_types == sum(r.new_types for r in rows)
    # new vocabulary per slice shrinks overall (Heaps): the last slice
    # introduces far less than the first
    assert rows[-1].new_types < rows[0].new_types
    assert all(0 < r.heaps_exponent < 1 for r in rows)


def test_zipf_fit_recovers_planted_power_law(spark):
    """Plant frequencies c_i = floor(1200/i): the log-log fit must come
    back near slope -1 with high R^2; the synthetic corpus (near-uniform
    vocabulary) honestly scores far from Zipfian."""
    words = []
    for i in range(1, 41):
        words += [f"w{i:02d}"] * (1200 // i)
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = ts.zipf_fit(docs).collect()[0]
    assert r.n_words_fit == 40
    assert -1.05 < r.zipf_slope < -0.95
    assert r.r2 > 0.99


def test_bm25_length_normalization_and_saturation(spark):
    """Two docs with the same query-term tf: the shorter one scores
    higher (length normalization); tripling tf does NOT triple the
    score (k1 saturation)."""
    rows = [
        # pin the query: t1..t5 dominate the df ranking
        *[(10 + i, "t1 t2 t3 t4 t5", "en", "s", 1) for i in range(6)],
        (0, "t1 t1 pad0", "en", "s", 1),
        (1, "t1 t1 pada padb padc padd pade padf", "en", "s", 1),
        (2, "t1 t1 t1 t1 t1 t1 pad9", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {r.doc_id: r.bm25 for r in ts.bm25_topk(docs, k=20).collect()}
    assert got[0] > got[1]  # same tf on every query term, shorter doc wins
    # saturation: 3x the tf of doc 0's t1 must be < 3x its score
    assert got[2] < 3 * got[0]


def test_bm25_limits_to_k_with_doc_id_ties(spark):
    rows = [(i, "q filler", "en", "s", 1) for i in range(30)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = ts.bm25_topk(docs, k=5).collect()
    # identical docs -> identical scores; tie broken by doc_id asc
    assert [r.doc_id for r in got] == [0, 1, 2, 3, 4]


def test_naive_bayes_separable_vocab_is_diagonal(spark):
    """Fully language-disjoint vocabularies: every held-out doc must be
    classified correctly -> confusion matrix is diagonal."""
    rows = []
    vocab = {"en": "alpha beta gamma", "fr": "delta epsilon zeta"}
    for i in range(20):
        lang = "en" if i % 2 == 0 else "fr"
        rows.append((i, vocab[lang], lang, "s", 1))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = ts.naive_bayes_langid(docs).collect()
    assert all(r.lang == r.pred_lang for r in got)
    # 4 held-out docs (ids 0,5,10,15): en ids 0,10; fr ids 5,15
    assert {(r.lang, r.n_docs) for r in got} == {("en", 2), ("fr", 2)}


def test_naive_bayes_prior_decides_oov_docs(spark):
    """A held-out doc made of unseen tokens gets identical likelihoods
    up to T_l; with balanced T_l the majority-prior class wins."""
    rows = [
        # train: 3 en docs, 1 fr doc, same token budget per doc
        (1, "common tokens here now", "en", "s", 1),
        (2, "common tokens here now", "en", "s", 1),
        (3, "common tokens here now", "en", "s", 1),
        (4, "autre jeton ici donc", "fr", "s", 1),
        # test: all-OOV tokens
        (5, "zzz yyy xxx www", "fr", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = ts.naive_bayes_langid(docs).collect()
    assert len(got) == 1
    r = got[0]
    # T_en = 12 > T_fr = 4: smoothing gives fr HIGHER likelihood per OOV
    # token (1/(T_l+V) larger), and prior ln(1/4) < ln(3/4) favors en;
    # the likelihood margin dominates: 4*[ln(1/12+V) - ln(1/4+V)] vs prior
    assert r.lang == "fr" and r.pred_lang == "fr"


def test_feature_hashing_partitions_vocabulary_exactly(spark):
    """Bucket stats must partition the vocabulary: n_terms sums to the
    distinct-term count and token_mass to the corpus token count; the
    top term is the (tf, term)-max of its bucket."""
    rows = [(0, "aa bb aa cc", "en", "s", 1), (1, "bb dd", "en", "s", 1)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = ts.feature_hashing(docs, n_buckets=4).collect()
    assert sum(r.n_terms for r in got) == 4  # aa bb cc dd
    assert sum(r.token_mass for r in got) == 6
    for r in got:
        assert 0 <= r.bucket < 4 and r.top_term


def test_boilerplate_ngrams_flags_shared_bigram(spark):
    """'nav bar' appears in 5/6 docs of source s → boilerplate; every
    other bigram is doc-unique (df=1 < 0.25·6). Source t has only 2
    docs (< min_docs) → nothing flagged there."""
    rows = []
    for i in range(5):
        rows.append((i, f"nav bar u{i}a u{i}b u{i}c", "en", "s"))
    rows.append((5, "x1 x2 x3", "en", "s"))
    rows.append((6, "nav bar nav bar", "en", "t"))
    rows.append((7, "nav bar nav bar", "en", "t"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    got = {r.source: r for r in ts.boilerplate_ngrams(docs).collect()}
    s = got["s"]
    # 5 docs: 4 positions, 1 boilerplate ('nav bar') → share 0.25 each;
    # the sixth doc shares none → mean = 1.25/6
    assert s.n_boiler_grams == 1
    assert s.n_docs == 6
    assert s.avg_boiler_share == round(5 * 0.25 / 6, 6)
    t = got["t"]
    assert t.n_boiler_grams == 0 and t.avg_boiler_share == 0.0


def test_trigram_lm_interpolates_exact_ratios(spark):
    """Tiny corpus 'a b c a b d': P(c|a,b)=1/2, P(c|b)=1/2, P(c)=1/6 →
    interp = 0.6/2 + 0.3/2 + 0.1/6 round 6."""
    docs = spark.createDataFrame(
        [(0, "a b c a b d", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    got = {
        (r.w1, r.w2, r.w3): (r.cnt, r.interp_p)
        for r in ts.trigram_lm(docs).collect()
    }
    # trigrams: (a,b,c) (b,c,a) (c,a,b) (a,b,d)
    assert got[("a", "b", "c")] == (
        1,
        round(0.6 * 0.5 + 0.3 * 0.5 + 0.1 * (1 / 6), 6),
    )
    assert got[("a", "b", "d")][0] == 1
    # P(a|b,c)=1, P(a|c)=1, P(a)=2/6
    assert got[("b", "c", "a")] == (
        1,
        round(0.6 * 1.0 + 0.3 * 1.0 + 0.1 * (2 / 6), 6),
    )
    assert len(got) == 4
