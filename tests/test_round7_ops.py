"""Round-7 operators: RRF fusion, char-ngram entropy, Zipf fit,
per-domain quota cap — plus the round-7 hardening contracts (url_host
userinfo/trailing-dot, signed-zero normalization)."""

import math

import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.functions import (
    char_ngram_entropy,
    domain_quota_cap,
    rrf_fuse,
    zipf_fit,
)


# ---------------------------------------------------------------- rrf_fuse

def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, doc_id long, rank int")


def test_rrf_fuse_combines_and_handles_one_sided_docs(spark):
    a = _ranked(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    b = _ranked(spark, [(0, 2, 1), (0, 4, 2)])
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=10).collect()}
    # doc 2 appears in both lists: 1/(60+2) + 1/(60+1)
    assert out[2].rrf == pytest.approx(round(1 / 62 + 1 / 61, 6))
    # one-sided docs contribute only their own list
    assert out[1].rrf == pytest.approx(round(1 / 61, 6))
    assert out[4].rrf == pytest.approx(round(1 / 62, 6))
    # doc 2 (both lists) outranks every one-sided doc
    assert out[2].rank == 1


def test_rrf_fuse_k_cut_and_per_query_isolation(spark):
    a = _ranked(spark, [(0, i, i) for i in range(1, 6)]
                + [(1, 100, 1)])
    b = _ranked(spark, [(0, i + 10, i) for i in range(1, 6)])
    out = rrf_fuse(a, b, k=3).collect()
    q0 = [r for r in out if r.query_id == 0]
    q1 = [r for r in out if r.query_id == 1]
    assert len(q0) == 3 and sorted(r.rank for r in q0) == [1, 2, 3]
    assert len(q1) == 1 and q1[0].doc_id == 100


# ---------------------------------------------------- char_ngram_entropy

def _entropy(spark, text, n=3):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = char_ngram_entropy(df, "doc_id", "text", n=n).collect()
    return rows[0] if rows else None


def test_entropy_uniform_repetition_is_zero(spark):
    # "aaaa" -> 2-grams ["aa","aa","aa"]: one distinct gram, H = 0
    r = _entropy(spark, "aaaa", n=2)
    assert r.n_grams == 3 and r.n_distinct == 1
    assert r.entropy == 0.0
    assert r.distinct_ratio == pytest.approx(round(1 / 3, 6))


def test_entropy_all_distinct_is_log_n(spark):
    # "abcd" -> 2-grams ab bc cd, all distinct: H = ln(3)
    r = _entropy(spark, "abcd", n=2)
    assert r.n_distinct == 3
    assert r.entropy == pytest.approx(round(math.log(3), 6))
    assert r.distinct_ratio == 1.0


def test_entropy_normalizes_case_and_whitespace(spark):
    # casefold + whitespace collapse before gramming
    a = _entropy(spark, "AB  cd", n=2)
    b = _entropy(spark, "ab cd", n=2)
    assert (a.n_grams, a.n_distinct, a.entropy) == \
        (b.n_grams, b.n_distinct, b.entropy)


def test_entropy_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "doc_id long, text string")
    ids = [r.doc_id for r in
           char_ngram_entropy(df, "doc_id", "text", n=3).collect()]
    assert ids == [2]


# -------------------------------------------------------------- zipf_fit

def test_zipf_fit_exact_power_law(spark):
    # freq(rank) = 1024 / rank over 8 distinct words => slope exactly -1
    rows = []
    i = 0
    for rank in range(1, 9):
        word = f"w{rank:02d}"
        rows += [(i + j, word) for j in range(1024 // rank)]
        i += 1024 // rank
    df = spark.createDataFrame(
        [(i, " ".join(w for _, w in rows))], "doc_id long, text string")
    r = zipf_fit(df, "text", top=8).collect()[0]
    assert r.n_terms == 8
    # counts are floor(1024/rank) -> slope within rounding of -1
    assert r.slope == pytest.approx(-1.0, abs=0.01)
    assert r.r2 > 0.999


def test_zipf_fit_top_bounds_terms(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c d e f g")], "doc_id long, text string")
    r = zipf_fit(df, "text", top=3).collect()[0]
    assert r.n_terms == 3


# ------------------------------------------------------- domain_quota_cap

def _docs(spark):
    rows = [(i, "big.com", 1000 - i) for i in range(20)] \
        + [(100 + i, "small.org", 10 + i) for i in range(3)]
    return spark.createDataFrame(
        rows, "doc_id long, host string, quality long")


def test_quota_caps_only_over_quota_domains(spark):
    out = domain_quota_cap(_docs(spark), "host", "doc_id", quota=5,
                           order_col="quality")
    rows = out.collect()
    big = [r for r in rows if r.host == "big.com"]
    small = [r for r in rows if r.host == "small.org"]
    assert len(big) == 5 and len(small) == 3  # under-quota passes whole
    # quality-ranked retention: the 5 highest-quality (lowest doc_id) rows
    assert sorted(r.doc_id for r in big) == [0, 1, 2, 3, 4]


def test_quota_random_mode_is_deterministic_and_salted(spark):
    df = _docs(spark)
    a = sorted(r.doc_id for r in
               domain_quota_cap(df, "host", "doc_id", 5).collect())
    b = sorted(r.doc_id for r in
               domain_quota_cap(df, "host", "doc_id", 5).collect())
    assert a == b  # pure function of ids
    c = sorted(r.doc_id for r in
               domain_quota_cap(df, "host", "doc_id", 5,
                                salt="re-deal").collect())
    assert a != c  # salt re-deals


def test_quota_validates_parameter(spark):
    with pytest.raises(ValueError):
        domain_quota_cap(_docs(spark), "host", "doc_id", 0)


def test_quota_under_quota_rows_skip_the_window(spark):
    # all domains under quota -> plan must contain no Window node
    out = domain_quota_cap(_docs(spark), "host", "doc_id", quota=100)
    assert out.count() == 23
    # the over-quota branch is empty; the union's window side processes
    # zero rows (cheap), while the pass-through side is window-free
    under = _docs(spark).join(
        F.broadcast(_docs(spark).groupBy("host")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > 100).select("host")),
        "host", "left_anti")
    assert "Window" not in under._jdf.queryExecution().executedPlan().toString()


# -------------------------------------------------------------- rank_eval

def test_rank_eval_hand_computed(spark):
    import math

    from tap_airbyte_wrapper_spark.functions import rank_eval

    ranked = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),
         (1, 20, 1), (1, 21, 2)],
        "query_id int, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(0, 11), (0, 12), (0, 13),   # 2 of 3 judged docs retrieved
         (1, 99)],                    # nothing relevant retrieved
        "query_id int, doc_id long")
    out = {r.query_id: r for r in rank_eval(ranked, truth, k=3).collect()}
    q0 = out[0]
    assert q0.n_rel == 3 and q0.n_hit == 2
    assert q0.recall_at_k == pytest.approx(round(2 / 3, 6))
    assert q0.precision_at_k == pytest.approx(round(2 / 3, 6))
    assert q0.rr == pytest.approx(0.5)          # first hit at rank 2
    dcg = 1 / math.log2(3) + 1 / math.log2(4)   # ranks 2 and 3
    idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
    assert q0.ndcg == pytest.approx(round(dcg / idcg, 6))
    q1 = out[1]
    assert q1.n_hit == 0 and q1.recall_at_k == 0.0
    assert q1.rr == 0.0 and q1.ndcg == 0.0


def test_rank_eval_graded_relevance(spark):
    from tap_airbyte_wrapper_spark.functions import rank_eval

    ranked = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id int, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 3.0)],
        "query_id int, doc_id long, rel double")
    r = rank_eval(ranked, truth, rel_col="rel", k=2).collect()[0]
    import math
    dcg = 1.0 / 1 + 3.0 / math.log2(3)
    idcg = 3.0 / 1 + 1.0 / math.log2(3)  # ideal puts rel=3 first
    assert r.ndcg == pytest.approx(round(dcg / idcg, 6))


def test_rank_eval_rel_zero_rows_not_relevant(spark):
    """Explicit rel=0 qrels rows (judged-NON-relevant, the standard
    trec shape) must not count toward n_rel/n_hit/recall/precision,
    must not set the reciprocal-rank first hit, and a query whose
    judgments are all rel=0 is absent (trec_eval drops it)."""
    import math

    from tap_airbyte_wrapper_spark.functions import rank_eval

    ranked = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3),
         (7, 9, 1)],
        "query_id int, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(0, 1, 0.0),    # judged non-relevant, retrieved at rank 1
         (0, 2, 2.0),    # relevant, retrieved at rank 2
         (0, 4, 1.0),    # relevant, not retrieved
         (7, 9, 0.0)],   # query 7: ALL judgments non-relevant
        "query_id int, doc_id long, rel double")
    out = {r.query_id: r
           for r in rank_eval(ranked, truth, rel_col="rel", k=3).collect()}
    assert list(out) == [0]                      # query 7 dropped
    q0 = out[0]
    assert q0.n_rel == 2 and q0.n_hit == 1       # doc 1 is not a hit
    assert q0.recall_at_k == pytest.approx(0.5)
    assert q0.precision_at_k == pytest.approx(round(1 / 3, 6))
    assert q0.rr == pytest.approx(0.5)           # first RELEVANT at rank 2
    dcg = 2.0 / math.log2(3)
    idcg = 2.0 / 1 + 1.0 / math.log2(3)
    assert q0.ndcg == pytest.approx(round(dcg / idcg, 6))


def test_rank_eval_unjudged_queries_absent(spark):
    from tap_airbyte_wrapper_spark.functions import rank_eval

    ranked = spark.createDataFrame(
        [(0, 1, 1), (5, 2, 1)], "query_id int, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(0, 1)], "query_id int, doc_id long")
    out = rank_eval(ranked, truth, k=5).collect()
    assert [r.query_id for r in out] == [0]  # query 5 has no judgments


# ------------------------------------------------------ chunk_by_sentences

def test_chunk_by_sentences_bucket_boundaries(spark):
    from tap_airbyte_wrapper_spark.functions import chunk_by_sentences

    df = spark.createDataFrame(
        [(1, "One two three. Four five. Six seven eight nine. Ten!")],
        "doc_id long, text string")
    out = sorted(chunk_by_sentences(df, budget_tokens=5).collect(),
                 key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in out] == [
        "One two three. Four five.", "Six seven eight nine. Ten!"]
    assert [r.n_sentences for r in out] == [2, 2]
    assert [r.n_tokens for r in out] == [5, 5]


def test_chunk_by_sentences_is_bucketing_not_greedy_reset(spark):
    """Documents the GLOBAL-boundary bucketing contract: sentence i
    goes to chunk floor(tokens_before/budget), so two 4-token
    sentences at budget 5 share chunk 0 (tokens_before 0 and 4 both
    floor to 0) where a greedy-RESET chunker would emit one sentence
    per chunk.  The docstring states this explicitly; this test pins
    it so the semantics can't silently drift."""
    from tap_airbyte_wrapper_spark.functions import chunk_by_sentences

    df = spark.createDataFrame(
        [(1, "a b c d. e f g h. i j k l.")], "doc_id long, text string")
    out = sorted(chunk_by_sentences(df, budget_tokens=5).collect(),
                 key=lambda r: r.chunk_id)
    # tokens_before = 0, 4, 8 -> raw buckets 0, 0, 1
    assert [r.n_sentences for r in out] == [2, 1]
    assert [r.n_tokens for r in out] == [8, 4]


def test_chunk_by_sentences_never_splits_a_sentence(spark):
    from tap_airbyte_wrapper_spark.functions import chunk_by_sentences

    # one 10-token sentence with a 4-token budget: one oversized chunk
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string")
    out = chunk_by_sentences(df, budget_tokens=4).collect()
    assert len(out) == 1 and out[0].n_tokens == 10


def test_chunk_by_sentences_dense_ids_and_empty_docs(spark):
    from tap_airbyte_wrapper_spark.functions import chunk_by_sentences

    df = spark.createDataFrame(
        [(1, "Long sentence with seven tokens in it. Short one. Tail."),
         (2, ""), (3, "   ")], "doc_id long, text string")
    out = chunk_by_sentences(df, budget_tokens=5).collect()
    assert {r.doc_id for r in out} == {1}  # blank docs absent
    ids = sorted(r.chunk_id for r in out)
    assert ids == list(range(len(ids)))   # dense 0..n-1 renumbering


# ------------------------------------------------------------------ dsir

def _dsir_corpus(spark):
    # target vocabulary: "alpha beta gamma"; off-distribution: "xx yy zz"
    tgt_like = [(i, "alpha beta gamma alpha beta delta") for i in range(10)]
    off = [(100 + i, "xx yy zz xx yy ww") for i in range(10)]
    return spark.createDataFrame(tgt_like + off, "doc_id long, text string")


def test_dsir_upweights_target_like_docs(spark):
    from tap_airbyte_wrapper_spark.functions import dsir_logweights

    pool = _dsir_corpus(spark)
    target = pool.filter(F.col("doc_id") < 10)
    w = {r.doc_id: r.logw for r in
         dsir_logweights(pool, target, buckets=512).collect()}
    # every target-shaped doc outscores every off-distribution doc
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))


def test_dsir_empty_doc_scores_zero_and_all_docs_present(spark):
    from tap_airbyte_wrapper_spark.functions import dsir_logweights

    pool = _dsir_corpus(spark).union(
        spark.createDataFrame([(999, "")], "doc_id long, text string"))
    target = pool.filter(F.col("doc_id") < 10)
    rows = {r.doc_id: r for r in
            dsir_logweights(pool, target, buckets=512).collect()}
    assert len(rows) == 21           # one output row per pool doc
    assert rows[999].n_grams == 0 and rows[999].logw == 0.0
    # 6 unigrams + 5 bigrams per non-empty doc
    assert rows[0].n_grams == 11


def test_dsir_resample_deterministic_and_weight_biased(spark):
    from tap_airbyte_wrapper_spark.functions import dsir_resample

    pool = _dsir_corpus(spark)
    target = pool.filter(F.col("doc_id") < 10)
    s1 = dsir_resample(pool, target, k=8, buckets=512).collect()
    s2 = dsir_resample(pool.repartition(7), target, k=8,
                       buckets=512).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]  # partition-proof
    assert len(s1) == 8
    picked = {r.doc_id for r in s1}
    assert picked <= {r.doc_id for r in pool.collect()}
    # weight bias: the 8-of-20 draw keeps more target-shaped docs
    assert len([i for i in picked if i < 100]) > \
        len([i for i in picked if i >= 100])


def test_dsir_plan_shape(spark):
    from tap_airbyte_wrapper_spark.functions import (
        dsir_logweights, dsir_resample)

    pool = _dsir_corpus(spark)
    target = pool.filter(F.col("doc_id") < 10)
    p = dsir_logweights(pool, target, buckets=512) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p      # llr table broadcast to the scan
    p2 = dsir_resample(pool, target, k=5, buckets=512) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p2  # top-k, never a global sort


def test_dsir_target_only_grams_keep_target_count(spark):
    """A gram seen only in the TARGET corpus (absent from the pool)
    must keep its smoothed target count in the model — scoring
    ln(ct+1) + const, NOT the counts-free default_llr.  These are the
    most target-characteristic grams of all, exactly what the
    stream_dsir_gate exists to admit."""
    import math

    from tap_airbyte_wrapper_spark.functions import dsir_fit, dsir_score

    pool = spark.createDataFrame(
        [(1, "xx yy")], "doc_id long, text string")
    target = spark.createDataFrame(
        [(2, "qq qq qq")], "doc_id long, text string")
    model = dsir_fit(pool, target, buckets=512)
    batch = spark.createDataFrame(
        [(10, "qq"), (11, "unseen")], "doc_id long, text string")
    w = {r.doc_id: r.logw for r in dsir_score(batch, model).collect()}
    # 'qq' unigram: ct=3, cr=0 -> ln(4) - ln(1) + const;
    # 'unseen' hits no fitted bucket -> default_llr = const
    assert w[10] - w[11] == pytest.approx(math.log(4.0), abs=1e-5)
    assert w[11] == pytest.approx(model.default_llr, abs=1e-6)


# -------------------------------------------------------------- triangles

def test_triangle_count_hand_graph(spark):
    from tap_airbyte_wrapper_spark.operators import triangle_count

    # triangle 1-2-3, square 4-5-6-7 (triangle-free), pendant 8 on 1;
    # plus a duplicate and a reversed edge (must collapse) and a loop
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 7), (7, 4),
             (1, 8), (2, 1), (1, 2), (5, 5)]
    df = spark.createDataFrame(edges, "s long, d long")
    out = {r.node: r for r in triangle_count(df, "s", "d").collect()}
    assert out[1].degree == 3 and out[1].triangles == 1
    assert out[1].clustering == round(2 * 1 / (3 * 2), 6)
    assert out[2].triangles == 1 and out[2].clustering == 1.0
    assert out[4].triangles == 0 and out[4].clustering == 0.0
    assert out[8].degree == 1 and out[8].clustering == 0.0
    assert len(out) == 8  # the self-loop adds no node


def test_triangle_count_complete_graph_and_skewed_hub(spark):
    from tap_airbyte_wrapper_spark.operators import triangle_count

    # K5: every node in C(4,2)=6 triangles, clustering 1.0
    k5 = [(i, j) for i in range(5) for j in range(5) if i < j]
    out = triangle_count(
        spark.createDataFrame(k5, "s long, d long"), "s", "d").collect()
    assert all(r.triangles == 6 and r.clustering == 1.0 for r in out)
    # star hub (no triangles despite huge degree) + one closing edge
    star = [(0, i) for i in range(1, 30)] + [(1, 2)]
    out = {r.node: r for r in triangle_count(
        spark.createDataFrame(star, "s long, d long"), "s", "d").collect()}
    assert out[0].triangles == 1      # only the 0-1-2 closure
    assert out[3].triangles == 0


# ---------------------------------------------------------- source_overlap

def test_source_overlap_counts_and_symmetry(spark):
    from tap_airbyte_wrapper_spark.functions import source_overlap

    rows = [("A", "x"), ("A", "y"), ("A", "z"),
            ("B", "x"), ("B", "y"), ("B", "q"),
            ("C", "unrelated"),
            ("A", "x")]  # duplicate within A: distinct-ed away
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.group_a, r.group_b): r for r in
           source_overlap(df, "source", "text").collect()}
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_common) == (3, 3, 2)
    assert ab.jaccard == round(2 / 4, 6)
    assert ab.containment_a == round(2 / 3, 6)
    # disjoint pairs are absent, not zero rows
    assert ("A", "C") not in out and ("B", "C") not in out


def test_source_overlap_normalization_folds_whitespace_case(spark):
    from tap_airbyte_wrapper_spark.functions import source_overlap

    df = spark.createDataFrame(
        [("A", "Hello  World"), ("B", "hello world")],
        "source string, text string")
    out = source_overlap(df, "source", "text").collect()
    assert len(out) == 1 and out[0].n_common == 1


def test_dsir_fit_score_persist_roundtrip(spark, tmp_path):
    from tap_airbyte_wrapper_spark.functions import (
        dsir_fit, dsir_logweights, dsir_score, load_dsir, save_dsir)

    pool = _dsir_corpus(spark)
    target = pool.filter(F.col("doc_id") < 10)
    model = dsir_fit(pool, target, buckets=512)
    # fit+score == the one-shot wrapper
    a = {r.doc_id: r.logw for r in dsir_score(pool, model).collect()}
    b = {r.doc_id: r.logw for r in
         dsir_logweights(pool, target, buckets=512).collect()}
    assert a == b
    # save -> load -> score is identical
    save_dsir(model, spark, str(tmp_path / "dsir"))
    loaded = load_dsir(spark, str(tmp_path / "dsir"))
    assert loaded.buckets == 512 and loaded.default_llr == model.default_llr
    c = {r.doc_id: r.logw for r in dsir_score(pool, loaded).collect()}
    assert a == c
    # a NEW batch with out-of-vocabulary grams scores via default_llr,
    # no refit: 3 grams (2 uni + 1 bi), all unseen
    new = spark.createDataFrame(
        [(5000, "unseen tokens")], "doc_id long, text string")
    r = dsir_score(new, loaded).collect()[0]
    assert r.n_grams == 3
    assert r.logw == round(round(3 * loaded.default_llr, 6) + 0.0, 6)


# ------------------------------------------------------- label propagation

def _python_lpa(edges, n_iter):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbs in adj.items():
            counts = {}
            for nb in nbs:
                counts[labels[nb]] = counts.get(labels[nb], 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


def test_label_propagation_matches_python_reference(spark):
    import random

    from tap_airbyte_wrapper_spark.operators import label_propagation

    rng = random.Random(11)
    edges = [(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(60)]
    edges = [e for e in edges if e[0] != e[1]]
    for n_iter in (1, 2, 3):
        got = {r.node: r.community for r in label_propagation(
            spark.createDataFrame(edges, "s long, d long"),
            "s", "d", n_iter=n_iter).collect()}
        assert got == _python_lpa(edges, n_iter)


def test_label_propagation_separates_bridged_cliques(spark):
    from tap_airbyte_wrapper_spark.operators import label_propagation

    cliq = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = cliq([1, 2, 3, 4]) + cliq([10, 11, 12, 13]) + [(4, 10)]
    out = {r.node: r.community for r in label_propagation(
        spark.createDataFrame(edges, "s long, d long"),
        "s", "d", n_iter=3).collect()}
    assert len({out[n] for n in (1, 2, 3, 4)}) == 1
    assert len({out[n] for n in (10, 11, 12, 13)}) == 1
    assert out[1] != out[11]


# -------------------------------------------------------------- bm25 index

def test_bm25_index_search_equals_fresh_bm25(spark, tmp_path):
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_append, bm25_index_search, bm25_index_write, bm25_topk)

    docs = spark.createDataFrame(
        [(i, f"token{i % 7} alpha shared token{i % 3} text body")
         for i in range(40)], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "token1 alpha"), (1, "token2 shared")],
        "query_id int, query_text string")
    bm25_index_write(docs.filter(F.col("doc_id") < 25), "bm25t",
                     str(tmp_path / "idx"), "doc_id", "text", n_buckets=4)
    bm25_index_append(docs.filter(F.col("doc_id") >= 25), "bm25t",
                      "doc_id", "text")
    got = bm25_index_search(
        spark, "bm25t", queries, str(tmp_path / "idx"), k=8).collect()
    want = bm25_topk(docs, queries, k=8).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(got, key=key) == sorted(want, key=key)


def test_prf_expansion_changes_and_improves_recallable_set(spark):
    """PRF sanity on a planted vocabulary gap: the query says 'alpha'
    but the relevant cluster also uses 'beta'; the first pass finds the
    bridge docs, 'beta' enters the expansion set, and beta-only docs
    become retrievable in the second pass."""
    from tap_airbyte_wrapper_spark.functions import bm25_topk, prf_expand_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta topic") for i in range(5)]         # bridge docs
        + [(10 + i, "beta beta topic") for i in range(5)]   # beta-only
        + [(100 + i, f"noise{i} filler junk") for i in range(20)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha")], "query_id int, query_text string")
    plain = {r.doc_id for r in bm25_topk(docs, queries, k=15).collect()}
    prf = {r.doc_id for r in prf_expand_topk(
        docs, queries, k=15, r=3, e=2).collect()}
    assert not any(10 <= d < 20 for d in plain)   # beta-only unreachable
    assert any(10 <= d < 20 for d in prf)         # reachable after PRF
    assert all(d < 100 or d in plain for d in prf)  # no junk added
