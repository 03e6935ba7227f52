"""Randomized invariant checks for the round-7 operators: one seeded
random corpus per test (50-200 rows, single Spark job), invariants
asserted per row — the DataFrame-level complement to hypothesis (which
here would pay a Spark job per drawn example)."""

import math
import random
import string

from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.functions import (
    char_ngram_entropy,
    chunk_by_sentences,
    domain_quota_cap,
    rrf_fuse,
)


def _random_texts(seed, n=50):
    rng = random.Random(seed)
    alphabet = string.ascii_lowercase + "  .!?;éü"
    out = []
    for i in range(n):
        ln = rng.randint(0, 200)
        out.append((i, "".join(rng.choice(alphabet) for _ in range(ln))))
    return out


def test_chunking_conserves_tokens_and_sentences(spark):
    df = spark.createDataFrame(_random_texts(7), "doc_id long, text string")
    chunks = chunk_by_sentences(df, budget_tokens=8)
    got = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("tok"),
             F.sum("n_sentences").alias("sent"),
             F.max("chunk_id").alias("maxc"),
             F.count(F.lit(1)).alias("nc"))
    )
    # doc-side truth computed with the same marker split + token count
    sents = F.filter(
        F.transform(
            F.split(F.regexp_replace(F.trim(F.col("text")),
                                     r"([.!?])\s+", "$1\x01"), "\x01"),
            lambda s: F.trim(s)),
        lambda s: s != "")
    truth = df.select(
        "doc_id",
        F.size(F.regexp_extract_all(
            F.array_join(sents, " "), F.lit(r"\S+"), 0)).alias("tok0"),
        F.size(sents).alias("sent0"))
    rows = truth.join(got, "doc_id", "left").collect()
    for r in rows:
        if r.sent0 == 0:
            assert r.tok is None  # blank docs absent from output
            continue
        assert r.tok == r.tok0, r      # token conservation
        assert r.sent == r.sent0, r    # sentence conservation
        assert r.maxc == r.nc - 1, r   # dense chunk ids 0..n-1


def test_entropy_bounds_hold_on_random_text(spark):
    df = spark.createDataFrame(_random_texts(13), "doc_id long, text string")
    rows = char_ngram_entropy(df, n=3).collect()
    assert rows  # at least some docs are long enough
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_grams, r
        assert -1e-9 <= r.entropy <= math.log(r.n_distinct) + 1e-6, r
        assert abs(r.distinct_ratio - round(r.n_distinct / r.n_grams, 6)) \
            < 1e-9, r


def test_quota_exact_per_domain_counts(spark):
    rng = random.Random(3)
    rows = []
    rid = 0
    sizes = {}
    for d in range(12):
        n = rng.randint(1, 30)
        sizes[f"d{d}"] = n
        for _ in range(n):
            rows.append((rid, f"d{d}")); rid += 1
    df = spark.createDataFrame(rows, "id long, host string")
    for quota in (1, 7, 30):
        got = {r.host: r.n for r in
               domain_quota_cap(df, "host", "id", quota)
               .groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got == {h: min(quota, n) for h, n in sizes.items()}, quota


def test_rrf_ranks_are_dense_per_query(spark):
    rng = random.Random(5)
    a = [(q, d, r + 1) for q in range(6)
         for r, d in enumerate(rng.sample(range(100), rng.randint(1, 10)))]
    b = [(q, d, r + 1) for q in range(6)
         for r, d in enumerate(rng.sample(range(100), rng.randint(1, 10)))]
    fused = rrf_fuse(
        spark.createDataFrame(a, "query_id int, doc_id long, rank int"),
        spark.createDataFrame(b, "query_id int, doc_id long, rank int"),
        k=5)
    per_q = {}
    for r in fused.collect():
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
        assert len(ranks) <= 5


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    from itertools import combinations

    from tap_airbyte_wrapper_spark.operators import triangle_count

    rng = random.Random(77)
    nodes = list(range(18))
    edges = [(a, b) for a, b in combinations(nodes, 2)
             if rng.random() < 0.25]
    # brute force: per-node triangle membership over the adjacency set
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    expect = {}
    for n in nodes:
        if not adj[n]:
            continue
        t = sum(1 for u, v in combinations(sorted(adj[n]), 2)
                if v in adj[u])
        d = len(adj[n])
        expect[n] = (d, t,
                     round(2 * t / (d * (d - 1)), 6) if d >= 2 else 0.0)
    out = {r.node: (r.degree, r.triangles, r.clustering)
           for r in triangle_count(
               spark.createDataFrame(edges, "s long, d long"),
               "s", "d").collect()}
    assert out == expect


def test_source_overlap_matches_setmath_on_random_slices(spark):
    rng = random.Random(9)
    texts = [f"text {i % 30}" for i in range(120)]  # forced collisions
    rows = [(rng.choice("ABC"), t) for t in texts]
    from tap_airbyte_wrapper_spark.functions import source_overlap

    sets = {}
    for g, t in rows:
        sets.setdefault(g, set()).add(t)
    out = {(r.group_a, r.group_b): r for r in source_overlap(
        spark.createDataFrame(rows, "source string, text string"),
        "source", "text").collect()}
    for ga, gb in [("A", "B"), ("A", "C"), ("B", "C")]:
        inter = len(sets[ga] & sets[gb])
        if inter == 0:
            assert (ga, gb) not in out
            continue
        r = out[(ga, gb)]
        assert (r.n_a, r.n_b, r.n_common) == (
            len(sets[ga]), len(sets[gb]), inter)
        assert r.jaccard == round(
            inter / len(sets[ga] | sets[gb]), 6)


def test_dsir_weights_depend_on_text_not_ids_or_layout(spark):
    from tap_airbyte_wrapper_spark.functions import dsir_logweights

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "xx", "yy", "zz"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.filter(F.col("doc_id") < 15)
    base = dsir_logweights(df, tgt, buckets=256)
    w0 = {r.doc_id: r.logw for r in base.collect()}
    # relabeled ids (order-reversing bijection), shuffled partitioning:
    # the per-text weight must be identical — weights are a pure
    # function of (text, target corpus, pool corpus)
    relabeled = df.withColumn("doc_id", 1000 - F.col("doc_id")) \
        .repartition(7)
    tgt2 = relabeled.filter(F.col("doc_id") > 1000 - 15)
    w1 = {1000 - r.doc_id: r.logw for r in
          dsir_logweights(relabeled, tgt2, buckets=256).collect()}
    assert w0 == w1
