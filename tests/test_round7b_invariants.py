"""Randomized invariant checks for the round-7 second/third-batch
operators: one seeded random dataset per test, invariants asserted
against a pure-python reference — the DataFrame-level complement to
hypothesis (which would pay a Spark job per drawn example)."""

import math
import random
import string

import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.functions import (
    bottomk_sample,
    calibration_bins,
    hard_negatives,
    ngram_diversity,
    roc_auc,
    threshold_metrics,
    vocab_coverage,
)


def test_roc_auc_matches_python_reference_on_random_data(spark):
    rng = random.Random(11)
    rows = [(round(rng.random(), 2), rng.randint(0, 1))  # 2dp -> many ties
            for _ in range(300)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = roc_auc(df, "score", "label").collect()[0]

    pos = sorted(s for s, l in rows if l == 1)
    neg = sorted(s for s, l in rows if l == 0)
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    want = num / (len(pos) * len(neg))
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert got.auc == pytest.approx(round(want, 6), abs=2e-6)


def test_roc_auc_invariance_under_monotone_transform(spark):
    rng = random.Random(13)
    rows = [(rng.random() * 10, rng.randint(0, 1)) for _ in range(200)]
    df = spark.createDataFrame(rows, "score double, label int")
    base = roc_auc(df, "score", "label").collect()[0].auc
    mono = df.select(
        (F.exp(F.col("score") / 10)).alias("score"), "label")
    assert roc_auc(mono, "score", "label").collect()[0].auc == base


def test_threshold_metrics_matches_python_reference(spark):
    rng = random.Random(17)
    rows = [(round(rng.random(), 3), rng.randint(0, 1))
            for _ in range(250)]
    df = spark.createDataFrame(rows, "score double, label int")
    ts = (0.25, 0.5, 0.75)
    got = {r.threshold: r for r in
           threshold_metrics(df, "score", "label", ts).collect()}
    for t in ts:
        tp = sum(1 for s, l in rows if s >= t and l == 1)
        fp = sum(1 for s, l in rows if s >= t and l == 0)
        fn = sum(1 for s, l in rows if s < t and l == 1)
        tn = sum(1 for s, l in rows if s < t and l == 0)
        r = got[t]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        # the confusion square always partitions the input
        assert tp + fp + fn + tn == len(rows)
        if tp + fp:
            assert r.precision == pytest.approx(round(tp / (tp + fp), 6))


def test_calibration_bins_partition_and_brier(spark):
    rng = random.Random(19)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "score double, label int")
    bins = calibration_bins(df, "score", "label", n_bins=8).collect()
    # bins partition the rows; per-bin scores stay inside their bin
    assert sum(r.n for r in bins) == len(rows)
    for r in bins:
        lo, hi = r.bin / 8, (r.bin + 1) / 8
        assert lo - 1e-9 <= r.mean_score <= (hi + 1e-9 if r.bin < 7
                                             else 1.0 + 1e-9)
        assert 0.0 <= r.frac_pos <= 1.0
    brier = sum(r.sse for r in bins) / sum(r.n for r in bins)
    want = sum((s - l) ** 2 for s, l in rows) / len(rows)
    assert brier == pytest.approx(want, abs=1e-5)


def test_bottomk_sample_is_uniform_ish(spark):
    # over many disjoint salts, each row's inclusion frequency should
    # hover near k/N — a seeded sanity bound, not a statistical test
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    hits = {i: 0 for i in range(100)}
    for salt in map(str, range(30)):
        for r in bottomk_sample(df, "doc_id", k=20, salt=salt).collect():
            hits[r.doc_id] += 1
    freqs = sorted(hits.values())
    # expectation 6 of 30; allow a generous band
    assert freqs[0] >= 0 and freqs[-1] <= 18
    assert sum(freqs) == 30 * 20


def test_hard_negatives_never_leaks_same_label_random(spark):
    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], rng.randint(0, 2))
            for i in range(80)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    labels = {i: lab for i, _, lab in rows}
    out = hard_negatives(
        df, df.filter(F.col("vec_id") < 5), k=7).collect()
    assert len(out) == 5 * 7
    for r in out:
        assert labels[r.vec_id] != labels[r.query_id]
        assert r.vec_id != r.query_id
    # semi-hard is a SUBSET of hard candidates below the positive max
    semi = hard_negatives(
        df, df.filter(F.col("vec_id") < 5), k=1000,
        mode="semi_hard", margin=0.5).collect()
    for r in semi:
        assert labels[r.vec_id] != labels[r.query_id]
        assert r.pos_sim - 0.5 <= r.cos_sim < r.pos_sim


def test_ngram_diversity_bounds_random(spark):
    rng = random.Random(29)
    vocab = [f"w{j}" for j in range(30)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 40))),
             rng.choice(["a", "b"])) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for r in ngram_diversity(df, by="source", n=2).collect():
        assert 1 <= r.distinct_grams <= r.total_grams
        assert 0 < r.diversity <= 1.0
        assert 0 <= r.singleton_frac <= 1.0
        assert r.diversity == pytest.approx(
            round(r.distinct_grams / r.total_grams, 6))


def test_vocab_coverage_totals_match_token_counts(spark):
    rng = random.Random(31)
    vocab_words = [f"w{j}" for j in range(20)]
    oov_words = [f"x{j}" for j in range(20)]
    rows = []
    truth = {}
    for i in range(60):
        n_in = rng.randint(0, 10)
        n_out = rng.randint(0, 10)
        toks = ([rng.choice(vocab_words) for _ in range(n_in)]
                + [rng.choice(oov_words) for _ in range(n_out)])
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
        truth[i] = (n_in + n_out, n_out)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = spark.createDataFrame([(w,) for w in vocab_words], "token string")
    for r in vocab_coverage(df, vocab).collect():
        n_tok, n_oov = truth[r.doc_id]
        assert (r.n_tok, r.n_oov) == (n_tok, n_oov)
        if n_tok:
            assert r.oov_rate == pytest.approx(round(n_oov / n_tok, 6))
