"""Unit tests for functions/corpus.py (vocabulary, repetition,
token-budget packing, contamination) and functions/pii.py (redaction).

The corpus fleet queries additionally run against the DuckDB oracles in
tests/test_oracle_parity.py; these tests pin the semantics on small
hand-built inputs where the expected values are obvious.
"""

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.functions import (
    ngram_contamination,
    pack_token_budget,
    pii_counts,
    redact_pii,
    repetition_signals,
    vocab_topk,
    word_ngrams,
    words,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows)


def test_vocab_topk_counts_and_order(spark):
    df = _docs(spark, [
        Row(doc_id=1, text="a b a c"),
        Row(doc_id=2, text="b a"),
        Row(doc_id=3, text=" C  c "),
    ])
    out = vocab_topk(df, k=2).collect()
    # a: 3 occurrences / 2 docs; c: 3 occurrences / 2 docs (lowercased);
    # tie broken by token asc -> a before c; b (2 occ) cut by k=2.
    assert [(r.token, r.occurrences, r.doc_freq) for r in out] == [
        ("a", 3, 2), ("c", 3, 2)]


def test_word_ngrams_short_text_empty(spark):
    df = spark.createDataFrame([Row(text="one two three"), Row(text="one two")])
    out = df.select(word_ngrams(words(F.col("text")), 3).alias("g")).collect()
    assert out[0].g == ["one two three"]
    assert out[1].g == []


def test_repetition_signals_values(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="x x x y"),
        Row(doc_id=2, text="   "),
    ])
    out = {r.doc_id: r.r.asDict() for r in df.select(
        "doc_id", repetition_signals(F.col("text")).alias("r")).collect()}
    assert out[1] == {"n_tokens": 4, "distinct_ratio": 0.5,
                      "top_word_ratio": 0.75}
    assert out[2]["n_tokens"] == 0
    assert out[2]["distinct_ratio"] is None
    assert out[2]["top_word_ratio"] is None


def test_pack_token_budget_greedy_per_group(spark):
    # quality = n_chars desc; budget 5 tokens per source.
    df = spark.createDataFrame([
        Row(doc_id=1, source="s1", n_chars=30, text="w w w"),      # 3 tok
        Row(doc_id=2, source="s1", n_chars=20, text="w w"),        # cum 5
        Row(doc_id=3, source="s1", n_chars=10, text="w"),          # cum 6 > 5
        Row(doc_id=4, source="s2", n_chars=99, text="w w w w w w"),  # 6 > 5
        Row(doc_id=5, source="s2", n_chars=1, text="w"),           # skipped:
        # greedy prefix, not knapsack — doc4 overflows and blocks the rest
    ])
    kept = {(r.doc_id, r.cum_tokens) for r in
            pack_token_budget(df, budget=5).collect()}
    assert kept == {(1, 3), (2, 5)}


def test_pack_token_budget_two_phase_equals_window(spark, sf_dir):
    """The range-partitioned two-phase cumulative sum must produce the
    exact row set + running totals of the per-group window — on real
    documents with its 2 sources (the few-huge-domains case the
    two-phase path exists for) and at several budgets."""
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    docs = load_parquet(spark, f"{sf_dir}/documents.parquet")
    for budget in (0, 500, 50_000):
        w = {(r.doc_id, r.cum_tokens) for r in pack_token_budget(
            docs, budget=budget, mode="window").collect()}
        t = {(r.doc_id, r.cum_tokens) for r in pack_token_budget(
            docs, budget=budget, mode="two_phase", num_ranges=7).collect()}
        assert t == w, f"budget={budget}: two_phase != window"


def test_pack_token_budget_two_phase_parallelism(spark):
    """Two-phase must spread ONE giant group over num_ranges range
    partitions — the whole point — and still chain the running sum
    across them correctly (every prefix row kept, exact totals)."""
    rows = [Row(doc_id=i, source="only", n_chars=10_000 - i,
                text="w " * (i % 7 + 1)) for i in range(1, 401)]
    df = spark.createDataFrame(rows).repartition(13)
    got = pack_token_budget(
        df, budget=10**9, mode="two_phase", num_ranges=8).collect()
    assert len(got) == 400
    # recompute expected running totals in plain python
    exp, cum = {}, 0
    for r in sorted(rows, key=lambda r: (-r.n_chars, r.doc_id)):
        cum += r.doc_id % 7 + 1
        exp[r.doc_id] = cum
    assert {r.doc_id: r.cum_tokens for r in got} == exp


def test_pack_token_budget_auto_routes_and_rejects(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [Row(doc_id=1, source="s", n_chars=1, text="w")])
    # auto on a 1-group frame routes two_phase and still answers
    assert pack_token_budget(df, budget=5, mode="auto").count() == 1
    with _pytest.raises(ValueError, match="unknown mode"):
        pack_token_budget(df, budget=5, mode="bogus")


def test_ngram_contamination_planted_overlap(spark):
    corpus = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta epsilon"),
        Row(doc_id=2, text="nothing shared here at all"),
    ])
    bench = spark.createDataFrame([
        Row(doc_id=100, text="x alpha beta gamma delta y"),
    ])
    out = {r.doc_id: r.n_hit_grams for r in
           ngram_contamination(corpus, bench, n=4).collect()}
    # doc1 shares exactly one distinct 4-gram: "alpha beta gamma delta"
    assert out == {1: 1}


def test_ngram_contamination_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    bench = spark.createDataFrame([Row(doc_id=2, text="a b c d")])
    plan = ngram_contamination(corpus, bench, n=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------- PII


PII_DOC = ("contact jane.doe+spam@example.co.uk or call 555-867-5309, "
           "server 10.0.255.1, account 123456789012, order #1234567")


def test_redact_pii_all_types(spark):
    df = spark.createDataFrame([Row(text=PII_DOC)])
    red = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert "<EMAIL>" in red and "jane.doe" not in red
    assert "<PHONE>" in red and "867-5309" not in red
    assert "<IP>" in red and "10.0.255.1" not in red
    assert "<ID>" in red and "123456789012" not in red
    # 7-digit order number is below the 8-digit id threshold and no
    # phone separator pattern -> untouched
    assert "#1234567" in red


def test_pii_counts_agree_with_redaction(spark):
    df = spark.createDataFrame([Row(text=PII_DOC), Row(text="clean text")])
    rows = df.select(pii_counts(F.col("text")).alias("c")).collect()
    assert rows[0].c.asDict() == {
        "n_email": 1, "n_ipv4": 1, "n_phone": 1, "n_id_number": 1}
    assert rows[1].c.asDict() == {
        "n_email": 0, "n_ipv4": 0, "n_phone": 0, "n_id_number": 0}


def test_pii_email_digits_not_double_counted(spark):
    # digits inside an email must not also count as an id-number
    df = spark.createDataFrame([Row(text="mail 12345678901@example.com now")])
    c = df.select(pii_counts(F.col("text")).alias("c")).first().c
    assert c.asDict() == {
        "n_email": 1, "n_ipv4": 0, "n_phone": 0, "n_id_number": 0}


def test_tfidf_shared_terms_score_zero(spark):
    from tap_airbyte_wrapper_spark.functions import tfidf_top_terms

    df = spark.createDataFrame(
        [("s1", "common alpha alpha"), ("s2", "common beta")],
        "source string, text string")
    rows = tfidf_top_terms(df, "source", "text", k=10).collect()
    scores = {(r.source, r.term): r.tfidf for r in rows}
    # 'common' appears in every group -> idf ln(1) = 0
    assert scores[("s1", "common")] == 0.0
    assert scores[("s2", "common")] == 0.0
    # group-specific terms outrank shared ones; tf multiplies in
    assert scores[("s1", "alpha")] > scores[("s1", "common")]
    assert scores[("s1", "alpha")] == round(2 * __import__("math").log(2), 6)


def test_mixture_sample_deterministic_and_rate(spark, sf_dir):
    from tap_airbyte_wrapper_spark.functions import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept1 = {r.doc_id for r in mixture_sample(
        docs, {"src0": 1.0}, default_rate=0.25).select("doc_id").collect()}
    kept2 = {r.doc_id for r in mixture_sample(
        docs.repartition(13), {"src0": 1.0},
        default_rate=0.25).select("doc_id").collect()}
    assert kept1 == kept2, "membership must not depend on partitioning"
    n_src0 = docs.filter("source = 'src0'").count()
    assert len([1 for r in docs.select("doc_id", "source").collect()
                if r.source == "src0" and r.doc_id in kept1]) == n_src0
    other = docs.filter("source != 'src0'").count()
    frac = (len(kept1) - n_src0) / other
    assert 0.1 < frac < 0.45, f"default rate 0.25 sampled {frac}"


def test_chunk_documents_windows(spark):
    from tap_airbyte_wrapper_spark.functions import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(300))),
         (2, "short doc"), (3, ""), (4, None)],
        "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=128, overlap=16)
    rows = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"])
                  for r in out.collect())
    # 300 tokens, stride 112 -> starts 0,112,224 (283 > 300-17=283? no: <=283)
    assert [r for r in rows if r[0] == 1] == [(1, 0, 128), (1, 1, 128), (1, 2, 76)]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 2)]
    assert not [r for r in rows if r[0] in (3, 4)]
    # every token covered, overlap reproduced
    chunks = {r["chunk_id"]: r["chunk_text"].split()
              for r in out.filter("doc_id = 1").collect()}
    assert chunks[0][-16:] == chunks[1][:16]
    assert [w for c in (0, 1, 2) for w in chunks[c][(16 if c else 0):]] \
        == [f"w{i}" for i in range(300)]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from tap_airbyte_wrapper_spark.functions import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_sample_per_group_exact_k_and_stable(spark):
    from tap_airbyte_wrapper_spark.functions import sample_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "tiny") for i in range(100)],
        "doc_id int, g string")
    out = sample_per_group(df, "g", "doc_id", k=10)
    got = {r["g"]: r["doc_id"] for r in out.collect()}  # last wins, count below
    counts = {g: 0 for g in ("big", "tiny")}
    ids = set()
    for r in out.collect():
        counts[r["g"]] += 1
        ids.add(r["doc_id"])
    assert counts == {"big": 10, "tiny": 10}
    # deterministic under reshuffling and salt-sensitive
    again = {r["doc_id"] for r in
             sample_per_group(df.repartition(7), "g", "doc_id", k=10).collect()}
    assert again == ids
    other = {r["doc_id"] for r in
             sample_per_group(df, "g", "doc_id", k=10, salt="x").collect()}
    assert other != ids


def test_luhn_valid_known_pans(spark):
    from tap_airbyte_wrapper_spark.functions.pii import luhn_valid

    cases = [
        ("4111111111111111", True),    # Visa test PAN
        ("4111 1111 1111 1111", True),  # separators ignored
        ("5500-0055-5555-5559", True),  # MC test PAN, dashes
        ("4111111111111112", False),    # corrupted check digit
        ("123456789012345", False),     # random 15-digit run
        ("41111111111", False),         # 11 digits: below PAN length
        ("", False),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r.v for r in
           df.select(luhn_valid(F.col("text")).alias("v")).collect()]
    assert got == [want for _, want in cases]


def test_redact_cards_only_valid_runs(spark):
    from tap_airbyte_wrapper_spark.functions.pii import redact_cards

    text = ("pay 4111 1111 1111 1111 or 5500-0055-5555-5559, "
            "but order 4111 1111 1111 1112 and id 123456789 stay")
    red = spark.createDataFrame([Row(text=text)]).select(
        redact_cards(F.col("text")).alias("t")).first().t
    assert red.count("<CARD>") == 2
    assert "4111 1111 1111 1112" in red   # Luhn-invalid: untouched
    assert "123456789" in red             # too short: untouched
    assert "4111 1111 1111 1111" not in red


def test_redact_cards_before_redact_pii_composes(spark):
    from tap_airbyte_wrapper_spark.functions.pii import redact_cards

    text = "card 4111111111111111 acct 123456789012"
    out = spark.createDataFrame([Row(text=text)]).select(
        redact_pii(redact_cards(F.col("text"))).alias("t")).first().t
    # card validated+redacted first; leftover long run becomes <ID>
    assert "<CARD>" in out and "<ID>" in out
    assert "4111111111111111" not in out and "123456789012" not in out
