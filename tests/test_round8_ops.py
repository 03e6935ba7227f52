"""Round-8 operator contracts: df-ordered asymmetric prefix filtering
for containment_pairs (the round-7 scale-killer fix) and persisted-index
delete/replace maintenance."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---------------------------------------------------------------------
# containment_prefix_candidates: bounded on boilerplate, total recall
# ---------------------------------------------------------------------

def _boilerplate_corpus(spark, n_docs=60):
    """Every doc shares one boilerplate phrase (a license-header stand-in
    whose shingles have df == n_docs) plus ~20 unique-content words; doc
    100000 is doc 0's lead quoted verbatim (containment 1.0)."""
    boiler = "all rights reserved by the original author"
    rows = []
    for i in range(n_docs):
        uniq = " ".join(f"u{i}w{j}" for j in range(20))
        rows.append((i, uniq + " " + boiler))
    quote = " ".join(f"u0w{j}" for j in range(10))
    rows.append((100000, quote))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_candidates_bounded_on_universal_shingle(spark):
    """The round-7 scale-killer: a near-universal boilerplate shingle
    (df == n) made the naive full-posting self-join emit ~n^2/2
    candidate rows from that single posting list.  Under the df-ASC
    prefix order the boilerplate shingles sort LAST in every doc and
    never enter a prefix, so candidates stay near-zero — while the
    planted quoted-lead pair (total-recall contract) is still found."""
    from tap_airbyte_wrapper_spark.functions import (
        containment_pairs, containment_prefix_candidates)

    n = 60
    df = _boilerplate_corpus(spark, n)
    cand = containment_prefix_candidates(
        df, "doc_id", "text", n=3, threshold=0.8)
    rows = cand.collect()
    # naive: the df=n boilerplate posting alone yields n*(n-1)/2 = 1770
    assert len(rows) < n          # bounded: no quadratic blowup
    assert (0, 100000) in {(r.id_a, r.id_b) for r in rows}  # recall

    out = {(r.id_a, r.id_b): r for r in containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.8).collect()}
    assert out[(0, 100000)].cont_b_in_a == pytest.approx(1.0)


def test_containment_pairs_equals_bruteforce(spark):
    """Exact-recall check of the prefix-filtered formulation against a
    Python brute force over all pairs, on a random corpus with heavy
    shingle sharing (small vocabulary) — covers the float-ceil boundary
    (t*|S| exactly integer) and the either-direction OR contract."""
    from tap_airbyte_wrapper_spark.functions import containment_pairs

    rng = random.Random(81)
    vocab = [f"t{k}" for k in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 14))))
            for i in range(40)]

    def sh_set(text):
        w = text.lower().split()
        if len(w) >= 3:
            return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
        return {" ".join(w)}

    t = 0.5
    expected = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            sa, sb = sh_set(ta), sh_set(tb)
            c = len(sa & sb)
            if c / len(sa) >= t or c / len(sb) >= t:
                expected[(ia, ib)] = (c / len(sa), c / len(sb))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
           for r in containment_pairs(
               df, "doc_id", "text", n=3, threshold=t).collect()}
    assert set(got) == set(expected)
    for k, (ea, eb) in expected.items():
        assert got[k][0] == pytest.approx(ea)
        assert got[k][1] == pytest.approx(eb)


def test_containment_blocking_cols_still_partition_pairs(spark):
    """Blocking keys restrict candidate generation to same-block pairs
    under the prefix-filtered path too."""
    from tap_airbyte_wrapper_spark.functions import containment_pairs

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, "en", text), (2, "en", text + " extra tail words here"),
         (3, "de", text)],  # same text, other block: must NOT pair
        "doc_id long, lang string, text string")
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9,
                            blocking_cols=["lang"])
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}
