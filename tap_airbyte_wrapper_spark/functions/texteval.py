"""Text-generation evaluation metrics: corpus BLEU and ROUGE-N recall.

The eval-suite counterpart of the IR metrics in
:mod:`~.retrieval` (``rank_eval`` scores retrieval; this scores
GENERATION against references) — the "did the new model/prompt/decode
setting change output quality?" gate, runnable over millions of
(candidate, reference) pairs because everything is relational:
per-(row, gram) counts, an equi-join for clipped matches, partial-agg
sums.  No per-row quadratic array scans, no UDFs.

Public-knowledge formulas: BLEU with the brevity penalty exactly as
Papineni et al. 2002 (corpus-level: clipped n-gram matches and totals
SUM over the corpus before the ratio — not a mean of sentence scores);
ROUGE-N recall as Lin 2004 (same clipped matches over reference
totals).  Tokenization is the house whitespace tokenizer
(:func:`~.corpus.words`), so scores are comparable with every other
text operator here and mirrorable in the SQL oracles.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .corpus import word_ngrams, words

__all__ = ["bleu_rouge_corpus", "bleu_rouge_per_doc",
           "rouge_l_per_doc"]


def _tagged_sided(cand_col: str, cand_side: int,
                  ref_col: str, ref_side: int, max_n: int):
    """One explode of BOTH texts' grams at every order, each element a
    ``(n, g, s)`` struct tagging its order and side — the single-pass
    feed for the side-conditional gram aggregate (round 14).  The
    order/side tags are closed over via a factory: a two-param lambda
    (the ``lambda g, n=n`` idiom) makes PySpark pass the ARRAY INDEX
    as the second argument, silently shadowing the closed-over
    value."""
    def _tag(order, side):
        return lambda g: F.struct(F.lit(order).alias("n"),
                                  g.alias("g"),
                                  F.lit(side).alias("s"))

    parts = [
        F.transform(word_ngrams(F.col(col_name), n), _tag(n, side))
        for col_name, side in ((cand_col, cand_side),
                               (ref_col, ref_side))
        for n in range(1, max_n + 1)
    ]
    return F.explode(F.flatten(F.array(*parts))).alias("b")


def bleu_rouge_corpus(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (up to ``max_n``-grams, uniform weights,
    brevity penalty) plus ROUGE-1/2 recall for (candidate, reference)
    text pairs — ONE row out.

    Corpus BLEU, not averaged sentence BLEU: clipped matches and
    candidate totals sum over all pairs first (Papineni et al. 2002's
    definition — sentence-averaging over-rewards short degenerate
    outputs).  No smoothing: a zero clipped count at any order makes
    ``bleu = 0`` (stated; at eval-corpus sizes a zero 4-gram overlap
    IS the signal).  ``bp = exp(min(0, 1 - r/c))`` with ``r``/``c``
    the summed reference/candidate token lengths.

    Plan: both sides tokenize once into a checkpointed projection;
    ALL orders explode together as (n, gram)-tagged rows (map-side
    combined into per-(row, n, gram) counts), clipped matches are
    ``min`` over one (row, n, gram) equi-join, and the per-order sums
    reduce to max_n-row tables collected driver-side where the
    closed-form BLEU evaluates in libm doubles (mirrored in the SQL
    oracle).  Output: ONE row
    ``(n_pairs, p1..p{max_n}, rouge1_r, rouge2_r, bp, bleu)``."""
    if not 1 <= max_n <= 8:
        raise ValueError(f"max_n must be in 1..8, got {max_n}")
    spark = df.sparkSession
    # a single-file eval set arrives as ONE partition and the
    # checkpoint pins that layout — every downstream gram pass would
    # run single-threaded (measured 8 s vs ~1.5 s at sf0.1); fan out
    # ONLY when the input is narrower than the cluster, so a
    # well-partitioned corpus never pays a raw-text shuffle
    par = spark.sparkContext.defaultParallelism
    src = df if df.rdd.getNumPartitions() >= par \
        else df.repartition(par)
    base = (src.filter(F.col(cand_col).isNotNull()
                       & F.col(ref_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    words(F.col(cand_col)).alias("__wc"),
                    words(F.col(ref_col)).alias("__wr"))
            .localCheckpoint(eager=True))
    # plain count on the checkpointed base — c_len/r_len are exactly
    # the unigram totals ct[1]/rt[1] the merged gram aggregate below
    # already produces (sum of per-doc token counts, the same
    # integers), so the old 3-column agg pass is redundant (round 14)
    n_pairs = base.count()
    if n_pairs == 0:
        cols = ", ".join(
            f"CAST(NULL AS DOUBLE) AS p{n}" for n in range(1, max_n + 1))
        return spark.sql(
            f"SELECT CAST(0 AS BIGINT) AS n_pairs, {cols}, "
            "CAST(NULL AS DOUBLE) AS rouge1_r, "
            "CAST(NULL AS DOUBLE) AS rouge2_r, "
            "CAST(NULL AS DOUBLE) AS bp, "
            "CAST(NULL AS DOUBLE) AS bleu")

    # ALL orders in one tagged-gram pass (an (n, gram) struct per
    # gram, flattened) instead of per-order job chains: 3 jobs total
    # rather than ~3 per order (measured 8.2 -> ~2 s at sf0.1)
    # grams travel as xxhash64 longs, not strings (the contamination
    # idiom: 8 bytes/gram through the shuffle and an integer join;
    # a within-(pair, order) collision merges two gram counts with
    # probability ~ grams^2/2^64 per document — vanishing).
    # ONE side-tagged gram pass and ONE aggregate chain (round 14,
    # second step; the first step had already fused the old
    # clip-join + two total passes into a full-outer-join aggregate):
    # per (pair, order, gram) the side-conditional sums reproduce the
    # outer join's rows exactly — one-sided grams carry a NULL for the
    # absent side (sum over an empty WHEN set), so the clip coalesce
    # and the ct/rt sums see the identical integers — with one
    # gram-scale exchange instead of two plus a co-partitioned
    # sort-merge join, and one scan of the checkpointed base instead
    # of two.  The frozen SQL oracle is untouched.
    allg = (base.select("__id",
                        _tagged_sided("__wc", 0, "__wr", 1, max_n))
            .select("__id", F.col("b.n").alias("n"),
                    F.xxhash64("b.g").alias("gh"),
                    F.col("b.s").alias("s")))
    tot = (allg.groupBy("__id", "n", "gh")
           .agg(F.sum(F.when(F.col("s") == 0, 1)).alias("cc"),
                F.sum(F.when(F.col("s") == 1, 1)).alias("rc"))
           .groupBy("n")
           .agg(F.sum(F.least(F.coalesce("cc", F.lit(0)),
                              F.coalesce("rc", F.lit(0))))
                .alias("clip"),
                F.sum("cc").alias("ct"),
                F.sum("rc").alias("rt"))
           .collect())
    clip = {int(r["n"]): int(r["clip"] or 0) for r in tot}
    ct = {int(r["n"]): int(r["ct"] or 0) for r in tot}
    rt = {int(r["n"]): int(r["rt"] or 0) for r in tot}
    stats: dict[int, tuple[int, int, int]] = {
        n: (clip.get(n, 0), ct.get(n, 0), rt.get(n, 0))
        for n in range(1, max_n + 1)}
    # summed token lengths ARE the unigram totals (identical integers
    # to the old sum(size(..)) pass — every token is one unigram)
    c_len, r_len = ct.get(1, 0), rt.get(1, 0)
    ps = {n: (stats[n][0] / stats[n][1] if stats[n][1] > 0 else None)
          for n in stats}
    bp = (math.exp(min(0.0, 1.0 - r_len / c_len))
          if c_len > 0 else None)
    usable = [ps[n] for n in range(1, max_n + 1)]
    if bp is None or any(p is None for p in usable):
        bleu = None
    elif any(p == 0.0 for p in usable):
        bleu = 0.0
    else:
        bleu = bp * math.exp(
            sum(math.log(p) for p in usable) / max_n)
    r1 = (stats[1][0] / stats[1][2] if stats[1][2] > 0 else None)
    r2 = (stats[2][0] / stats[2][2]
          if max_n >= 2 and stats[2][2] > 0 else None)

    def _d(x):
        return ("CAST(NULL AS DOUBLE)" if x is None
                else f"round(CAST({x!r} AS DOUBLE), 6)")

    pcols = ", ".join(f"{_d(ps[n])} AS p{n}"
                      for n in range(1, max_n + 1))
    return spark.sql(
        f"SELECT CAST({n_pairs} AS BIGINT) AS n_pairs, {pcols}, "
        f"{_d(r1)} AS rouge1_r, {_d(r2)} AS rouge2_r, "
        f"{_d(bp)} AS bp, {_d(bleu)} AS bleu")


def bleu_rouge_per_doc(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Per-document sentence BLEU + ROUGE-1/2 recall — the drill-down
    companion of :func:`bleu_rouge_corpus`: the corpus row says
    WHETHER generation quality moved; this one says WHERE, one row per
    (candidate, reference) pair, ready for slice/fairness grouping
    with the existing grouped-metrics patterns ("BLEU dropped — on
    which language/domain/length bucket?").

    Same definition per document as the corpus op applies globally
    (clipped matches / totals / brevity penalty over the single pair;
    on a 1-document corpus the two agree exactly — pinned), same
    no-smoothing contract: a zero clipped count at any order makes
    that document's ``bleu = 0``, and a candidate with fewer than
    ``max_n`` tokens has an undefined order (``p_n`` null ⇒ ``bleu``
    null — at sentence granularity that is common and IS the reason
    corpus BLEU sums before dividing; stated).

    Plan: the SAME tagged-gram pass as the corpus op (one explode for
    all orders, xxhash64 gram keys, per-(doc, n, gram) counts), then
    ``groupBy(doc)`` with 3·max_n conditional sums instead of global
    sums — the closed form evaluates as Spark column expressions, so
    NOTHING collects; output is one row per pair, computed where the
    data lives.  Output: ``(<id_col>, c_len, r_len, p1..p{max_n},
    rouge1_r, rouge2_r, bp, bleu)``."""
    if not 1 <= max_n <= 8:
        raise ValueError(f"max_n must be in 1..8, got {max_n}")
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    src = df if df.rdd.getNumPartitions() >= par \
        else df.repartition(par)
    base = (src.filter(F.col(cand_col).isNotNull()
                       & F.col(ref_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    words(F.col(cand_col)).alias("__wc"),
                    words(F.col(ref_col)).alias("__wr"))
            .localCheckpoint(eager=True))

    # BOTH sides in ONE side-tagged gram pass and ONE aggregate
    # (round 14): per (doc, order, gram) the conditional sums produce
    # exactly the rows the old cand-side/ref-side aggregate pair fed
    # through a full-outer join — a gram present only in the candidate
    # yields (cc, rc=NULL) just as the outer join did (sum over an
    # empty WHEN set is NULL), so clip/ct/rt below are the identical
    # integers with one gram-scale exchange instead of two plus a
    # co-partitioned sort-merge join.  least() SKIPS nulls (it returns
    # the smallest non-null argument), so one-sided rows must coalesce
    # to 0 first or every cand-only gram would count itself as clipped.
    allg = (base.select("__id",
                        _tagged_sided("__wc", 0, "__wr", 1, max_n))
            .select("__id", F.col("b.n").alias("n"),
                    F.xxhash64("b.g").alias("gh"),
                    F.col("b.s").alias("s")))
    cnt = (allg.groupBy("__id", "n", "gh")
           .agg(F.sum(F.when(F.col("s") == 0, 1)).alias("cc"),
                F.sum(F.when(F.col("s") == 1, 1)).alias("rc")))
    per_ng = (cnt
              .groupBy("__id", "n")
              .agg(F.sum(F.least(F.coalesce("cc", F.lit(0)),
                                 F.coalesce("rc", F.lit(0))))
                   .alias("clip"),
                   F.sum("cc").alias("ct"),
                   F.sum("rc").alias("rt")))
    aggs = []
    for n in range(1, max_n + 1):
        aggs += [
            F.coalesce(F.sum(F.when(F.col("n") == n, F.col("clip"))),
                       F.lit(0)).alias(f"__clip{n}"),
            F.coalesce(F.sum(F.when(F.col("n") == n, F.col("ct"))),
                       F.lit(0)).alias(f"__ct{n}"),
            F.coalesce(F.sum(F.when(F.col("n") == n, F.col("rt"))),
                       F.lit(0)).alias(f"__rt{n}"),
        ]
    stats = per_ng.groupBy("__id").agg(*aggs)
    lens = base.select("__id",
                       F.size("__wc").alias("c_len"),
                       F.size("__wr").alias("r_len"))
    # LEFT join: a pair whose both texts tokenize to zero grams has no
    # per_ng rows at all — it must still emit its (null-metric) row
    out = lens.join(stats, "__id", "left")
    p = {n: F.when(F.col(f"__ct{n}") > 0,
                   F.col(f"__clip{n}") / F.col(f"__ct{n}"))
         for n in range(1, max_n + 1)}
    bp = F.when(F.col("c_len") > 0,
                F.exp(F.least(F.lit(0.0),
                              1.0 - F.col("r_len") / F.col("c_len"))))
    any_null = p[1].isNull()
    any_zero = p[1] == 0.0
    for n in range(2, max_n + 1):
        any_null = any_null | p[n].isNull()
        any_zero = any_zero | (p[n] == 0.0)
    logsum = sum((F.log(p[n]) for n in range(2, max_n + 1)),
                 F.log(p[1]))
    bleu = (F.when(bp.isNull() | any_null, F.lit(None))
            .when(any_zero, F.lit(0.0))
            .otherwise(bp * F.exp(logsum / max_n)))
    r1 = F.when(F.col("__rt1") > 0, F.col("__clip1") / F.col("__rt1"))
    r2 = (F.when(F.col("__rt2") > 0,
                 F.col("__clip2") / F.col("__rt2"))
          if max_n >= 2 else F.lit(None).cast("double"))
    return out.select(
        F.col("__id").alias(id_col),
        F.col("c_len").cast("long").alias("c_len"),
        F.col("r_len").cast("long").alias("r_len"),
        *[F.round(p[n], 6).alias(f"p{n}")
          for n in range(1, max_n + 1)],
        F.round(r1, 6).alias("rouge1_r"),
        F.round(r2, 6).alias("rouge2_r"),
        F.round(bp, 6).alias("bp"),
        F.round(bleu, 6).alias("bleu"))


def rouge_l_per_doc(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_tokens: int = 4096,
) -> DataFrame:
    """Per-document ROUGE-L (Lin 2004 §3: longest common SUBSEQUENCE,
    not substring) — the order-sensitive member of the generation-eval
    family: ROUGE-N credits any bag-of-grams overlap; ROUGE-L only
    credits tokens appearing in the SAME ORDER, so a shuffled
    paraphrase scores high on ROUGE-1 and low here.  ``R = LCS/m``,
    ``P = LCS/n``, ``F = 2RP/(R+P)`` (beta=1).

    LCS is inherently a per-pair dynamic program — no relational
    decomposition exists (stated; this is the module's one honest
    non-relational op).  The kernel is the Allison-Dix (1986)
    bit-parallel row recurrence: per reference token one
    add/or/and-not over an m-bit Python integer, so a pair costs
    O(n * m / 64) word ops instead of the textbook O(n * m) cell DP
    (~64x; a 1k x 1k pair is ~16k word ops).  Arrow-batched pandas
    UDF over the token arrays; everything around it (tokenize,
    lengths, metrics) stays in column expressions.

    Sequences longer than ``max_tokens`` are TRUNCATED to their first
    ``max_tokens`` tokens and flagged in the ``truncated`` column —
    a visible degradation, not a silent one (per-row refusal would
    fail the whole job on one pathological document).  Output:
    ``(<id_col>, c_len, r_len, lcs, rouge_l_p, rouge_l_r, rouge_l_f,
    truncated)``; metrics null when either side tokenizes empty."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    src = df if df.rdd.getNumPartitions() >= par \
        else df.repartition(par)

    @pandas_udf("long")
    def lcs_len(cand: pd.Series, ref: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(cand, ref):
            if a is None or b is None:
                out.append(None)
                continue
            a, b = list(a[:max_tokens]), list(b[:max_tokens])
            if not a or not b:
                out.append(0)
                continue
            # Allison-Dix bit-string LCS: masks over candidate
            # positions, one integer recurrence per reference token
            masks: dict[str, int] = {}
            for i, tok in enumerate(a):
                masks[tok] = masks.get(tok, 0) | (1 << i)
            row = 0
            for tok in b:
                x = row | masks.get(tok, 0)
                row = x & ~(x - ((row << 1) | 1))
            out.append(row.bit_count())
        return pd.Series(out, dtype="object").astype("Int64")

    base = (src.filter(F.col(cand_col).isNotNull()
                       & F.col(ref_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    words(F.col(cand_col)).alias("__wc"),
                    words(F.col(ref_col)).alias("__wr")))
    scored = base.select(
        "__id",
        F.size("__wc").alias("__cl"), F.size("__wr").alias("__rl"),
        lcs_len(F.col("__wc"), F.col("__wr")).alias("__lcs"))
    cl = F.least(F.col("__cl"), F.lit(max_tokens)).cast("double")
    rl = F.least(F.col("__rl"), F.lit(max_tokens)).cast("double")
    p = F.when(cl > 0, F.col("__lcs") / cl)
    r = F.when(rl > 0, F.col("__lcs") / rl)
    f = F.when((p + r) > 0, 2 * p * r / (p + r)) \
        .otherwise(F.when(p.isNotNull() & r.isNotNull(), F.lit(0.0)))
    return scored.select(
        F.col("__id").alias(id_col),
        F.col("__cl").cast("long").alias("c_len"),
        F.col("__rl").cast("long").alias("r_len"),
        F.col("__lcs").alias("lcs"),
        F.round(p, 6).alias("rouge_l_p"),
        F.round(r, 6).alias("rouge_l_r"),
        F.round(f, 6).alias("rouge_l_f"),
        ((F.col("__cl") > max_tokens) | (F.col("__rl") > max_tokens))
        .alias("truncated"))
