"""N-gram language-model quality filtering (CCNet-style perplexity
gates, Wenzek et al. 2019 "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data").

The production recipe scores every document with a small LM trained on
a trusted corpus and keeps the low-perplexity band; here both halves
are distributed Spark plans:

- :func:`train_bigram_lm` — ONE tokenize pass over the training corpus
  produces unigram and bigram count tables (token-keyed groupBy with
  map-side partial combine; the shuffle carries one row per distinct
  gram per map partition, never per occurrence).
- :func:`score_perplexity` — per-token interpolated bigram/unigram
  negative log-likelihood, aggregated to a per-doc average.  The model
  tables join back to the exploded corpus on the token key; with
  ``max_vocab``/``max_bigrams`` caps the model is bounded and the joins
  broadcast, making scoring a ZERO-SHUFFLE map-side pass over the
  corpus (plus the per-doc rollup) — the shape that matters at 100 TB,
  where the corpus must stream past a fixed-size model.
- :func:`perplexity_filter` — the head/middle/tail band gate.

Model definition (additive smoothing, linear interpolation):

    p_uni(w)      = (c(w) + a) / (T + a * (V + 1))
    p_big(w2|w1)  = (c(w1 w2) + a) / (c(w1) + a * (V + 1))
    p(w_i | w_{i-1}) = lam * p_big + (1 - lam) * p_uni   (i >= 2)
    p(w_1)        = p_uni(w_1)
    avg_nll(doc)  = -mean_i ln p(w_i | ...)

The ``+ 1`` in the denominator reserves one smoothed slot for unseen
tokens, so OOV scoring is well-defined when the model is vocab-capped.

Oracle determinism: probabilities are pure +,*,/ over doubles (IEEE
correctly-rounded, so bit-identical across engines — the ``ln`` input
is the same everywhere); only the transcendental itself may differ by
1 ulp between libm implementations, which the 6-decimal per-token
round absorbs except within ~5e-7 of a rounding boundary.  No
pre-``ln`` rounding: truncating tiny probabilities would turn the
smoothed OOV floor into log(0) -> NULL on corpora past ~2e7 tokens
and silently drop exactly the gibberish tokens the gate exists to
punish.

The reference has no analytics surface at all (SURVEY.md §2.3) — this
extends the curation layer next to ``functions/corpus.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .corpus import words

__all__ = ["BigramLM", "train_bigram_lm", "score_perplexity",
           "perplexity_filter", "perplexity_buckets", "merge_bigram_lm", "save_bigram_lm",
           "load_bigram_lm"]


@dataclass
class BigramLM:
    """Distributed bigram LM: count tables + scalar totals.

    ``unigrams``: (tok, c_uni); ``bigrams``: (w1, w2, c_big);
    ``total_tokens``/``vocab_size`` are computed once at train time
    (two scalars — the only driver-side values).  ``uni_capped`` /
    ``big_capped`` record PER TABLE whether a cap bounded it — each
    decides that table's join strategy at scoring time (a capped
    table broadcasts; an uncapped one must not: ``max_bigrams`` alone
    leaves the unigram table corpus-vocabulary-sized).
    """

    unigrams: DataFrame
    bigrams: DataFrame
    total_tokens: int
    vocab_size: int
    add_k: float
    uni_capped: bool
    big_capped: bool

    @property
    def capped(self) -> bool:
        return self.uni_capped or self.big_capped


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), words(F.col(text_col)).alias("__ws"))


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    add_k: float = 0.1,
    max_vocab: int | None = None,
    max_bigrams: int | None = None,
) -> BigramLM:
    """Count tables for the interpolated bigram LM.

    ``max_vocab``/``max_bigrams`` keep the model broadcastable at
    scale: the top-k cut is an ``orderBy().limit()`` which Spark runs
    as ``TakeOrderedAndProject`` (per-partition heaps, no global
    sort).  Ties break on the token text so the capped model is
    deterministic.  ``total_tokens``/``vocab_size`` are the UNCAPPED
    corpus totals — capping narrows the stored counts (everything else
    falls back to the smoothed floor), not the probability space.
    """
    from ._cache import cache_bounded

    ws = df.select(words(F.col(text_col)).alias("__ws"))
    toks = ws.select(F.explode("__ws").alias("tok"))
    # vocab-sized and consumed repeatedly: the totals collect right
    # below, then (uncapped) both unigram joins of every scoring pass,
    # or (capped) the top-k cut — cache so the train corpus tokenizes
    # ONCE for all unigram consumers instead of once per consumer
    # (round 15, guide §5.3; the bigram table stays uncached — it has
    # exactly one consumer per scoring materialization).
    uni = cache_bounded(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_uni")))
    totals = uni.agg(
        F.sum("c_uni").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    total_tokens = int(totals["t"] or 0)
    vocab_size = int(totals["v"] or 0)

    n_prev = F.greatest(F.size("__ws") - 1, F.lit(0))
    pairs = ws.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__ws"), 1, n_prev).alias("w1"),
                F.slice(F.col("__ws"), 2, n_prev).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))

    uni_capped = max_vocab is not None
    # a vocab cap alone does NOT bound the bigram table tightly enough
    # to promise a broadcast (seen pairs within the top-V tokens can
    # still be huge); only an explicit max_bigrams does
    big_capped = max_bigrams is not None
    if uni_capped:
        uni = uni.orderBy(F.desc("c_uni"), F.asc("tok")).limit(max_vocab)
        # a bigram whose history word fell out of the capped vocab
        # would score (c_big + a) / (0 + a*(V+1)) — a "probability"
        # above 1; the standard OOV treatment drops every pair not
        # fully inside the kept vocab, so unseen falls to the floor
        big = big.join(
            uni.select(F.col("tok").alias("w1")), "w1", "semi"
        ).join(uni.select(F.col("tok").alias("w2")), "w2", "semi")
    if max_bigrams is not None:
        big = big.orderBy(
            F.desc("c_big"), F.asc("w1"), F.asc("w2")).limit(max_bigrams)
    # a capped table is small by construction; materialize it once so
    # repeated scoring jobs don't re-run the train scan
    if uni_capped:
        uni = uni.localCheckpoint(eager=False)
    if big_capped:
        big = big.localCheckpoint(eager=False)
    return BigramLM(uni, big, total_tokens, vocab_size, float(add_k),
                    uni_capped, big_capped)


def score_perplexity(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
) -> DataFrame:
    """Per-document average negative log-likelihood under ``lm``.

    Returns ``(id, n_tok, avg_nll)``; empty docs keep a row with
    ``n_tok = 0`` and null ``avg_nll``.  Lower avg_nll = more fluent
    under the model (CCNet keeps the low band).

    Plan: explode (doc, pos, w1, w2) — w1 null at pos 1 — LEFT-join
    the two count tables on the token keys, compute the smoothed
    interpolated probability with null counts reading as 0, rollup per
    doc.  With a capped model both joins broadcast (asserted in
    tests/test_plans.py) and the whole score is one map-side pass; an
    uncapped model degrades to token-keyed shuffle joins, still linear.
    """
    a = lm.add_k
    denom_slots = float(lm.vocab_size + 1)
    t_tot = float(lm.total_tokens)

    toks = _doc_tokens(df, id_col, text_col)
    pos = toks.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(None).cast("string")),
                    F.slice(F.col("__ws"), 1,
                            F.greatest(F.size("__ws") - 1, F.lit(0))),
                ).alias("w1"),
                F.col("__ws").alias("w2"),
            )
        ).alias("__pos", "p"),
    ).select(
        F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).filter(F.col("w2").isNotNull())  # zip-pad row of an empty doc

    uni, big = lm.unigrams, lm.bigrams
    if lm.uni_capped:
        uni = F.broadcast(uni)
    if lm.big_capped:
        big = F.broadcast(big)
    # three LEFT joins, all against model tables: c(w2) for the
    # unigram term, c(w1) for the conditional's denominator (an unseen
    # or capped-out history reads 0 => pure smoothed floor), c(w1 w2)
    # for the numerator.  With a capped model all three broadcast.
    joined = (
        pos.join(uni.select(F.col("tok").alias("w2"),
                            F.col("c_uni")), "w2", "left")
        .join(uni.select(F.col("tok").alias("w1"),
                         F.col("c_uni").alias("c_w1")), "w1", "left")
        .join(big, ["w1", "w2"], "left")
    )

    c_uni = F.coalesce(F.col("c_uni"), F.lit(0)).cast("double")
    c_big = F.coalesce(F.col("c_big"), F.lit(0)).cast("double")
    p_uni = (c_uni + a) / (t_tot + a * denom_slots)
    c_w1 = F.coalesce(F.col("c_w1"), F.lit(0)).cast("double")
    p_big = (c_big + a) / (c_w1 + a * denom_slots)
    p_tok = F.when(
        F.col("w1").isNull(), p_uni
    ).otherwise(F.lit(lam) * p_big + F.lit(1.0 - lam) * p_uni)
    nll = F.round(-F.log(p_tok), 6)

    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(F.avg(nll), 4).alias("avg_nll"),
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.col("avg_nll"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
    max_avg_nll: float | None = None,
    band: tuple[float, float] | None = None,
) -> DataFrame:
    """Keep docs whose avg_nll clears the gate.

    ``max_avg_nll`` keeps the fluent head (CCNet's usual choice);
    ``band=(lo, hi)`` keeps a middle slice (head text is often
    boilerplate-clean but low-diversity).  Returns the original rows
    plus ``(n_tok, avg_nll)``.
    """
    scored = score_perplexity(df, lm, id_col, text_col, lam)
    out = df.join(scored, id_col)
    if max_avg_nll is not None:
        out = out.filter(F.col("avg_nll") <= max_avg_nll)
    if band is not None:
        lo, hi = band
        out = out.filter(F.col("avg_nll").between(lo, hi))
    return out


def perplexity_buckets(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split as exact GLOBAL perplexity
    tertiles (Wenzek et al. 2019 §4.4 — the released corpus ships in
    three equal-size buckets per language, cut at the perplexity
    terciles, so downstream users subscribe to a quality band rather
    than a threshold).  Generalizes to any ``len(labels)`` buckets.

    Output: ``(id, n_tok, avg_nll, ppl_bucket)`` — one row per input
    doc.  Empty documents (null avg_nll) sort LAST (least fluent
    reading), landing in the final bucket.

    Plan: scoring is the zero-shuffle broadcast-model pass of
    :func:`score_perplexity`; the bucket is an exact NTILE over
    (avg_nll, id) via ``global_distribution_ranks`` — value-derived
    range buckets + per-bucket local windows + broadcast offsets, no
    single-task global sort (operators/windows.py's design note).
    """
    from ..operators.windows import global_distribution_ranks
    from ._cache import cache_bounded

    # bounded-pool persist: the two-phase ranks evaluate their input
    # three times (quantile probe, per-bucket counts, final ranking) —
    # uncached, each evaluation re-runs the whole LM scoring join
    # (measured 3.3 s -> 2.2 s at sf0.1).  The scored frame is one
    # narrow row per doc, far smaller than the corpus.
    scored = cache_bounded(score_perplexity(df, lm, id_col, text_col, lam))
    keyed = scored.withColumn(
        "__pplk", F.coalesce(F.col("avg_nll"), F.lit(float("inf"))))
    ranked = global_distribution_ranks(
        keyed, [F.col("__pplk"), F.col(id_col)], n_tiles=len(labels))
    lab = F.array(*[F.lit(s) for s in labels])
    return ranked.select(
        id_col, "n_tok", "avg_nll",
        F.element_at(lab, F.col("ntile").cast("int")).alias("ppl_bucket"))


def merge_bigram_lm(a: BigramLM, b: BigramLM) -> BigramLM:
    """Merge two LMs trained on DISJOINT corpora into the LM of their
    union — count tables are mergeable partials (union + sum), totals
    add.  This is the incremental-analytics shape the HLL/histogram
    sketch tables use: train per-day models as batches land, merge for
    any window, never re-scan history.  Merging capped models is
    refused: a top-k cut is not distributive (a token can clear the
    cap in the union while missing both per-part caps), so cap once,
    after the final merge.
    """
    if a.capped or b.capped:
        raise ValueError(
            "merge uncapped models, then cap: top-k cuts are not "
            "distributive over the merge")
    if a.add_k != b.add_k:
        raise ValueError(f"add_k mismatch: {a.add_k} vs {b.add_k}")
    # materialize the merged tables: the inputs are LAZY plans rooted
    # at their training corpora (only capped tables checkpoint at
    # train time, and capped models don't reach here), so without this
    # the vocab recount below — and EVERY later scoring job, and every
    # chained daily merge — would re-scan all the source corpora
    uni = (
        a.unigrams.unionByName(b.unigrams)
        .groupBy("tok").agg(F.sum("c_uni").alias("c_uni"))
    ).localCheckpoint(eager=True)
    big = (
        a.bigrams.unionByName(b.bigrams)
        .groupBy("w1", "w2").agg(F.sum("c_big").alias("c_big"))
    ).localCheckpoint(eager=True)
    # vocab_size is NOT a sum (shared tokens); recount from the
    # materialized merged table — model rows, never the corpora
    v = int(uni.agg(F.count(F.lit(1)).alias("v")).collect()[0]["v"] or 0)
    return BigramLM(uni, big, a.total_tokens + b.total_tokens, v,
                    a.add_k, False, False)


def save_bigram_lm(lm: BigramLM, path: str) -> None:
    """Persist the model as parquet tables + a meta file (the same
    one-artifact shape as ``save_pca``/``save_text_classifier``)."""
    import json as _json
    import os as _os

    # sever the lineage before overwriting: a loaded (or loaded-and-
    # merged) model's plan still READS path/uni — writing over it
    # without materializing first is read-write-same-path corruption
    uni = lm.unigrams.localCheckpoint(eager=True)
    big = lm.bigrams.localCheckpoint(eager=True)
    uni.write.mode("overwrite").parquet(_os.path.join(path, "uni"))
    big.write.mode("overwrite").parquet(_os.path.join(path, "big"))
    with open(_os.path.join(path, "_lm_meta.json"), "w") as f:
        _json.dump({
            "total_tokens": lm.total_tokens, "vocab_size": lm.vocab_size,
            "add_k": lm.add_k, "uni_capped": lm.uni_capped,
            "big_capped": lm.big_capped,
        }, f)


def load_bigram_lm(spark, path: str) -> BigramLM:
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_lm_meta.json")) as f:
        meta = _json.load(f)
    return BigramLM(
        spark.read.parquet(_os.path.join(path, "uni")),
        spark.read.parquet(_os.path.join(path, "big")),
        meta["total_tokens"], meta["vocab_size"], meta["add_k"],
        meta["uni_capped"], meta["big_capped"])
