"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The published recipe for picking pretraining data that *looks like* a
trusted target corpus without training a classifier per candidate set:

1. featurize every document as a bag of hashed word n-grams
   (unigrams + bigrams hashed into ``buckets`` slots);
2. fit two smoothed multinomial bag-of-buckets models — one on the
   target corpus, one on the raw pool;
3. weight every raw doc by its log importance ratio
   ``log p_target(doc) - log p_raw(doc)`` (a sum of per-bucket
   log-ratios over the doc's grams);
4. resample without replacement in proportion to the weights —
   implemented here with the Gumbel top-k trick, which turns weighted
   sampling-without-replacement into an ``ORDER BY (logw + gumbel)
   LIMIT k`` (Vieira 2014), i.e. a ``TakeOrderedAndProject`` plan.

Spark-first shape (the part that matters at 100 TB):

- The two models are ``buckets``-bounded count tables (one explode +
  map-side-combined ``groupBy(bucket)`` each); the corpus NEVER
  shuffles by anything wider than the per-doc rollup key.
- Scoring broadcasts the (≤ ``buckets``-row) log-ratio table and
  aggregates per doc with map-side combine — zero corpus-side
  shuffle beyond the ``id``-keyed partial agg, the same
  fixed-model/streaming-corpus contract as ``lm.score_perplexity``.
- The resample is a global top-k: per-partition heaps + driver merge
  (``TakeOrderedAndProject``), never a global sort.

Engine-portable determinism (oracle contract): gram buckets come from
the samplers' 48-bit md5 prefix (``sampling.hash_bucket``), per-bucket
log-ratios round to 6 decimals BEFORE the per-doc sum, and every later
value (the sum, the Gumbel key) re-rounds on the SAME 1e-6 grid — the
exact result is on-grid, so rounding only snaps off libm's 1-ulp
``ln`` wobble and double-addition order noise, never decides a
half-way case — and the Gumbel noise derives from the same md5 uniform as
``weighted_sample`` — a pure function of the doc id, so the selected
set is restart-, partitioning-, and engine-independent.

The reference has no analytics surface at all (SURVEY.md §2.3) — this
extends the curation layer next to ``functions/sampling.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .corpus import word_ngrams, words
from .sampling import _HASH_SPACE, _hash_long, hash_bucket

__all__ = ["DsirModel", "dsir_fit", "dsir_score", "save_dsir",
           "load_dsir", "dsir_logweights", "dsir_resample"]


@dataclass
class DsirModel:
    """Fitted DSIR importance model: the per-bucket log-ratio table
    (``(__b, __llr)``, ≤ ``buckets`` rows — broadcastable by
    construction), the featurization parameters, and the smoothed
    log-ratio a bucket unseen in BOTH fit corpora scores
    (``round(ln(N_r+B) - ln(N_t+B), 6)`` — both counts smooth to +1,
    so only the totals term survives).  Fit once on (pool, target),
    then score any number of later ingest batches without refitting —
    the same fixed-model/streaming-corpus contract as ``BigramLM``."""

    llr: DataFrame
    buckets: int
    salt: str
    default_llr: float


def _gram_buckets(
    df: DataFrame, id_col: str, text_col: str, buckets: int, salt: str,
) -> DataFrame:
    """``(id, __b)`` — one row per unigram AND bigram occurrence,
    hashed into ``buckets`` slots.  The md5 runs post-explode as a
    plain column expression (whole-stage codegen), not inside an
    interpreted per-element HOF."""
    ws = words(F.col(text_col))
    grams = F.concat(ws, word_ngrams(ws, 2))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(F.col(id_col),
                hash_bucket(F.col("__g"), buckets, salt).alias("__b"))
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "",
) -> DataFrame:
    """Per-document DSIR importance log-weight of every ``df`` row
    against the ``target`` corpus: ``(id, n_grams, logw)``.

    ``logw = sum_grams round(ln(c_t[b]+1) - ln(c_r[b]+1)
    + ln(N_r+B) - ln(N_t+B), 6)`` — add-one-smoothed
    multinomials over hashed unigram+bigram buckets, so a doc whose
    gram distribution resembles the target's scores high and generic
    pool-shaped text scores ~0.  Docs with no tokens carry
    ``n_grams = 0, logw = 0.0``.

    Cost: the pool's explode+md5 gram pass runs ONCE (bounded-pool
    persisted — it feeds both the raw count table and the scoring
    rollup; unpersisted it re-runs, measured ~1.5x the query), the
    target corpus pays one gram pass for its count table, and scoring
    is the broadcast log-ratio join + per-doc rollup.  Nothing scales
    with corpus size except linear scans."""
    from ._cache import cache_bounded

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    doc_grams = cache_bounded(
        _gram_buckets(df, id_col, text_col, buckets, salt))
    model = _fit_from_grams(
        doc_grams,
        _gram_buckets(target, id_col, text_col, buckets, salt), buckets,
        salt)
    return _score_grams(df, doc_grams, model, id_col)


def dsir_fit(
    pool: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "",
) -> DsirModel:
    """Fit the two hashed-ngram multinomials and return the
    :class:`DsirModel` (per-bucket log-ratio table + unseen-bucket
    default).  Cost: two explode+groupBy(bucket) passes whose output
    tables are ≤ ``buckets`` rows, plus two 1-row total aggregates —
    nothing corpus-sized materializes anywhere."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    return _fit_from_grams(
        _gram_buckets(pool, id_col, text_col, buckets, salt),
        _gram_buckets(target, id_col, text_col, buckets, salt),
        buckets, salt)


def _fit_from_grams(
    pool_grams: DataFrame,
    target_grams: DataFrame,
    buckets: int,
    salt: str,
) -> DsirModel:
    tgt = target_grams.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__ct"))
    raw = pool_grams.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"))
    # 1-row totals — guarded metadata-scale collects
    n_t = tgt.agg(F.sum("__ct")).collect()[0][0] or 0
    n_r = raw.agg(F.sum("__cr")).collect()[0][0] or 0
    const = math.log(n_r + buckets) - math.log(n_t + buckets)
    # FULL-outer join: buckets seen only in the TARGET corpus are the
    # most target-characteristic grams of all — they must keep their
    # smoothed target count (ln(ct+1) + const with cr=0), not fall to
    # the counts-free default_llr when dsir_score meets them in a
    # later batch.  Buckets absent from BOTH corpora still smooth to
    # default_llr at score time.  Table is <= buckets rows ->
    # broadcast at score time.
    llr = (
        raw.join(tgt, "__b", "full_outer")
        .select(
            "__b",
            F.round(
                F.log(F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0))
                - F.log(F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1.0))
                + F.lit(const),
                6,
            ).alias("__llr"))
    )
    return DsirModel(llr=llr, buckets=buckets, salt=salt,
                     default_llr=round(const, 6))


def dsir_score(
    df: DataFrame,
    model: DsirModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score any batch against a fitted (or loaded) model:
    ``(id, n_grams, logw)`` — one linear pass with the ≤ ``buckets``-row
    log-ratio table broadcast; grams hitting buckets absent from BOTH
    fit corpora take ``model.default_llr`` (the smoothed
    totals-only ratio), so scoring never refits and a continuously
    arriving corpus pays O(batch) per batch."""
    return _score_grams(
        df,
        _gram_buckets(df, id_col, text_col, model.buckets, model.salt),
        model, id_col)


def _score_grams(
    df: DataFrame,
    doc_grams: DataFrame,
    model: DsirModel,
    id_col: str,
) -> DataFrame:
    scored = (
        doc_grams.join(F.broadcast(model.llr), "__b", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"),
             # the exact sum of 6-dec-quantized terms IS a multiple of
             # 1e-6, so round(,6) only snaps off double-addition order
             # noise (~1e-12) — never a half-way decision.  A COARSER
             # final grid would put on-grid sums exactly half-way
             # (x.xxxx50) where 1-ulp engine differences flip the
             # result; observed at round(,4) on 1 doc in 1000.
             (F.round(
                 F.sum(F.coalesce(F.col("__llr"),
                                  F.lit(model.default_llr))), 6)
              + F.lit(0.0)).alias("logw"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"))
    )


def save_dsir(model: DsirModel, spark, path: str) -> None:
    """Persist the model: the log-ratio table as one parquet file plus
    a one-row meta (JVM-literal write — no Python-RDD round trip)."""
    model.llr.coalesce(1).write.mode("overwrite").parquet(f"{path}/llr")
    (spark.range(1).select(
        F.lit(model.buckets).cast("int").alias("buckets"),
        F.lit(model.salt).alias("salt"),
        F.lit(model.default_llr).cast("double").alias("default_llr"))
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))


def load_dsir(spark, path: str) -> DsirModel:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return DsirModel(
        llr=spark.read.parquet(f"{path}/llr"),
        buckets=meta["buckets"], salt=meta["salt"],
        default_llr=meta["default_llr"])


def dsir_resample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """Select ``k`` documents from ``df`` by importance resampling
    WITHOUT replacement toward ``target``'s distribution — the Gumbel
    top-k trick: each doc gets key ``logw + Gumbel(0,1)`` and the ``k``
    largest keys are exactly a weight-proportional sample without
    replacement.  Returns ``(id, n_grams, logw, gumbel_key)``.

    The Gumbel noise is ``-ln(-ln(u))`` with ``u`` the doc id's salted
    48-bit md5 uniform (``(h+1) / (2^48+2)`` — strictly inside (0,1)),
    so the draw is a pure function of the id: restart-deterministic,
    partitioning-independent, and exactly recomputable in SQL.  Noise
    rounds to 6 decimals and the key to 6 (quantized inputs, the
    cross-engine hash-parity discipline).

    Plan: the scoring pass of :func:`dsir_logweights`, then
    ``orderBy(key desc, id).limit(k)`` — TakeOrderedAndProject
    (per-partition heaps + driver merge), never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_logweights(df, target, id_col, text_col, buckets, salt="")
    u = (_hash_long(F.col(id_col), salt) + F.lit(1.0)) \
        / F.lit(_HASH_SPACE + 2.0)
    gumbel = F.round(-F.log(-F.log(u)), 6)
    return (
        w.withColumn(
            "gumbel_key",
            F.round(F.col("logw") + gumbel, 6) + F.lit(0.0))
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )
