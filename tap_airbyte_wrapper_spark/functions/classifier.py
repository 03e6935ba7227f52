"""Distributed linear text classifier (fasttext-style quality filter).

The third standard LLM-curation gate next to heuristic scores
(``text.quality_score``) and LM perplexity (``lm``): production
pipelines train a cheap linear classifier on hashed bag-of-words
features — "does this look like reference text vs crawl noise?" —
and keep the high-scoring documents (the CCNet/LLaMA recipe).

Everything here is the PCA pattern (``projection.py``) applied to
logistic regression:

- **Features**: the hashing trick — token -> ``xxhash64(token+salt) %
  dim`` computed JVM-side, so a document becomes a small int array and
  the model is a fixed ``dim``-float vector regardless of vocabulary.
  Feature value = token count / doc token count (length-normalized
  bag of words).
- **Training** (:func:`fit_text_classifier`): full-batch gradient
  descent; each iteration is ONE ``mapInPandas`` scan reducing every
  partition to a ``(dim+2)``-float gradient partial (vectorized numpy
  — ``reduceat`` for margins, ``add.at`` for scatter-accumulate), the
  driver sums partials IN PARTITION ORDER (deterministic) and steps.
  The shuffle and driver cost per iteration are dim-bounded, never
  corpus-bounded; the corpus is scanned ``n_iter`` times, so pass a
  cached/persisted (or sampled — the standard choice: these models
  train on ~100k labeled docs, not the full 100 TB) input.
- **Scoring** (:func:`classify`): fully declarative — explode token
  indices, broadcast-join the ``(idx, weight)`` model table, per-doc
  mean + sigmoid.  Zero-shuffle map-side pass over any corpus size,
  exactly like the capped-LM scorer (``lm.score_perplexity``).

No SQL oracle (iterative training is not SQL-expressible);
correctness is pinned in tests by exact equivalence to a sequential
numpy reference implementation of the same recipe, plus separability
and persistence round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .corpus import words

__all__ = ["TextClassifierModel", "hashed_token_indices",
           "fit_text_classifier", "classify", "save_text_classifier",
           "load_text_classifier"]


@dataclass
class TextClassifierModel:
    weights: np.ndarray  # (dim,) float64
    bias: float
    dim: int
    salt: str


def hashed_token_indices(col: Column, dim: int, salt: str = "") -> Column:
    """Token -> feature index array via the hashing trick, JVM-side:
    ``pmod(xxhash64(salt || token), dim)`` per whitespace token."""
    return F.transform(
        words(col),
        lambda t: F.pmod(F.xxhash64(F.concat(F.lit(salt), t)), F.lit(dim))
        .cast("int"),
    )


def _grad_pass(dim: int, w: np.ndarray, b: float):
    """mapInPandas generator: one (dim+2)-float gradient partial per
    partition — [sum_scatter(grad_w), sum(p-y), n_docs].  The l2 term
    is applied driver-side (it must not be multiplied per partition).
    """

    def gen(batches):
        import pandas as pd

        gw = np.zeros(dim, dtype=np.float64)
        gb = 0.0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            idx_lists = pdf["idxs"].to_numpy()
            ys = pdf["y"].to_numpy(dtype=np.float64)
            lens = np.array([len(a) for a in idx_lists], dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                continue
            idx_lists, ys, lens = idx_lists[keep], ys[keep], lens[keep]
            flat = np.concatenate([np.asarray(a, dtype=np.int64)
                                   for a in idx_lists])
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            margins = np.add.reduceat(w[flat], starts) / lens + b
            p = 1.0 / (1.0 + np.exp(-margins))
            coef = (p - ys) / lens
            np.add.at(gw, flat, np.repeat(coef, lens))
            gb += float((p - ys).sum())
            n += len(ys)
        yield pd.DataFrame({
            "pid": [0], "gw": [gw.tolist()], "gb": [gb], "n": [n]})

    return gen


def fit_text_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 4096,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    salt: str = "",
) -> TextClassifierModel:
    """Train the hashed-BoW logistic model on ``(text, 0/1 label)``
    rows.  The token-index projection is computed once, JVM-side,
    persisted for the duration of training (unpersisted on return),
    and scanned ``n_iter`` times — train on a labeled sample, not the
    full corpus, when the set is large.

    Deterministic: fixed iteration count and step size, partials
    summed in partition-id order, no randomness anywhere (w0 = 0).
    """
    prepped = df.select(
        F.col(label_col).cast("double").alias("y"),
        hashed_token_indices(F.col(text_col), dim, salt).alias("idxs"),
    ).persist()
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(n_iter):
        parts = prepped.mapInPandas(
            _grad_pass(dim, w, b),
            schema="pid int, gw array<double>, gb double, n long",
        ).withColumn("pid", F.spark_partition_id()).collect()
        parts = sorted(parts, key=lambda r: r["pid"])
        n = sum(r["n"] for r in parts)
        if n == 0:
            raise ValueError("no non-empty training documents")
        gw = np.zeros(dim, dtype=np.float64)
        gb = 0.0
        for r in parts:
            gw += np.asarray(r["gw"], dtype=np.float64)
            gb += r["gb"]
        w -= lr * (gw / n + l2 * w)
        b -= lr * (gb / n)
    prepped.unpersist()
    return TextClassifierModel(w, float(b), dim, salt)


def classify(
    df: DataFrame,
    model: TextClassifierModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Per-doc P(label=1) under ``model`` — ``(id, n_tok, prob)``;
    empty docs score the bias alone.

    Declarative plan: posexplode indices -> broadcast-join the
    (idx, weight) model table (dim rows) -> per-doc mean + sigmoid.
    Map-side only; the one shuffle is the per-doc rollup.
    """
    spark = df.sparkSession
    wtab = F.broadcast(spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(model.weights)],
        schema="idx int, w double"))
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            hashed_token_indices(F.col(text_col), model.dim, model.salt)
        ).alias("idx"),
    )
    per_doc = (
        toks.join(wtab, "idx", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("idx")).alias("n_tok"),
            F.coalesce(F.avg("w"), F.lit(0.0)).alias("__m"),
        )
    )
    margin = F.col("__m") + F.lit(model.bias)
    return per_doc.select(
        F.col(id_col), F.col("n_tok"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias(out_col),
    )


def save_text_classifier(model: TextClassifierModel, spark, path: str) -> None:
    """One-row parquet artifact (same shape as ``save_pca``) — built
    JVM-literal for the same tiny-write reason as ``save_pca``."""
    spark.range(1).select(
        F.array(*[F.lit(float(w)) for w in model.weights]).alias("weights"),
        F.lit(float(model.bias)).alias("bias"),
        F.lit(int(model.dim)).cast("int").alias("dim"),
        F.lit(model.salt).alias("salt"),
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_text_classifier(spark, path: str) -> TextClassifierModel:
    r = spark.read.parquet(path).collect()[0]
    return TextClassifierModel(
        np.asarray(r["weights"], dtype=np.float64), float(r["bias"]),
        int(r["dim"]), r["salt"])
