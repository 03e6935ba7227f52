"""Distributed PCA / dimensionality reduction for embedding columns.

The reference engine has no linear-algebra layer (its surface ends at the
connector protocol, ``tap.py``); this module extends the engine's
LLM-pipeline side: PCA compression/whitening ahead of clustering or
IVF/PQ indexing is the standard preprocessing step for a 100 TB embedding
corpus (halving ``d`` halves every downstream ANN scan).

Scale shape (1000-executor / 100 TB reasoning):

* **fit** is ONE corpus scan.  Each task reduces its Arrow batches to a
  single ``d + d^2 + 1``-element partial (count, per-dim sums, Gram
  matrix) inside a ``mapInPandas`` numpy pass; the shuffle then carries
  only those partials keyed by coefficient index (map-side combine makes
  the reduce input ~``d^2`` rows per task, independent of row count).
  The final ``collect()`` is ``d^2 + d + 1`` doubles — bounded by the
  embedding dimension, never by the corpus (d=1024 -> 8 MB).
* the eigendecomposition runs on the driver over the ``d x d``
  covariance — O(d^3) on one core, negligible next to the scan.
* **project** is embarrassingly parallel: the ``(k, d)`` component
  matrix broadcasts inside the UDF closure; one matmul per Arrow batch;
  zero shuffle.

Numerics: partials accumulate in float64; the covariance uses the
two-pass-free form ``(G - s s^T / n) / (n - 1)`` which is exact in the
sums actually computed.  Component sign is canonicalized (largest-|x|
coordinate positive) so the model is deterministic given the covariance.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["PcaModel", "fit_pca", "pca_project", "covariance_long",
           "save_pca", "load_pca"]


@dataclass
class PcaModel:
    """Fitted PCA: row-orthonormal ``components`` (k, d), descending
    ``explained_variance`` (k,), the training ``mean`` (d,) and row
    count.  Plain numpy — picklable, broadcastable, persistable."""

    mean: "np.ndarray"
    components: "np.ndarray"
    explained_variance: "np.ndarray"
    n_rows: int

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One scan -> per-task flat partials ``(idx, val)``: idx 0 is the
    row count, 1..d the per-dim sums, d+1.. the row-major Gram entries."""

    def gen(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            n += mat.shape[0]
            bs = mat.sum(axis=0)
            bg = mat.T @ mat
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if n == 0:
            return
        d = s.shape[0]
        yield pd.DataFrame({
            "idx": np.arange(1 + d + d * d, dtype="int64"),
            "val": np.concatenate(([float(n)], s, g.ravel())),
        })

    return df.select(vec_col).mapInPandas(gen, schema="idx long, val double")


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PcaModel:
    """Fit PCA in one distributed scan (see module docstring for the
    plan shape).  ``k`` is clamped to the embedding dimension."""
    rows = (
        _moment_partials(df, vec_col)
        .groupBy("idx").agg(F.sum("val").alias("v"))
        .collect()  # d^2 + d + 1 rows — dimension-bounded, not corpus-bounded
    )
    vals = {r["idx"]: r["v"] for r in rows}
    if not vals:  # empty input: no partials at all
        raise ValueError("fit_pca needs at least 2 rows")
    # len(vals) = 1 + d + d^2  ->  d = (-1 + sqrt(4*len - 3)) / 2
    d = int(round((-1 + (4 * len(vals) - 3) ** 0.5) / 2))
    n = int(vals[0])
    if n < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    s = np.array([vals[i] for i in range(1, d + 1)])
    g = np.array([vals[i] for i in range(d + 1, d + 1 + d * d)]).reshape(d, d)
    mean = s / n
    cov = (g - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending, orthonormal columns
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T.copy()
    for row in comps:  # canonical sign -> deterministic model
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PcaModel(mean=mean, components=comps,
                    explained_variance=np.maximum(evals[order], 0.0), n_rows=n)


def pca_project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> DataFrame:
    """Project every vector onto the fitted components: ``(id, proj)``
    with ``proj`` = (x - mean) @ components^T.  Broadcast model, one
    numpy matmul per Arrow batch, zero shuffle."""
    mu = model.mean.copy()
    ct = model.components.T.copy()

    @pandas_udf("array<double>")
    def _proj(xs: pd.Series) -> pd.Series:
        mat = np.stack(xs.to_numpy()).astype("float64")
        out = (mat - mu) @ ct
        return pd.Series(list(out))

    return df.select(F.col(id_col), _proj(F.col(vec_col)).alias(out_col))


def covariance_long(
    df: DataFrame, vec_col: str = "embedding", round_to: int = 6
) -> DataFrame:
    """Upper-triangle sample covariance as ``(i, j, cov)`` rows, computed
    with Catalyst expressions only — the SQL-oracle-checkable twin of the
    matrix :func:`fit_pca` eigendecomposes (eigenvectors themselves are
    not SQL-expressible, so correctness is pinned at the covariance).

    Plan: nested posexplode (d^2/2 rows per vector) -> (i, j) partial-agg
    sums -> closed form ``(sxy - sx*sy/n) / (n-1)``.  This quadratic
    explosion is fine for the oracle path (embeddings tables are the
    small side); the corpus-scale fit uses the numpy-partial scan above.
    """
    pairs = (
        df.select(F.posexplode(vec_col).alias("i", "x"), F.col(vec_col))
        .select("i", "x", F.posexplode(vec_col).alias("j", "y"))
        .filter(F.col("j") >= F.col("i"))
    )
    return (
        pairs.groupBy("i", "j")
        .agg(F.sum(F.col("x").cast("double") * F.col("y").cast("double")).alias("sxy"),
             F.sum(F.col("x").cast("double")).alias("sx"),
             F.sum(F.col("y").cast("double")).alias("sy"),
             F.count(F.lit(1)).alias("n"))
        .select(
            "i", "j",
            # + 0.0 folds IEEE -0.0 into 0.0 so the value hashes
            # identically across engines (DuckDB keeps the sign bit)
            (F.round(
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                / (F.col("n") - 1),
                round_to,
            ) + F.lit(0.0)).alias("cov"),
        )
    )


def save_pca(model: PcaModel, spark, path: str) -> None:
    """Persist a fitted model as a one-row parquet (mean, row-major
    components, explained variance, shape) — an engine-portable
    artifact like the IVF index: fit once on the 100 TB corpus, reuse
    across every downstream projection job."""
    from pyspark.sql import functions as F

    k, d = model.components.shape

    def arr(v):
        # JVM-literal arrays: a Python-RDD-backed 1-row frame pays a
        # python-worker round-trip per default-parallelism slice on
        # write (~4 s on local[32]); lit() stays JVM-side
        return F.array(*[F.lit(float(x)) for x in v])

    spark.range(1).select(
        arr(model.mean).alias("mean"),
        arr(model.components.ravel()).alias("components"),
        arr(model.explained_variance).alias("explained_variance"),
        F.lit(int(model.n_rows)).cast("long").alias("n_rows"),
        F.lit(k).cast("int").alias("k"),
        F.lit(d).cast("int").alias("d"),
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca(spark, path: str) -> PcaModel:
    row = spark.read.parquet(path).collect()[0]
    comps = np.array(row["components"]).reshape(row["k"], row["d"])
    return PcaModel(
        mean=np.array(row["mean"]), components=comps,
        explained_variance=np.array(row["explained_variance"]),
        n_rows=row["n_rows"])
