"""Deterministic sampling / splitting for training-data pipelines.

Reproducibility rules this module enforces:
* splits NEVER depend on row order, partitioning, or a session seed —
  membership is a pure function of the row's id (hash-bucketed), so the
  same row lands in the same split on any cluster size, any day;
* md5 (not xxhash64) keys the split so any engine (or SQL oracle) can
  recompute membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_split", "stratified_sample"]


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): md5 the id (+ salt), take the first
    4 hex chars as an integer, mod buckets.  Engine-portable."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % buckets)


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/test split column: rows whose id-hash
    bucket < ``train_pct`` are 'train', the rest 'test'.  Changing
    ``salt`` re-deals the split without touching the data."""
    b = hash_bucket(F.col(id_col), 100, salt)
    return df.withColumn(
        split_col, F.when(b < train_pct, F.lit("train")).otherwise(F.lit("test")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): deterministic for a
    fixed (data, seed, partitioning) triple — use for down-weighting
    over-represented sources/languages in a training mix."""
    return df.sampleBy(strata_col, fractions, seed)
