"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``tap_airbyte_wrapper_spark/plans/queries.py``;
this module is the thin driver-facing wrapper.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tap_airbyte_wrapper_spark.plans import ORACLES, QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extensions).  Each callable takes (spark, sf_dir)."""

    def with_utc(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: with_utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query.  Keys absent here
    (minhash_pairs, simhash_pairs, knn_lsh, knn_ivf, knn_pq,
    kmeans_clusters, pca_project_embeddings) use
    xxhash64/LSH/k-means/eigendecomposition internals that SQL
    cannot reproduce -> driver records rows-only checks; each has an
    oracle-backed verified twin (e.g. embedding_covariance for PCA).
    approx_distinct_users carries a BOUNDS oracle since r13 (exact
    counts verified + the HLL estimate's 3-sigma envelope)."""
    return dict(ORACLES)
