"""Local replica of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB on row count, column names, and
order-insensitive values at sf0.001 (fast) — the driver runs sf0.01.

Run the heavier sf0.01 pass manually:
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(val):
    """Driver-strict cell canonicalization: the driver value-hashes the
    pandas frames exactly, so int64 0 vs HUGEINT-as-float 0.0, -0.0 vs
    0.0, and last-ulp double noise ALL mismatch there — they must
    mismatch here too.  Only NaN/None get folded (pandas represents SQL
    NULL as NaN in float columns)."""
    import numpy as np

    if val is None:
        return "∅"
    if isinstance(val, np.generic):
        val = val.item()  # np.int64(0) -> 0, np.float64(.5) -> 0.5
    if isinstance(val, float) and math.isnan(val):
        return "∅"
    if isinstance(val, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return repr(val)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    spdf = q(spark, sf_dir).toPandas()
    scols = list(spdf.columns)
    srows = list(spdf.itertuples(index=False, name=None))

    dpdf = ddb.execute(entry_mod.oracle_sql()[name]).df()
    dcols = list(dpdf.columns)
    drows = list(dpdf.itertuples(index=False, name=None))

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}")
    sset, dset = rowset(scols, srows), rowset(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in dset][:5]
        diff_d = [r for r in dset if r not in sset][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only={diff_s}\n duck-only={diff_d}")


def test_no_oracle_queries_run(spark, sf_dir):
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    # approx_distinct_users left this list in r13: its bounds oracle
    # (exact counts verified + 3-sigma HLL envelope) gives the driver
    # a meaningful pass/fail instead of the r03 rows-only check.
    assert missing == {"minhash_pairs", "simhash_pairs", "knn_lsh", "knn_ivf",
                       "knn_pq", "kmeans_clusters",
                       "pca_project_embeddings"}
    for name in missing:
        df = entry_mod.queries()[name](spark, sf_dir)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "sum_disc_price" in df.columns


def test_driver_window_fully_oracle_backed():
    """The driver records correctness rows for QUERIES[:50] only — every
    entry in that window must carry a DuckDB oracle, or a slot is wasted
    on a rows-only check (the round-3 verdict's standing gate item)."""
    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    missing = [n for n in names[:50] if n not in oracles]
    assert missing == [], f"in-window queries without oracle: {missing}"
    assert len(names) >= 50
