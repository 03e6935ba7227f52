"""Z-order layout (sinks.write_zorder_layout): footer min/max must be
tight on EVERY clustered column, where a linear sort is tight on its
first key only."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.sinks import (
    write_pruned_layout,
    write_zorder_layout,
    zorder_value,
)

N_FILES = 32


@pytest.fixture(scope="module")
def two_dim(spark):
    # two independent uniform dimensions — the case a single-key sort
    # cannot serve
    return spark.range(0, 40_000).select(
        F.col("id"),
        (F.xxhash64("id") % 1_000_000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1_000_000).alias("b"),
    ).withColumn("a", F.abs("a")).withColumn("b", F.abs("b"))


def _file_ranges(path, col):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _overlapping(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_prunes_both_dimensions(tmp_path, two_dim):
    zdir = str(tmp_path / "z")
    ldir = str(tmp_path / "linear")
    write_zorder_layout(two_dim, zdir, ["a", "b"], target_files=N_FILES)
    write_pruned_layout(two_dim, ldir, ["a"], target_files=N_FILES)

    # a selective slab (~8% of the domain) on each dimension
    lo, hi = 400_000, 480_000
    za, zb = _file_ranges(zdir, "a"), _file_ranges(zdir, "b")
    la, lb = _file_ranges(ldir, "a"), _file_ranges(ldir, "b")
    assert len(za) >= N_FILES - 4  # range partitioner may merge boundaries

    # linear: first key prunes hard, second key prunes nothing
    assert _overlapping(la, lo, hi) <= len(la) // 3
    assert _overlapping(lb, lo, hi) >= len(lb) - 1

    # z-order pruning is partial by construction (file boundaries are
    # contiguous z-ranges, not axis-aligned slabs) but must hold on BOTH
    # dimensions at once — the property the linear sort cannot give
    assert _overlapping(za, lo, hi) <= len(za) * 3 // 4
    assert _overlapping(zb, lo, hi) <= len(zb) * 3 // 4
    # and beat the linear layout's unsorted dimension decisively
    assert _overlapping(zb, lo, hi) <= _overlapping(lb, lo, hi) * 3 // 4


def test_zorder_roundtrip_content(tmp_path, spark, two_dim):
    zdir = str(tmp_path / "z2")
    write_zorder_layout(two_dim, zdir, ["a", "b"], target_files=4)
    back = spark.read.parquet(zdir)
    assert back.count() == two_dim.count()
    assert set(back.columns) == {"id", "a", "b"}  # helper column dropped
    assert back.agg(F.sum("a")).collect()[0][0] == \
        two_dim.agg(F.sum("a")).collect()[0][0]


def test_zorder_value_interleaves(spark):
    """Monotone in each dimension holding the other fixed, and bounded
    by the bit budget."""
    df = spark.range(0, 1000).select(
        (F.col("id") * 97 % 1000).alias("a"),
        (F.col("id") * 31 % 1000).alias("b"))
    z = df.select(zorder_value(df, ["a", "b"], bits=4).alias("z"))
    zmax = z.agg(F.max("z")).collect()[0][0]
    assert 0 < zmax < (1 << 8)  # 2 cols x 4 bits


def test_zorder_equal_depth_handles_skew(tmp_path, spark):
    """A heavy-tailed column still spreads across buckets (equal-width
    would collapse the tail into one)."""
    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 < 99, F.col("id") % 50)
        .otherwise(F.col("id") * 1000).alias("skewed"),
        (F.abs(F.xxhash64("id")) % 1000).alias("u"))
    zdir = str(tmp_path / "skew")
    write_zorder_layout(df, zdir, ["skewed", "u"], target_files=8)
    ranges = _file_ranges(zdir, "u")
    # the uniform dimension still prunes: a narrow slab misses >= 1/4 of files
    assert _overlapping(ranges, 100, 200) <= len(ranges) * 3 // 4


def test_compact_parquet_coalesces_small_files(tmp_path, spark):
    from tap_airbyte_wrapper_spark.sinks import compact_parquet

    src, dst = str(tmp_path / "spray"), str(tmp_path / "tight")
    df = spark.range(0, 50_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"))
    df.repartition(64).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_mb=1)
    assert stats["files_in"] == 64
    assert stats["files_out"] < 64 / 4
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).collect()[0][0] == \
        df.agg(F.sum("id")).collect()[0][0]


def test_compact_parquet_with_sort_restores_pruning(tmp_path, spark):
    from tap_airbyte_wrapper_spark.sinks import compact_parquet

    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    spark.range(0, 300_000).select(
        (F.abs(F.xxhash64("id")) % 1_000_000).alias("v"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    ).repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_mb=1, sort_cols=["v"])
    ranges = _file_ranges(dst, "v")
    assert len(ranges) > 1
    # disjoint sorted ranges: a narrow predicate touches few files
    assert _overlapping(ranges, 100_000, 150_000) <= max(1, len(ranges) // 3)
    with pytest.raises(ValueError, match="NEW directory"):
        compact_parquet(spark, src, src)


def test_parquet_file_stats_index(tmp_path, spark, two_dim):
    from tap_airbyte_wrapper_spark.operators.quality import parquet_file_stats
    from tap_airbyte_wrapper_spark.sinks import write_pruned_layout

    path = str(tmp_path / "idx")
    write_pruned_layout(two_dim, path, ["a"], target_files=8)
    stats = parquet_file_stats(spark, path, columns=["a", "b"])
    rows = stats.collect()
    files = {r["file"] for r in rows}
    assert len(files) >= 6
    assert {r["column"] for r in rows} == {"a", "b"}
    assert all(r["rows"] > 0 and r["size_bytes"] > 0 for r in rows)
    # the index reproduces the pruning decision: files whose [min,max]
    # on the sort key miss a predicate range are exactly the skippable set
    a_rows = [r for r in rows if r["column"] == "a"]
    lo, hi = 400_000, 480_000
    skippable = {r["file"] for r in a_rows
                 if int(r["max_val"]) < lo or int(r["min_val"]) > hi}
    assert 0 < len(skippable) < len(files)
    # reading only the surviving files still yields every matching row
    keep = sorted(files - skippable)
    got = spark.read.parquet(*keep).filter(
        (F.col("a") >= lo) & (F.col("a") <= hi)).count()
    want = two_dim.filter((F.col("a") >= lo) & (F.col("a") <= hi)).count()
    assert got == want

    with pytest.raises(FileNotFoundError):
        parquet_file_stats(spark, str(tmp_path / "nope"))
