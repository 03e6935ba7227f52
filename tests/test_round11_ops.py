"""Round-11 regression pins: the four round-10 ADVICE items, then the
round's new operators (tests appended as they land)."""
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------
# ADVICE r10 fixes
# ---------------------------------------------------------------------

def test_mutual_information_empty_slice_keeps_contract(spark):
    """ADVICE (medium): the empty branch used to return the chi2
    schema (n, n_rows, n_cols, chi2, dof, cramers_v); the documented
    contract is ONE row (n, mi, h_x, h_y, nmi) so per-slice unions
    don't break on an empty slice."""
    from tap_airbyte_wrapper_spark.operators import mutual_information

    df = spark.createDataFrame([(None, "y"), ("x", None)],
                               "x string, y string")
    out = mutual_information(df, "x", "y")
    assert out.columns == ["n", "mi", "h_x", "h_y", "nmi"]
    row = out.first()
    assert row["n"] == 0 and row["mi"] is None and row["nmi"] is None
    # schema must union cleanly with the non-empty output
    nonempty = mutual_information(
        spark.createDataFrame([("a", "p"), ("b", "q")],
                              "x string, y string"), "x", "y")
    assert out.unionByName(nonempty).count() == 2


def test_pmi_ignores_null_text_rows(spark):
    """ADVICE (low): words(NULL) is a null array and size(null) = -1
    under legacy sizeOfNull, which used to shrink the bigram total by
    one per null-text row.  A corpus with nulls must produce the same
    PMI values as the same corpus with nulls dropped."""
    from tap_airbyte_wrapper_spark.functions.corpus import (
        pmi_collocations)

    rows = [(1, "new york new york new york"),
            (2, "york new york new york new"),
            (3, None), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean = df.filter(F.col("text").isNotNull())
    got = {(r["w1"], r["w2"]): r["pmi"]
           for r in pmi_collocations(df, min_count=2, k=10).collect()}
    want = {(r["w1"], r["w2"]): r["pmi"]
            for r in pmi_collocations(clean, min_count=2,
                                      k=10).collect()}
    assert got == want and got  # non-empty and identical


def test_ks_and_wasserstein_refuse_past_exact_envelope():
    """ADVICE (low): na*nb >= 2^53 leaves the exact-rational envelope;
    the degradation must be an instructive refusal (like
    kruskal_wallis's max_groups), not a silent precision loss."""
    from tap_airbyte_wrapper_spark.operators.stats import (
        _exactness_envelope)

    big = 100_000_000  # 1e8 each -> 1e16 > 2^53
    with pytest.raises(ValueError, match="2\\^53"):
        _exactness_envelope(big, big, "ks_test")
    with pytest.raises(ValueError, match="exact-rational"):
        _exactness_envelope(big, big, "wasserstein_1d")
    _exactness_envelope(90_000_000, 90_000_000, "ks_test")  # inside


def test_drift_report_keeps_latest_not_slowest(spark, tmp_path):
    """ADVICE (low): the report dedup used to order on wall_seconds
    (a duration) so the SLOWEST run won, not the latest.  With the
    written_at stamp, a later verdict supersedes an earlier one even
    when the earlier run was slower."""
    import os

    from tap_airbyte_wrapper_spark.streaming import (
        read_drift_gate_report)

    gate_dir = os.path.join(str(tmp_path), "_drift_gate")
    # older row: slow run, landed=False; newer row: fast run,
    # landed=True — the old ordering would keep the stale verdict
    spark.createDataFrame(
        [(0, 10, 3.5, False, 9.0, 1000.0),
         (0, 10, 0.2, True, 0.5, 2000.0)],
        "batch_id long, n long, psi double, landed boolean, "
        "wall_seconds double, written_at double"
    ).write.mode("append").parquet(gate_dir)
    row = read_drift_gate_report(spark, str(tmp_path)).first()
    assert row["landed"] is True and row["written_at"] == 2000.0


def test_drift_gate_stamps_written_at(spark, tmp_path):
    """End-to-end: the gate itself writes the written_at column."""
    from tap_airbyte_wrapper_spark.streaming import (
        drift_reference_write,
        read_drift_gate_report,
        stream_drift_gate,
    )

    ref = spark.range(200).select(
        (F.col("id") % 10).cast("double").alias("v"))
    ref_path = str(tmp_path / "ref")
    drift_reference_write(ref, "v", ref_path, bins=8)
    src = str(tmp_path / "src")
    ref.write.parquet(src)
    out = str(tmp_path / "out")
    q = stream_drift_gate(
        spark.readStream.schema("v double").parquet(src),
        "v", ref_path, out, str(tmp_path / "ck"),
        available_now=True)
    q.awaitTermination(120)
    rep = read_drift_gate_report(spark, out)
    assert "written_at" in rep.columns
    assert rep.first()["written_at"] is not None
