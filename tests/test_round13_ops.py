"""Round-13 additions.

- timing-sig index algorithm-version stamp (round-12 ADVICE medium):
  a sig_kind='timing' index written by an older signature algorithm
  must REFUSE probes/appends instead of silently comparing
  incompatible hamming spaces.
"""

import json

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------
# timing-sig algorithm version stamp (ADVICE medium)
# ---------------------------------------------------------------------

def test_timing_index_meta_records_sig_version(spark, tmp_path):
    """The persisted sig_kind='timing' meta carries the algorithm
    version + window_samples; the window-kind meta does not (its
    params n_windows/window/stride already pin the algorithm)."""
    from tap_airbyte_wrapper_spark.fsutil import read_text
    from tap_airbyte_wrapper_spark.functions import (
        media_sig_index_write, mp3_stub)
    from tap_airbyte_wrapper_spark.functions.multimodal import (
        TIMING_SIG_VERSION, TIMING_SIG_WINDOW_SAMPLES)

    corpus = spark.createDataFrame(
        [(1, mp3_stub(120, essence_seed=1)),
         (2, mp3_stub(90, essence_seed=2))], "id long, m binary")
    p_t = str(tmp_path / "tix")
    p_w = str(tmp_path / "wix")
    for t in ("tix", "wix"):
        spark.sql(f"DROP TABLE IF EXISTS {t}_segs")
        spark.sql(f"DROP TABLE IF EXISTS {t}_tombstones")
    media_sig_index_write(corpus, "tix", p_t, "id", "m",
                          sig_kind="timing")
    media_sig_index_write(corpus, "wix", p_w, "id", "m")
    mt = json.loads(read_text(spark, p_t + "/_index_meta.json"))
    mw = json.loads(read_text(spark, p_w + "/_index_meta.json"))
    assert mt["timing_sig_version"] == TIMING_SIG_VERSION
    assert mt["window_samples"] == TIMING_SIG_WINDOW_SAMPLES
    assert "timing_sig_version" not in mw


def test_timing_index_refuses_stale_sig_algorithm(spark, tmp_path):
    """Probe AND append against a timing index whose recorded
    algorithm version differs from the running code raise instead of
    silently missing every duplicate (round-12 ADVICE): the v1 sigs
    on disk and the v2 sigs computed for the delta live in unrelated
    hamming spaces, so 'no matches' would be indistinguishable from
    'no duplicates'."""
    from tap_airbyte_wrapper_spark.fsutil import read_text, write_text
    from tap_airbyte_wrapper_spark.functions import (
        media_dedup_delta, media_sig_index_append,
        media_sig_index_write, mp3_stub)

    corpus = spark.createDataFrame(
        [(1, mp3_stub(120, essence_seed=1))], "id long, m binary")
    path = str(tmp_path / "stale")
    spark.sql("DROP TABLE IF EXISTS stale_segs")
    spark.sql("DROP TABLE IF EXISTS stale_tombstones")
    media_sig_index_write(corpus, "stale", path, "id", "m",
                          sig_kind="timing")
    delta = spark.createDataFrame(
        [(11, mp3_stub(120, essence_seed=7))], "id long, m binary")
    # sanity: current-version index probes fine and finds the twin
    pairs = {(r["id_a"], r["id_b"]) for r in
             media_dedup_delta(delta, "stale", path, "id",
                               "m").collect()}
    assert pairs == {(11, 1)}
    # tamper: pretend the index was written by the v1 algorithm
    meta = json.loads(read_text(spark, path + "/_index_meta.json"))
    meta["timing_sig_version"] = 1
    meta["window_samples"] = None
    write_text(spark, path + "/_index_meta.json", json.dumps(meta))
    with pytest.raises(ValueError, match="algorithm version"):
        media_dedup_delta(delta, "stale", path, "id", "m")
    with pytest.raises(ValueError, match="algorithm version"):
        media_sig_index_append(delta, "stale", path, "id", "m")
    # a pre-stamp index (keys absent entirely) is also refused
    for k in ("timing_sig_version", "window_samples"):
        meta.pop(k, None)
    write_text(spark, path + "/_index_meta.json", json.dumps(meta))
    with pytest.raises(ValueError, match="algorithm version"):
        media_dedup_delta(delta, "stale", path, "id", "m")
