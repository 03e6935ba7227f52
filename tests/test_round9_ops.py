"""Round-9 tests.

External-ground-truth JPEG decode (breaking the round-8
decode(encode(x)) circularity), codec linearity, tombstone id-column
guard, and the other round-9 verdict items.
"""
from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg_gt")


def _read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        f.readline()  # maxval
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------- JPEG ground truth

GT_CASES = [
    # (fixture stem, max per-pixel diff, mean diff bound)
    ("jpeg_gt_444_q90", 4, 1.0),
    ("jpeg_gt_420_q75", 8, 1.0),
    ("jpeg_gt_420_rst", 12, 1.0),
]


@pytest.mark.parametrize("stem,maxdiff,meandiff", GT_CASES)
def test_decode_matches_libjpeg_ground_truth(stem, maxdiff, meandiff):
    """Fixtures were ENCODED by libjpeg and their reference pixels
    DECODED by libjpeg (scripts/gen_jpeg_fixture.c) — neither side of
    our codec produced them, so complementary encoder/decoder errors
    (swapped Cb/Cr, transposed zigzag in both halves) cannot cancel.
    Ground truth pins libjpeg's exact islow IDCT with pixel-replication
    upsampling (the bitstream does not mandate an upsample filter; we
    replicate, so the reference does too)."""
    from tap_airbyte_wrapper_spark.functions.jpeg import decode_jpeg

    jpg = open(os.path.join(FIXDIR, stem + ".jpg"), "rb").read()
    gt = _read_ppm(os.path.join(FIXDIR, stem + ".ppm"))
    w, h, px = decode_jpeg(jpg)
    assert (w, h) == (gt.shape[1], gt.shape[0]) == (64, 48)
    d = np.abs(px.astype(np.int32) - gt.astype(np.int32))
    assert d.max() <= maxdiff, f"max pixel diff {d.max()} > {maxdiff}"
    assert d.mean() <= meandiff


def test_decode_channel_orientation_not_swapped():
    """The pattern is chroma-asymmetric by construction: the left half
    ramps RED, the right half ramps BLUE.  A Cb/Cr swap anywhere in the
    decode path mirrors the two and misses by ~100 per channel."""
    from tap_airbyte_wrapper_spark.functions.jpeg import decode_jpeg

    jpg = open(os.path.join(FIXDIR, "jpeg_gt_420_q75.jpg"), "rb").read()
    _, _, px = decode_jpeg(jpg)
    left = px[:, :32, :].astype(np.float64)
    right = px[:, 32:, :].astype(np.float64)
    assert left[..., 0].mean() > left[..., 2].mean() + 50   # left is red
    assert right[..., 2].mean() > right[..., 0].mean() + 50  # right is blue


def test_decode_scales_linearly():
    """Round-8 advice: unbounded bignum bit buffers made decode
    O(n^2) (256x256 took 15.6 s).  With masked buffers a 256x256
    noise image (worst case for entropy coding) decodes in well under
    2 s and 4x the pixels costs < 8x the time."""
    from tap_airbyte_wrapper_spark.functions.jpeg import (decode_jpeg,
                                                          encode_jpeg)

    rng = np.random.default_rng(0)
    times = {}
    for n in (128, 256):
        img = rng.integers(0, 256, size=(n, n, 3), dtype=np.uint8)
        payload = encode_jpeg(img, quality=75)
        t0 = time.time()
        w, h, _ = decode_jpeg(payload)
        times[n] = time.time() - t0
        assert (w, h) == (n, n)
    assert times[256] < 2.0
    assert times[256] < 8 * max(times[128], 0.05)


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a one-component scan is non-interleaved (1 data unit
    per MCU).  A grayscale stream whose SOF carries 2x2 sampling
    factors must decode identically to the 1x1 version, not interleave
    4 blocks per MCU (which silently decodes garbage)."""
    from tap_airbyte_wrapper_spark.functions.jpeg import (decode_jpeg,
                                                          encode_jpeg)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, quality=90))
    # patch the single SOF0 component's h/v byte from 0x11 to 0x22
    i = payload.find(b"\xff\xc0")
    assert i >= 0
    hv_at = i + 4 + 6 + 1  # marker(2) len(2) prec(1) dims(4) ncomp(1) id(1)
    assert payload[hv_at] == 0x11
    payload[hv_at] = 0x22
    w0, h0, base = decode_jpeg(bytes(encode_jpeg(img, quality=90)))
    w1, h1, patched = decode_jpeg(bytes(payload))
    assert (w0, h0) == (w1, h1) == (40, 24)
    assert np.array_equal(base, patched)


# ------------------------------------------- bitext: guard + IVF-fed path

def test_cosine_topk_many_queries_guard_raises(spark):
    """Round-8 advice: the many-query exact scorer driver-collects the
    query side; a corpus-sized 'query' frame must raise with the IVF
    routing hint, not silently OOM the driver."""
    from tap_airbyte_wrapper_spark.functions.similarity import (
        _cosine_topk_many_queries)

    corpus = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"))
    queries = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(3), F.rand(4)).alias("embedding"))
    with pytest.raises(ValueError, match="max_query_cells.*ivf"):
        _cosine_topk_many_queries(corpus, queries, "vec_id", "embedding",
                                  "__q", 2, max_query_cells=100)
    # under the guard it still runs
    ok = _cosine_topk_many_queries(corpus, queries.limit(3), "vec_id",
                                   "embedding", "__q", 2)
    assert ok.count() == 6


def test_bitext_mine_ivf_matches_bruteforce(spark):
    """The corpus-x-corpus path the bitext docstring promises: IVF
    candidate generation feeding the same margin/mutual-best tail.
    With n_probe == n_clusters IVF search is exhaustive, so the mined
    pairs must equal the brute-force method exactly on a planted
    parallel corpus (disjoint id spaces; clustered so IVF cells are
    meaningful)."""
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import bitext_mine

    rng = np.random.default_rng(7)
    # 3 clusters of parallel sentence pairs + per-side noise
    centers = rng.standard_normal((3, 8))
    src_rows, tgt_rows = [], []
    for i in range(30):
        c = centers[i % 3]
        v = c + 0.05 * rng.standard_normal(8)
        w = c + 0.05 * rng.standard_normal(8)
        src_rows.append((i, [float(x) for x in v]))
        tgt_rows.append((1000 + i, [float(x) for x in w]))
    src = spark.createDataFrame(
        src_rows, "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        tgt_rows, "vec_id long, embedding array<double>")

    exact = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
             for r in bitext_mine(src, tgt, k=4, threshold=1.0).collect()}
    ivf = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
           for r in bitext_mine(src, tgt, k=4, threshold=1.0,
                                method="ivf", n_clusters=4,
                                n_probe=4).collect()}
    assert len(exact) > 0
    assert ivf == exact
    # reduced probes still returns a subset-quality result, no driver
    # collect either way
    few = bitext_mine(src, tgt, k=4, threshold=1.0, method="ivf",
                      n_clusters=4, n_probe=1)
    assert few.count() <= len(exact) + 5  # sanity: bounded output


# ----------------------------------------------- video header-only probes

VIDDIR = os.path.join(os.path.dirname(__file__), "fixtures", "video")


def test_video_metadata_mp4_fixture():
    from tap_airbyte_wrapper_spark.functions import video_metadata

    got = video_metadata(open(os.path.join(VIDDIR, "tiny.mp4"), "rb").read())
    assert got == {"container": "mp4", "duration_s": 12.345, "width": 640,
                   "height": 360, "video_codec": "avc1",
                   "n_video_tracks": 1, "n_audio_tracks": 1}


@pytest.mark.parametrize("name,container,codec", [
    ("tiny.mkv", "matroska", "V_MPEG4/ISO/AVC"),
    ("tiny.webm", "webm", "V_VP9"),
])
def test_video_metadata_matroska_fixtures(name, container, codec):
    from tap_airbyte_wrapper_spark.functions import video_metadata

    got = video_metadata(open(os.path.join(VIDDIR, name), "rb").read())
    assert got == {"container": container, "duration_s": 7.5, "width": 320,
                   "height": 240, "video_codec": codec,
                   "n_video_tracks": 1, "n_audio_tracks": 1}


def test_video_metadata_degrades_and_rejects():
    from tap_airbyte_wrapper_spark.functions import video_metadata

    mp4 = open(os.path.join(VIDDIR, "tiny.mp4"), "rb").read()
    # moov truncated away: container recognized, stream fields null
    head = video_metadata(mp4[:20])
    assert head["container"] == "mp4" and head["width"] is None
    assert video_metadata(None) is None
    assert video_metadata(b"\x00" * 64) is None
    jpg = open(os.path.join(FIXDIR, "jpeg_gt_444_q90.jpg"), "rb").read()
    assert video_metadata(jpg) is None  # not a video container


def test_video_metadata_roundtrips_mp4_stub():
    from tap_airbyte_wrapper_spark.functions import mp4_stub, video_metadata

    got = video_metadata(mp4_stub(1920, 1080, 63500, codec="hvc1"))
    assert (got["width"], got["height"]) == (1920, 1080)
    assert got["duration_s"] == 63.5
    assert got["video_codec"] == "hvc1"
    assert got["n_video_tracks"] == 1 and got["n_audio_tracks"] == 0


def test_with_media_metadata_fills_video_meta(spark):
    """The round-9 'done' bar: with_media_metadata fills dims/duration
    for video assets from header probes alone (and image dims for
    image assets) into the bundle's meta map."""
    from tap_airbyte_wrapper_spark.functions import with_media_metadata

    mp4 = open(os.path.join(VIDDIR, "tiny.mp4"), "rb").read()
    png_like = open(os.path.join(FIXDIR, "jpeg_gt_420_q75.jpg"),
                    "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(png_like)), (3, b"junk")],
        "id long, payload binary")
    out = {r.id: r.media_bundle
           for r in with_media_metadata(df, "payload", "video/mp4")
           .collect()}
    meta1 = out[1]["meta"]
    assert meta1["container"] == "mp4"
    assert meta1["duration_s"] == "12.345"
    assert meta1["width"] == "640" and meta1["height"] == "360"
    assert meta1["video_codec"] == "avc1"
    meta2 = out[2]["meta"]  # image header probe fallback
    assert meta2 == {"width": "64", "height": "48"}
    assert out[3]["meta"] == {}
    assert out[1]["media_hash"] is not None and out[1]["size_bytes"] > 0


# ------------------------------------------- novelty index delete/compact

def test_novelty_index_delete_matches_rebuilt_reference(spark, tmp_path):
    """Round-8 'What's missing #3': per-doc deletion without rebuild.
    The posting schema records every (gram, contributor) pair, so after
    deleting doc 2 the probe must equal batch ngram_novelty against
    the reference REBUILT without doc 2 — including the sharp case of
    a gram doc 2 SHARED with a surviving doc (stays seen) vs a gram
    UNIQUE to doc 2 (becomes novel)."""
    from tap_airbyte_wrapper_spark.functions import (
        ngram_novelty, novelty_index_delete, novelty_index_write,
        novelty_probe)

    ref = spark.createDataFrame(
        [(1, "a b c d e"),            # holds gram "a b c" etc.
         (2, "a b c q r s"),          # shares "a b c" with doc 1;
                                      # "q r s" is unique to doc 2
         (3, "m n o p")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, "a b c x"),            # gram "a b c" seen via doc 1
         (101, "q r s x"),            # only doc 2 held "q r s"
         (102, "m n o")],
        "doc_id long, text string")
    novelty_index_write(ref, "nv9d", str(tmp_path / "idx"), n=3,
                        n_buckets=2)
    novelty_index_delete(
        spark.createDataFrame([(2,)], "doc_id long"),
        "nv9d", str(tmp_path / "idx"))

    got = {r.doc_id: r for r in
           novelty_probe(batch, "nv9d", str(tmp_path / "idx")).collect()}
    want = {r.doc_id: r for r in
            ngram_novelty(batch, ref.filter("doc_id != 2"),
                          n=3).collect()}
    assert set(got) == set(want)
    for d in got:
        assert (got[d].n_grams, got[d].n_seen, got[d].novelty) == \
            (want[d].n_grams, want[d].n_seen, want[d].novelty), d
    # the sharp cases explicitly
    assert got[100].n_seen == 1      # shared gram survives doc 2's removal
    assert got[101].n_seen == 0      # doc-2-unique gram is novel again
    for t in ("nv9d_grams", "nv9d_removed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_novelty_index_compact_folds_and_revives(spark, tmp_path):
    """Compact folds replay-duplicated append rows and removed
    contributors into a fresh index; a removed id can then be
    re-appended (the one-way-until-compact contract)."""
    from tap_airbyte_wrapper_spark.functions import (
        novelty_index_append, novelty_index_compact,
        novelty_index_delete, novelty_index_write, novelty_probe)

    ref = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s")], "doc_id long, text string")
    delta = spark.createDataFrame(
        [(3, "x y z w")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, "a b c"), (101, "x y z"), (102, "p q r")],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    novelty_index_write(ref, "nv9c", path, n=3, n_buckets=2)
    novelty_index_append(delta, "nv9c", path)
    novelty_index_append(delta, "nv9c", path)   # replay: duplicate rows
    novelty_index_delete(
        spark.createDataFrame([(2,)], "doc_id long"), "nv9c", path)

    before = {r.doc_id: r.n_seen
              for r in novelty_probe(batch, "nv9c", path).collect()}
    assert before == {100: 1, 101: 1, 102: 0}

    dst = str(tmp_path / "idx2")
    novelty_index_compact(spark, "nv9c", path, "nv9c2", dst)
    rows = spark.table("nv9c2_grams")
    assert rows.count() == rows.distinct().count()   # duplicates folded
    assert not spark.catalog.tableExists("nv9c2_removed")
    after = {r.doc_id: r.n_seen
             for r in novelty_probe(batch, "nv9c2", dst).collect()}
    assert after == before
    # revive doc 2 post-compact
    novelty_index_append(
        ref.filter("doc_id = 2"), "nv9c2", dst)
    revived = {r.doc_id: r.n_seen
               for r in novelty_probe(batch, "nv9c2", dst).collect()}
    assert revived == {100: 1, 101: 1, 102: 1}
    for t in ("nv9c_grams", "nv9c_removed", "nv9c2_grams",
              "nv9c2_removed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_novelty_probe_exact_under_shared_batch_owner(spark, tmp_path):
    """The exactness the posting schema buys over round 8's min-owner
    scheme: a gram whose MIN contributor is in the probing batch but
    that another reference doc also holds must still count as seen.
    (Batch doc id 1 re-probes; doc 5 also holds 'a b c'.)"""
    from tap_airbyte_wrapper_spark.functions import (
        novelty_index_write, novelty_probe)

    ref = spark.createDataFrame(
        [(1, "a b c z1 z2"), (5, "a b c y1 y2")],
        "doc_id long, text string")
    novelty_index_write(ref, "nv9e", str(tmp_path / "idx"), n=3,
                        n_buckets=2)
    batch = ref.filter("doc_id = 1")   # replayed member of the corpus
    got = novelty_probe(batch, "nv9e", str(tmp_path / "idx")).first()
    # doc 1's grams: "a b c", "b c z1", "c z1 z2" — only "a b c" is
    # held by someone else; min-owner would have scored n_seen = 0.
    assert got.n_grams == 3 and got.n_seen == 1
    spark.sql("DROP TABLE IF EXISTS nv9e_grams")
    spark.sql("DROP TABLE IF EXISTS nv9e_removed")


# ------------------------------- corpus_diff -> index maintenance E2E

def test_corpus_diff_drives_bm25_maintenance(spark, tmp_path):
    """The story the round-8 docstrings told, proven end-to-end
    (round-9 verdict ask #6): corpus_diff(old, new) feeds
    bm25_index_sync — added/changed REPLACE, removed DELETE — and
    search over the maintained index equals search over a from-scratch
    index built on the new corpus."""
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_search, bm25_index_sync, bm25_index_write, corpus_diff)

    old = spark.createDataFrame(
        [(1, "spark shuffles data across executors"),
         (2, "catalyst optimizes the logical plan"),
         (3, "parquet stores columns with statistics"),
         (4, "watermarks bound late streaming data")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "spark shuffles data across executors"),        # unchanged
         (2, "catalyst rewrites and optimizes query plans"),  # changed
         (4, "WATERMARKS   bound late streaming data"),       # cosmetic
         (5, "broadcast joins avoid shuffling small tables")],  # added
        "doc_id long, text string")                           # 3 removed

    path = str(tmp_path / "live")
    bm25_index_write(old, "bm9_live", path)
    diff = corpus_diff(old, new)
    statuses = {r.doc_id: r.status for r in diff.collect()}
    assert statuses == {1: "unchanged", 2: "changed", 3: "removed",
                        4: "unchanged", 5: "added"}
    bm25_index_sync(new, diff, "bm9_live", path)

    fresh_path = str(tmp_path / "fresh")
    bm25_index_write(new, "bm9_fresh", fresh_path)

    queries = spark.createDataFrame(
        [(1, "spark shuffles columns"), (2, "optimizes query plans"),
         (3, "parquet statistics"), (4, "broadcast small tables")],
        "query_id long, query_text string")
    got = sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank) for r in
        bm25_index_search(spark, "bm9_live", queries, path, k=3)
        .collect())
    want = sorted(
        (r.query_id, r.doc_id, r.bm25, r.rank) for r in
        bm25_index_search(spark, "bm9_fresh", queries, fresh_path, k=3)
        .collect())
    assert got == want
    # the removed doc is really gone from results
    assert not any(d == 3 for _, d, _s, _r in got)
    for t in ("bm9_live", "bm9_fresh"):
        for suf in ("_postings", "_doclen", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suf}")


# ------------------------------------------------ annotator agreement

def test_cohen_kappa_textbook_values(spark):
    """The classic 2x2 worked example: po=0.7, pe=0.5, kappa=0.4 —
    hand-computed, so a formula error can't hide behind the shared
    Spark/oracle implementation."""
    from tap_airbyte_wrapper_spark.operators import cohen_kappa

    rows = ([("yes", "yes")] * 20 + [("no", "no")] * 15
            + [("yes", "no")] * 10 + [("no", "yes")] * 5)
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohen_kappa(df, "a", "b").first()
    assert got.n_items == 50
    assert got.po == 0.7 and got.pe == 0.5 and got.kappa == 0.4


def test_cohen_kappa_null_and_degenerate(spark):
    from tap_airbyte_wrapper_spark.operators import cohen_kappa

    df = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("x", None)], "a string, b string")
    got = cohen_kappa(df, "a", "b").first()
    assert got.n_items == 2          # the null-side row doesn't vote
    assert got.po == 1.0 and got.pe == 1.0
    assert got.kappa is None         # pe == 1: undefined, not 0/0


def test_flesch_reading_ease_hand_computed(spark):
    """'The cat sat. The dog ran.' — 6 words, 2 sentences, 6 vowel
    groups -> 206.835 - 1.015*3 - 84.6*1 = 119.19 (off-scale simple,
    as Flesch says it should be); empty -> null; no terminator ->
    1 sentence."""
    from tap_airbyte_wrapper_spark.functions import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran."), (2, ""), (3, "   "),
         (4, "word another third")],
        "id long, t string")
    out = {r.id: r.f for r in df.select(
        "id", flesch_reading_ease(F.col("t")).alias("f")).collect()}
    assert out[1] == pytest.approx(
        round(206.835 - 1.015 * 3 - 84.6 * 1, 4))
    assert out[2] is None and out[3] is None
    # 3 words, 1 sentence, 5 vowel groups (wo-rd a-no-ther thi-rd):
    # "word"(1) "another"(3: a,o,e) "third"(1) = 5
    assert out[4] == pytest.approx(
        round(206.835 - 1.015 * 3 - 84.6 * (5 / 3), 4))


def test_weighted_kappa_hand_computed(spark):
    """Quadratic weights, 3x3 worked example: vo=5, n=8, ve=88 ->
    kappa = 1 - (5/8)/(88/64) = 6/11.  Linear weights on the same data
    recomputed by hand too; nominal-equivalent check: with 0/1 labels
    quadratic == linear == unweighted cohen."""
    from tap_airbyte_wrapper_spark.operators import (cohen_kappa,
                                                     weighted_kappa)

    rows = [(1, 1), (1, 1), (2, 2), (2, 2), (3, 3), (3, 3),
            (1, 2), (3, 1)]
    df = spark.createDataFrame(rows, "a int, b int")
    quad = weighted_kappa(df, "a", "b", weights="quadratic").first()
    assert quad.n_items == 8
    assert quad.do_ == pytest.approx(round(5 / 8, 6))
    assert quad.de_ == pytest.approx(round(88 / 64, 6))
    assert quad.kappa == pytest.approx(round(6 / 11, 6))
    # linear: vo = 1 + 2 = 3; ve = sum |i-j| a_i b_j
    # a=(3,2,3), b=(3,3,2): 3*(3*1+2*2)+2*(3*1+2*1)+3*(3*2+3*1)=21+10+27=58
    lin = weighted_kappa(df, "a", "b", weights="linear").first()
    assert lin.do_ == pytest.approx(round(3 / 8, 6))
    assert lin.de_ == pytest.approx(round(58 / 64, 6))
    # binary labels: weighted == nominal cohen
    b01 = spark.createDataFrame(
        [(0, 0)] * 20 + [(1, 1)] * 15 + [(0, 1)] * 10 + [(1, 0)] * 5,
        "a int, b int")
    wk = weighted_kappa(b01, "a", "b", weights="quadratic").first().kappa
    ck = cohen_kappa(b01, "a", "b").first().kappa
    assert wk == pytest.approx(ck)
    with pytest.raises(ValueError, match="linear|quadratic"):
        weighted_kappa(df, "a", "b", weights="cubic")


def test_spearman_correlation_monotone_and_reversed(spark):
    from tap_airbyte_wrapper_spark.operators import spearman_correlation

    import math
    rows = [(i, float(i), math.exp(i / 5.0)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    # monotone nonlinear: Pearson < 1 but Spearman exactly 1
    got = spearman_correlation(df, "x", "y", "id").first()
    assert got.n_items == 40 and got.rho == 1.0
    rev = df.withColumn("y", -F.col("y"))
    assert spearman_correlation(rev, "x", "y", "id").first().rho == -1.0
    # nulls on either side drop
    holes = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, None, 3.0), (3, 3.0, 1.0), (4, 4.0, 4.0)],
        "id long, x double, y double")
    assert spearman_correlation(holes, "x", "y", "id").first().n_items == 3


def test_fleiss_kappa_hand_computed(spark):
    """3 items x 3 raters: P = {1, 1/3, 1}, p_bar = 7/9; totals A=5
    B=4 -> pe = 41/81; kappa = 22/40 = 0.55."""
    from tap_airbyte_wrapper_spark.operators import fleiss_kappa

    rows = [(1, "A"), (1, "A"), (1, "A"),
            (2, "A"), (2, "A"), (2, "B"),
            (3, "B"), (3, "B"), (3, "B")]
    df = spark.createDataFrame(rows, "item long, label string")
    got = fleiss_kappa(df, "item", "label").first()
    assert got.n_items == 3 and got.n_raters == 3
    assert got.p_bar == pytest.approx(round(7 / 9, 6))
    assert got.pe == pytest.approx(round(41 / 81, 6))
    assert got.kappa == pytest.approx(round(22 / 40, 6))


def test_krippendorff_alpha_hand_computed(spark):
    """Exact worked example: items A=[1,1], B=[1,2], C=[2,2,2], D=[1]
    (excluded, single rating).  n..=7, o_cc sum = 5, n_c = (3,4) ->
    alpha = 1 - 6*2/(49-25) = 0.5 exactly."""
    from tap_airbyte_wrapper_spark.operators import krippendorff_alpha

    rows = [("A", 1), ("A", 1), ("B", 1), ("B", 2),
            ("C", 2), ("C", 2), ("C", 2), ("D", 1)]
    df = spark.createDataFrame(rows, "item string, label int")
    got = krippendorff_alpha(df, "item", "label").first()
    assert got.n_items == 3 and got.n_ratings == 7    # D excluded
    assert got.alpha == pytest.approx(0.5)
    assert got.do_ == pytest.approx(round(2 / 7, 6))
    assert got.de_ == pytest.approx(round(24 / 42, 6))


def test_krippendorff_alpha_edges(spark):
    from tap_airbyte_wrapper_spark.operators import krippendorff_alpha

    # perfect agreement across ragged raters -> alpha = 1
    perfect = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "x"), ("B", "y"), ("B", "y")],
        "item string, label string")
    assert krippendorff_alpha(perfect, "item", "label").first().alpha \
        == 1.0
    # single category everywhere -> expected disagreement 0 -> null
    degen = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("B", "x"), ("B", "x")],
        "item string, label string")
    got = krippendorff_alpha(degen, "item", "label").first()
    assert got.alpha is None and got.de_ == 0.0


def test_fleiss_kappa_rejects_ragged_and_single(spark):
    from tap_airbyte_wrapper_spark.operators import fleiss_kappa

    ragged = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A")], "item long, label string")
    with pytest.raises(ValueError, match="between 1 and 2"):
        fleiss_kappa(ragged, "item", "label")
    single = spark.createDataFrame(
        [(1, "A"), (2, "B")], "item long, label string")
    with pytest.raises(ValueError, match=">= 2 ratings"):
        fleiss_kappa(single, "item", "label")


# ------------------------------------------------ phrase blocklist (AC)

def test_aho_corasick_suffix_outputs():
    """The classic AC worked example: patterns he/she/his/hers over
    'ushers' must fire he, she, AND hers — 'he' only via the failure
    link's output set, which is where naive trie matchers go wrong."""
    from tap_airbyte_wrapper_spark.functions.text import _AhoCorasick

    ac = _AhoCorasick(["he", "she", "his", "hers"])
    assert ac.match_ids("ushers") == {0, 1, 3}
    assert ac.match_ids("this") == {2}
    assert ac.match_ids("xyz") == set()


def test_phrase_hits_and_blocklist_gate(spark):
    from tap_airbyte_wrapper_spark.functions import (
        phrase_blocklist_filter, phrase_hits)

    df = spark.createDataFrame(
        [(1, "We apply a HASH JOIN then a merge"),
         (2, "totally clean document"),
         (3, "slow query meets hash join daily"),
         (4, None)],
        "doc_id long, text string")
    hits = {r.doc_id: r.h for r in df.select(
        "doc_id",
        phrase_hits(F.col("text"),
                    ["hash join", "slow query"]).alias("h")).collect()}
    assert hits[1] == ["hash join"]          # case-insensitive
    assert hits[2] == [] and hits[4] == []   # clean + null-safe
    assert hits[3] == ["hash join", "slow query"]  # sorted, both

    clean = phrase_blocklist_filter(df, ["hash join", "slow query"])
    assert {r.doc_id for r in clean.collect()} == {2, 4}
    flagged = phrase_blocklist_filter(
        df, ["hash join", "slow query"], keep="flagged")
    assert {r.doc_id for r in flagged.collect()} == {1, 3}
    with pytest.raises(ValueError, match="empty phrase list"):
        phrase_hits(F.col("text"), [])


def test_phrase_hits_large_blocklist_scales():
    """The reason AC exists: 5000 patterns cost the same text scan as
    5 (a contains-chain would be 1000x the passes).  Driver-side
    micro-check on the raw automaton."""
    import time

    from tap_airbyte_wrapper_spark.functions.text import _AhoCorasick

    small = _AhoCorasick(["zq%d xx" % i for i in range(5)])
    big = _AhoCorasick(["zq%d xx" % i for i in range(5000)])
    text = "lorem ipsum " * 2000 + "zq42 xx"
    t0 = time.time()
    assert small.match_ids(text) == set()
    t_small = time.time() - t0
    t0 = time.time()
    assert big.match_ids(text) == {42}
    t_big = time.time() - t0
    assert t_big < 20 * max(t_small, 0.001)  # same order, not 1000x


# ------------------------------------------------ streaming media gate

def test_stream_media_gate_mixed_modalities(spark, tmp_path):
    """One gate over a mixed image/video/audio ingest stream:
    thresholds apply per-modality (an image has no duration to check;
    audio has no width), unprobeable payloads drop, survivors carry
    the probe map, and a fresh-checkpoint re-drain reproduces the
    same survivors (stateless)."""
    from tap_airbyte_wrapper_spark.functions import mp4_stub
    from tap_airbyte_wrapper_spark.functions.audio_meta import wav_stub
    from tap_airbyte_wrapper_spark.streaming import stream_media_gate

    jpg = open(os.path.join(FIXDIR, "jpeg_gt_444_q90.jpg"), "rb").read()
    rows = [
        (1, bytearray(mp4_stub(1920, 1080, 30000))),   # HD, 30s: pass
        (2, bytearray(mp4_stub(320, 180, 30000))),     # too small: drop
        (3, bytearray(mp4_stub(1920, 1080, 990000))),  # too long: drop
        (4, bytearray(wav_stub(44100, 2, 44100 * 5))),  # audio: pass
        (5, bytearray(wav_stub(8000, 1, 8000 * 5))),   # low rate: drop
        (6, bytearray(jpg)),                           # 64x48 image: pass
        (7, b"\x00unrecognized container\x00"),        # unprobeable: drop
    ]
    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "clean")
    schema = "asset_id long, media binary"
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def drain(ckpt):
        q = stream_media_gate(
            spark.readStream.schema(schema).parquet(str(src)),
            "asset_id", "media", out, checkpoint=str(tmp_path / ckpt),
            image={"min_width": 64, "min_height": 48},
            video={"min_width": 1280, "max_duration_s": 60.0},
            audio={"min_sample_rate": 16000})
        q.awaitTermination(120)

    drain("ck1")
    kept = {r.asset_id: r.media_meta
            for r in spark.read.parquet(out).collect()}
    assert sorted(kept) == [1, 4, 6]
    assert kept[1]["video_codec"] == "avc1"      # audit map rides along
    assert kept[4]["sample_rate"] == "44100"
    assert kept[6] == {"width": "64", "height": "48"}
    drain("ck2")   # stateless replay
    assert sorted(r.asset_id
                  for r in spark.read.parquet(out).collect()) == [1, 4, 6]
    assert spark.read.parquet(out + "/_gate_stats").count() >= 1


# ------------------------------------------------ persisted simhash index

@pytest.fixture()
def sh_index(spark, tmp_path):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import simhash_index_write

    corpus = spark.createDataFrame([
        Row(doc_id=i,
            text=("spark shuffles data across wide stages %d and the "
                  "optimizer prunes columns early while joins broadcast "
                  "small dimension tables " % i) * 3)
        for i in range(30)
    ])
    path = str(tmp_path / "sh_idx")
    simhash_index_write(corpus, "sh9_t", path, "doc_id", "text",
                        chunks=4, max_hamming=3, n_buckets=4)
    yield spark, corpus, path
    for t in ("sh9_t_segs", "sh9_t_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_simhash_delta_finds_corpus_and_delta_dups(sh_index):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import simhash_dedup_delta

    spark, corpus, path = sh_index
    base7 = corpus.filter("doc_id = 7").first().text
    delta = spark.createDataFrame([
        Row(doc_id=1007, text=base7.replace("prunes", "trims", 1)),
        Row(doc_id=1008, text="totally new payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 4),
        Row(doc_id=1009, text=("totally new payload alpha beta gamma "
                               "delta epsilon zeta eta theta " * 4)
            .replace("zeta", "zetta", 1)),
        Row(doc_id=1010, text="unrelated short text about parquet row "
                              "groups and footer statistics"),
    ])
    out = simhash_dedup_delta(delta, "sh9_t", path, "doc_id", "text")
    rows = out.collect()
    kinds = {(r.id_a, r.id_b): (r.kind, r.hamming) for r in rows}
    assert kinds[(1007, 7)][0] == "corpus"
    assert kinds[(1008, 1009)][0] == "delta"
    assert all(r.hamming <= 3 for r in rows)
    ids = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert 1010 not in ids


def test_simhash_delta_agrees_with_batch_operator(sh_index):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import (
        simhash_dedup_delta, simhash_near_dup_pairs)

    spark, corpus, path = sh_index
    base7 = corpus.filter("doc_id = 7").first().text
    delta = spark.createDataFrame([
        Row(doc_id=1007, text=base7.replace("prunes", "trims", 1)),
        Row(doc_id=1008, text="totally new payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 4),
    ])
    inc = {(r.id_a, r.id_b, r.hamming) for r in simhash_dedup_delta(
        delta, "sh9_t", path, "doc_id", "text").collect()
        if r.id_a != r.id_b}
    both = corpus.unionByName(delta)
    batch = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.hamming)
        if max(r.id_a, r.id_b) >= 1000 and min(r.id_a, r.id_b) < 1000
        else (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            both, "doc_id", "text", max_hamming=3, chunks=4).collect()
        if r.id_a >= 1000 or r.id_b >= 1000}
    assert inc == batch


def test_simhash_delta_replay_self_match(sh_index):
    """A replayed doc (already in the index) matches ITSELF at hamming
    0 — the self-match the streaming gates key replay determinism on,
    same contract as the MinHash/fingerprint families."""
    from tap_airbyte_wrapper_spark.functions import simhash_dedup_delta

    spark, corpus, path = sh_index
    replay = corpus.filter("doc_id = 3")
    out = simhash_dedup_delta(replay, "sh9_t", path, "doc_id", "text")
    got = {(r.id_a, r.id_b, r.hamming) for r in out.collect()}
    assert (3, 3, 0) in got


def test_simhash_delta_corpus_side_never_shuffles(sh_index):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import simhash_dedup_delta

    spark, corpus, path = sh_index
    delta = spark.createDataFrame(
        [Row(doc_id=2000, text="some delta content here ok fine")])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = simhash_dedup_delta(delta, "sh9_t", path, "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SelectedBucketsCount" in plan
    # exactly the delta-side exchanges: delta segs -> index bucketing
    # (1), the delta self-join's two sides (2), and the two pair
    # distincts (2) = 5; a corpus-side shuffle would add a sixth
    assert plan.count("Exchange hashpartitioning") <= 5, plan


def test_simhash_index_replace_matches_rebuild(sh_index, tmp_path):
    """After replacing doc 5's content, the delta probe behaves exactly
    as against an index rebuilt from scratch on the edited corpus."""
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import (
        simhash_dedup_delta, simhash_index_replace, simhash_index_write)

    spark, corpus, path = sh_index
    new5 = "completely different content now about streaming watermarks " \
           "and state stores in structured streaming pipelines " * 3
    edited = corpus.withColumn(
        "text", F.when(F.col("doc_id") == 5, F.lit(new5))
        .otherwise(F.col("text")))
    simhash_index_replace(
        edited.filter("doc_id = 5"), "sh9_t", path, "doc_id", "text")

    fresh_path = str(tmp_path / "fresh_idx")
    from tap_airbyte_wrapper_spark.functions import simhash_index_write
    simhash_index_write(edited, "sh9f_t", fresh_path, "doc_id", "text",
                        chunks=4, max_hamming=3, n_buckets=4)
    probe = spark.createDataFrame([
        Row(doc_id=9005, text=new5.replace("state", "status", 1)),
        Row(doc_id=9006,
            text=corpus.filter("doc_id = 5").first().text)])
    got = {(r.id_a, r.id_b, r.hamming, r.kind) for r in simhash_dedup_delta(
        probe, "sh9_t", path, "doc_id", "text").collect()}
    want = {(r.id_a, r.id_b, r.hamming, r.kind) for r in simhash_dedup_delta(
        probe, "sh9f_t", fresh_path, "doc_id", "text").collect()}
    assert got == want
    # the NEW content matches doc 5; the OLD content no longer does
    assert any(a == 9005 and b == 5 for a, b, _h, _k in got)
    assert not any(a == 9006 and b == 5 for a, b, _h, _k in got)
    for t in ("sh9f_t_segs", "sh9f_t_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_simhash_index_rejects_bad_params(spark, tmp_path):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import simhash_index_write

    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError, match="max_hamming < chunks"):
        simhash_index_write(df, "sh9bad", str(tmp_path / "i"),
                            "doc_id", "text", chunks=4, max_hamming=4)


# ------------------------------------------------ streaming simhash gate

def test_stream_simhash_gate_and_replay(spark, tmp_path):
    """E2E: within-batch hamming twins lose the min-id contest,
    corpus-known docs drop, clean docs land and fold into the index so
    the NEXT batch measures against them; a same-checkpoint-semantics
    re-drain (fresh checkpoint over the same landing data) reproduces
    the survivor set."""
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import simhash_index_write
    from tap_airbyte_wrapper_spark.streaming import stream_simhash_gate

    seed = ("spark executes stages over partitioned data while the "
            "catalyst optimizer rewrites plans and tungsten generates "
            "code for tight loops " * 3)
    corpus = spark.createDataFrame([Row(doc_id=1, text=seed)])
    idx_path = str(tmp_path / "idx")
    simhash_index_write(corpus, "sh9g_t", idx_path, "doc_id", "text",
                        chunks=4, max_hamming=3, n_buckets=2)

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "clean")
    schema = "doc_id long, text string"
    batch1 = spark.createDataFrame([
        Row(doc_id=10, text=seed.replace("tight", "hot", 1)),   # corpus dup
        Row(doc_id=11, text="fresh payload about parquet footers and "
                            "row group statistics pruning scans " * 3),
        Row(doc_id=12, text=("fresh payload about parquet footers and "
                             "row group statistics pruning scans " * 3)
            .replace("pruning", "skipping", 1)),                # twin of 11
    ], schema)
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    def drain(ckpt):
        q = stream_simhash_gate(
            spark.readStream.schema(schema).parquet(str(src)),
            "doc_id", "text", "sh9g_t", idx_path, out,
            checkpoint=str(tmp_path / ckpt))
        q.awaitTermination(120)

    drain("ck1")
    assert sorted(r.doc_id
                  for r in spark.read.parquet(out).collect()) == [11]
    # second batch: near-dup of landed doc 11 must now drop too
    spark.createDataFrame([
        Row(doc_id=20, text=("fresh payload about parquet footers and "
                             "row group statistics pruning scans " * 3)
            .replace("footers", "headers", 1)),
        Row(doc_id=21, text="entirely new thing entirely: watermark "
                            "semantics for late event time data " * 3),
    ], schema).coalesce(1).write.mode("append").parquet(str(src))
    drain("ck1")
    assert sorted(r.doc_id
                  for r in spark.read.parquet(out).collect()) == [11, 21]
    for t in ("sh9g_t_segs", "sh9g_t_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# ----------------------------------- benford / dp counts / confusables

def test_benford_conforming_vs_constant(spark):
    from tap_airbyte_wrapper_spark.operators import benford_deviation

    # exact Benford frequencies planted at n=1000 (counts per digit)
    import math
    counts = [round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)]
    rows = [(float(f"{d}1"),) for d, c in zip(range(1, 10), counts)
            for _ in range(c)]
    good = benford_deviation(
        spark.createDataFrame(rows, "v double"), "v").collect()
    by = {r.digit: r for r in good}
    assert len(by) == 9
    assert by[1].mad < 0.002 and by[1].chi2 < 1.0
    assert by[1].obs_frac == pytest.approx(0.301, abs=0.002)

    # every value starts with 5 -> massive nonconformity
    bad = benford_deviation(
        spark.createDataFrame([(5000.0 + i,) for i in range(500)],
                              "v double"), "v").collect()
    b = {r.digit: r for r in bad}
    assert b[5].obs_frac == 1.0 and b[5].n == 500
    assert b[1].n == 0                      # empty digits materialize
    assert b[1].mad > 0.15 and b[1].chi2 > 100
    # zeros/nulls/negatives: sign ignored, zero excluded
    mixed = benford_deviation(
        spark.createDataFrame([(-300.0,), (0.0,), (None,), (0.07,)],
                              "v double"), "v").collect()
    m = {r.digit: r for r in mixed}
    assert m[3].n == 1 and m[7].n == 1 and m[3].n_values == 2


def test_audit_ops_scan_input_once(spark, tmp_path):
    """The 100 TB contract of the audit family: one corpus scan, full
    stop.  The naive agg-then-crossJoin shapes re-evaluated the scan
    subtree per summary (benford read its input 4x, kappa/alpha up to
    5x before round 9's restructure)."""
    from tap_airbyte_wrapper_spark.operators import (
        benford_deviation, cohen_kappa, fleiss_kappa, krippendorff_alpha)

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(float(100 + i), "x" if i % 2 else "y",
          "x" if i % 3 else "y", i % 5) for i in range(60)],
        "v double, a string, b string, item int").write.parquet(p)
    df = spark.read.parquet(p)

    def scans(out):
        return out._jdf.queryExecution().executedPlan() \
            .toString().count("Scan parquet")

    assert scans(benford_deviation(df, "v")) == 1
    assert scans(cohen_kappa(df, "a", "b")) <= 1   # post-checkpoint: 0
    assert scans(fleiss_kappa(
        spark.read.parquet(p).withColumnRenamed("a", "label"),
        "item", "label")) <= 1
    assert scans(krippendorff_alpha(df, "item", "a")) <= 1
    from tap_airbyte_wrapper_spark.operators import (k_anonymity,
                                                     key_skew_profile)
    assert scans(key_skew_profile(df, ["item"], top=3)) <= 1
    assert scans(k_anonymity(df, ["a", "b"], k=3, top=5)) <= 1


def test_dp_noisy_counts_properties(spark):
    from tap_airbyte_wrapper_spark.operators import dp_noisy_counts

    df = spark.createDataFrame(
        [(f"g{i % 50}",) for i in range(5000)], "g string")
    out = {r.g: r.noisy_n for r in
           dp_noisy_counts(df, ["g"], epsilon=1.0, salt="s1").collect()}
    assert len(out) == 50
    errs = [abs(out[f"g{i}"] - 100) for i in range(50)]
    # Laplace(b=1): mean |noise| = 1; generous bounds
    assert sum(errs) / 50 < 4 and max(errs) < 15
    assert all(v >= 0 for v in out.values())
    # deterministic per salt, different across salts
    again = {r.g: r.noisy_n for r in
             dp_noisy_counts(df, ["g"], epsilon=1.0, salt="s1").collect()}
    assert again == out
    other = {r.g: r.noisy_n for r in
             dp_noisy_counts(df, ["g"], epsilon=1.0, salt="s2").collect()}
    assert other != out
    # smaller epsilon -> more noise
    loose = {r.g: r.noisy_n for r in
             dp_noisy_counts(df, ["g"], epsilon=0.05,
                             salt="s1").collect()}
    assert sum(abs(loose[f"g{i}"] - 100) for i in range(50)) > \
        sum(errs) * 3
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], epsilon=0)


def test_confusables_fold_and_ratio(spark):
    from tap_airbyte_wrapper_spark.functions import (
        confusable_ratio, fingerprint, fold_confusables, phrase_hits)

    evaded = "buy chеаp рills onlinе now"     # Cyrillic е, а, р planted
    clean = "buy cheap pills online now"
    df = spark.createDataFrame(
        [(1, evaded), (2, clean), (3, "просто русский текст здесь")],
        "id long, t string")
    out = {r.id: r for r in df.select(
        "id",
        fold_confusables(F.col("t")).alias("folded"),
        F.round(confusable_ratio(F.col("t")), 3).alias("ratio"),
        fingerprint(fold_confusables(F.col("t"))).alias("fp")).collect()}
    assert out[1].folded == clean
    assert out[1].fp == out[2].fp            # dedup sees through evasion
    assert 0.1 < out[1].ratio < 0.3
    assert out[2].ratio == 0.0
    # real Russian text scores high — pair with script_profile to
    # separate legitimate Cyrillic from evasion (documented contract)
    assert out[3].ratio > 0.3
    # blocklist composition: the folded text now matches the phrase
    hits = df.filter("id = 1").select(
        phrase_hits(fold_confusables(F.col("t")),
                    ["cheap pills"]).alias("h")).first().h
    assert hits == ["cheap pills"]


# ------------------------------------- code fences / slice eval metrics

def test_code_blocks_extraction(spark):
    from tap_airbyte_wrapper_spark.functions import (code_blocks,
                                                     code_fraction)

    md = ("Docs intro.\n```python\nx = 1\ny = 2\n```\nprose middle\n"
          "```\nplain block\n```\ntail")
    df = spark.createDataFrame(
        [(1, md), (2, "no code at all"), (3, "```py\nunclosed fence"),
         (4, None)],
        "id long, t string")
    out = {r.id: r for r in df.select(
        "id", code_blocks(F.col("t")).alias("b"),
        code_fraction(F.col("t")).alias("f")).collect()}
    assert out[1].b == ["x = 1\ny = 2\n", "plain block\n"]
    assert out[1].f == pytest.approx(
        (len("x = 1\ny = 2\n") + len("plain block\n")) / len(md), abs=1e-6)
    assert out[2].b == [] and out[2].f == 0.0
    assert out[3].b == []          # half-open fence: no phantom block
    assert out[4].b is None or out[4].b == []


def test_grouped_eval_metrics_slices(spark):
    """Hand-planted: slice A perfect, slice B has 1 FP + 1 FN of 4;
    overall row aggregates both.  Precision/recall null where the
    denominator vanishes (slice C all-negative)."""
    from tap_airbyte_wrapper_spark.functions import grouped_eval_metrics

    rows = [("A", 1, 1), ("A", 0, 0), ("A", 1, 1), ("A", 0, 0),
            ("B", 1, 1), ("B", 0, 1), ("B", 1, 0), ("B", 0, 0),
            ("C", 0, 0), ("C", 0, 0)]
    df = spark.createDataFrame(rows, "g string, label int, pred int")
    out = {r.g: r for r in grouped_eval_metrics(
        df, "label", "pred", ["g"]).collect()}
    assert set(out) == {"A", "B", "C", "__overall__"}
    assert out["A"].accuracy == 1.0 and out["A"].f1 == 1.0
    assert out["B"].accuracy == 0.5
    assert out["B"].precision == 0.5 and out["B"].recall == 0.5
    assert out["C"].precision is None and out["C"].recall is None
    o = out["__overall__"]
    assert o.n == 10 and o.tp == 3 and o.fp == 1 and o.fn == 1
    assert o.accuracy == 0.8
    with pytest.raises(ValueError, match="non-empty"):
        grouped_eval_metrics(df, "label", "pred", [])


# ------------------------------- simhash compact + streaming blocklist

def test_simhash_index_compact_folds_tombstones(sh_index, tmp_path):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.functions import (
        simhash_dedup_delta, simhash_index_compact, simhash_index_delete)

    spark, corpus, path = sh_index
    simhash_index_delete(
        spark, "sh9_t", path,
        spark.createDataFrame([(4,)], "sid long"))
    probe = corpus.filter("doc_id = 4").withColumn(
        "doc_id", F.lit(9004).cast("long"))
    before = {(r.id_a, r.id_b) for r in simhash_dedup_delta(
        probe, "sh9_t", path, "doc_id", "text").collect()}
    assert (9004, 4) not in before          # deleted: no longer matches

    dst = str(tmp_path / "sh_idx2")
    stats = simhash_index_compact(spark, "sh9_t", path, "sh9c_t", dst)
    assert stats["files_out"] <= stats["files_in"]
    assert not spark.catalog.tableExists("sh9c_t_tombstones")
    segs = spark.table("sh9c_t_segs")
    assert segs.filter("sid = 4").count() == 0   # tombstone folded away
    assert segs.filter("__ver != 0").count() == 0
    after = {(r.id_a, r.id_b) for r in simhash_dedup_delta(
        probe, "sh9c_t", dst, "doc_id", "text").collect()}
    assert after == before
    with pytest.raises(ValueError, match="NEW table"):
        simhash_index_compact(spark, "sh9_t", path, "SH9_T", dst)
    for t in ("sh9c_t_segs", "sh9c_t_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_blocklist_gate_with_fold(spark, tmp_path):
    """Stateless blocklist gate: plain and homoglyph-evaded banned
    phrases both drop (fold on by default); clean docs land."""
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.streaming import stream_blocklist_gate

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "clean")
    schema = "doc_id long, text string"
    spark.createDataFrame([
        Row(doc_id=1, text="totally legitimate prose about spark"),
        Row(doc_id=2, text="click here to buy cheap pills today"),
        Row(doc_id=3, text="click here to buy chеаp рills today"),  # Cyrillic
        Row(doc_id=4, text="another clean doc entirely"),
    ], schema).coalesce(1).write.mode("append").parquet(str(src))
    q = stream_blocklist_gate(
        spark.readStream.schema(schema).parquet(str(src)),
        "doc_id", "text", ["cheap pills", "wire transfer"],
        out, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert sorted(r.doc_id
                  for r in spark.read.parquet(out).collect()) == [1, 4]
    assert spark.read.parquet(out + "/_gate_stats").count() >= 1


# ---------------------------------------- table-level expectations

def test_row_count_and_freshness_expectations(spark):
    """Landing-zone guards: volume band (rows outside the band counted)
    and deterministic freshness (max(ts) must reach a caller-computed
    cutoff — no hidden now()); both ride the same single aggregation
    pass as the row-level rules."""
    from tap_airbyte_wrapper_spark.operators import (Expectation,
                                                     validate_expectations)

    df = spark.createDataFrame(
        [(i, 100 + i, 50 + i) for i in range(20)],
        "id long, ts long, ts2 long")
    ok = {(r.expectation, r.n_violations, r.passed)
          for r in validate_expectations(df, [
              Expectation("id", "not_null"),
              Expectation("*", "row_count_between", lo=10, hi=100),
              Expectation("ts", "max_at_least", lo=119),
          ]).collect()}
    assert ("*:row_count_between", 0, True) in ok
    assert ("ts:max_at_least", 0, True) in ok
    bad = {(r.expectation, r.n_violations, r.passed)
           for r in validate_expectations(df, [
               Expectation("*", "row_count_between", lo=25, hi=100),
               Expectation("ts2", "max_at_least", lo=200),
           ]).collect()}
    assert ("*:row_count_between", 5, False) in bad   # 5 rows short
    assert ("ts2:max_at_least", 1, False) in bad
    # empty table: freshness unprovable -> fail
    empty = spark.createDataFrame([], "id long, ts long")
    got = validate_expectations(empty, [
        Expectation("ts", "max_at_least", lo=1)]).first()
    assert got.n_violations == 1 and not got.passed


def test_sync_gate_accepts_table_level_kinds(spark, tmp_path):
    """The config-driven sync quality gate parses rules generically, so
    the new table-level kinds work from JSON config unchanged: a
    volume band that the batch violates blocks the write in fail
    mode."""
    import pytest as _pytest

    from tap_airbyte_wrapper_spark.sources import SourceError
    from tap_airbyte_wrapper_spark.sync import Engine

    cfg = {
        "source": "dataset_dir",
        "source_config": {"path": "/root/testdata/sf0.001"},
        "streams": ["region"],
        "sink": {"type": "parquet", "path": str(tmp_path / "out"),
                 "mode": "overwrite"},
        "expectations_mode": "fail",
        "expectations": {"region": [
            {"column": "*", "kind": "row_count_between",
             "lo": 1000, "hi": 2000},        # region has 5 rows: violated
        ]},
    }
    with _pytest.raises(SourceError, match="row_count_between"):
        Engine(spark, cfg).sync()
    ok = dict(cfg)
    ok["expectations"] = {"region": [
        {"column": "*", "kind": "row_count_between", "lo": 1, "hi": 100},
        {"column": "r_regionkey", "kind": "max_at_least", "lo": 1},
    ]}
    res = Engine(spark, ok).sync()
    assert res.stream_counts.get("region", 0) == 5


def test_schema_drift_report(spark):
    from tap_airbyte_wrapper_spark.operators import schema_drift_report

    a = spark.createDataFrame([(1, "x", 2.0)],
                              "id long, name string, v double")
    b = spark.createDataFrame([(1, 3, True)],
                              "id long, v int, flag boolean")
    out = {r.column: (r.status, r.old_type, r.new_type)
           for r in schema_drift_report(a, b).collect()}
    assert out == {
        "id": ("unchanged", "bigint", "bigint"),
        "name": ("removed", "string", None),
        "v": ("type_changed", "double", "int"),
        "flag": ("added", None, "boolean"),
    }
    # zero data scans: the plan is a driver-local literal relation
    plan = schema_drift_report(a, b)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan parquet" not in plan and "Scan ExistingRDD" not in plan


# ------------------------------------------------ license detection

def test_detect_license_precedence_and_filter(spark):
    from tap_airbyte_wrapper_spark.functions import (
        detect_license, permissive_license_filter)

    rows = [
        (1, "SPDX-License-Identifier: Apache-2.0\nsome code"),
        # SPDX tag wins over a conflicting header phrase
        (2, "SPDX-License-Identifier: MIT\nGNU General Public License "
            "version 3 mentioned in prose"),
        (3, "Licensed under the Apache License, Version 2.0..."),
        (4, "Permission is hereby granted, free of charge, to anyone"),
        (5, "Redistribution and use in source and binary forms are ok "
            "as long as Neither the name of X is used"),   # BSD-3
        (6, "Redistribution and use in source and binary forms only"),
        (7, "This program comes under the GNU General Public License, "
            "version 3 or later"),
        (8, "no license information at all"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.lic for r in df.select(
        "id", detect_license(F.col("t")).alias("lic")).collect()}
    assert got[1] == "apache-2.0" and got[2] == "mit"
    assert got[3] == "apache-2.0" and got[4] == "mit"
    assert got[5] == "bsd-3-clause" and got[6] == "bsd-2-clause"
    assert got[7] == "gpl-3.0"
    assert got[8] is None and got[9] is None

    kept = {r.id for r in permissive_license_filter(df, "t").collect()}
    assert kept == {1, 2, 3, 4, 5, 6}        # gpl + unlicensed drop
    loose = {r.id for r in permissive_license_filter(
        df, "t", keep_unlicensed=True).collect()}
    assert loose == {1, 2, 3, 4, 5, 6, 8, 9}


# ------------------------------------------------ dataset card

def test_dataset_card_planted(spark):
    from tap_airbyte_wrapper_spark.functions import dataset_card

    en = ("the quick brown fox and the lazy dog of the farm is to be "
          "seen running through fields " * 3)
    rows = ([(i, en, "s1") for i in range(4)]            # 4 exact dups
            + [(10, "le chat est sur le toit et les oiseaux", "s2"),
               (11, "zz qq ww", "s2")])                  # fr + und
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    card = {(r.section, r.metric): r.value
            for r in dataset_card(df).collect()}
    assert card[("volume", "n_docs")] == 6.0
    assert card[("volume", "n_sources")] == 2.0
    assert card[("dedup", "exact_dup_frac")] == pytest.approx(
        round(1 - 3 / 6, 6))                      # 4 copies -> 1 distinct
    assert card[("language", "frac_en")] == pytest.approx(round(4 / 6, 6))
    assert card[("language", "frac_fr")] == pytest.approx(round(1 / 6, 6))
    assert card[("language", "frac_und")] == pytest.approx(round(1 / 6, 6))
    assert 0.0 <= card[("quality", "min")] <= card[("quality", "avg")] <= 1
    assert len(card) == 16
    # the one-scan contract
    plan = dataset_card(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


# ------------------------------------------------ mojibake repair

def test_fix_mojibake_round_trips(spark):
    from tap_airbyte_wrapper_spark.functions import fix_mojibake

    clean = "café résumé naïve — don’t"
    single = clean.encode("utf-8").decode("cp1252")          # cafÃ© ...
    # strict cp1252 can't even REPRESENT a double encoding (0x9D is
    # unmapped); latin-1 (full 256-byte map) is how it happens in the
    # wild — the repair's fallback order handles both
    double = single.encode("utf-8").decode("latin-1")
    latin = "café".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(1, single), (2, double), (3, clean), (4, "plain ascii"),
         (5, latin), (6, None)],
        "id long, t string")
    out = {r.id: r.f for r in df.select(
        "id", fix_mojibake(F.col("t")).alias("f")).collect()}
    assert out[1] == clean
    assert out[2] == clean            # two passes unwind double encoding
    assert out[3] == clean            # already-clean text untouched
    assert out[4] == "plain ascii"
    assert out[5] == "café"
    assert out[6] is None


def test_fix_mojibake_leaves_ambiguous_text_alone(spark):
    """Legitimate text that merely CONTAINS a suspicious bigram must
    not be 'repaired' into garbage: the candidate is accepted only
    when it strictly reduces marker count."""
    from tap_airbyte_wrapper_spark.functions import fix_mojibake

    # Portuguese: 'nÃo' is real mojibake of 'não', but 'Âmbito' with a
    # capital  at word start is legitimate; repair must fix the first
    # and leave a marker-free repaired form
    legit = "o Âmbito da questão"   # clean Portuguese, has Â marker
    df = spark.createDataFrame([(1, legit)], "id long, t string")
    got = df.select(fix_mojibake(F.col("t")).alias("f")).first().f
    # encode('cp1252').decode('utf-8') of this string FAILS (Â followed
    # by 'm' is not a valid UTF-8 sequence), so the original survives
    assert got == legit


def test_media_condition_unprovable_threshold_fails(spark):
    """A video whose container is recognized but whose dims are not
    parseable (moov-at-end head) cannot PROVE it meets a resolution
    floor — it must fail the rule, not pass by default; with no video
    rules it passes (modality unconstrained)."""
    from pyspark.sql import functions as F

    from tap_airbyte_wrapper_spark.functions import mp4_stub
    from tap_airbyte_wrapper_spark.streaming import (
        media_admission_condition)

    full = mp4_stub(1920, 1080, 5000)
    headless = full[:20]     # ftyp only: container known, no stream info
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, bytearray(headless))],
        "id long, media binary")
    from tap_airbyte_wrapper_spark.functions.multimodal import (
        probe_media_meta)
    probed = df.withColumn("m", probe_media_meta(F.col("media")))
    strict = {r.id for r in probed.filter(media_admission_condition(
        F.col("m"), video={"min_width": 1280})).collect()}
    assert strict == {1}
    # headless head has n_video_tracks=0 -> classified video, and with
    # no video rules it passes
    open_gate = {r.id for r in probed.filter(media_admission_condition(
        F.col("m"))).collect()}
    assert open_gate == {1, 2}
    with pytest.raises(ValueError, match="unknown media rule"):
        media_admission_condition(F.col("m"), video={"min_wdth": 1})


# --------------------------------------------------- tombstone id-col guard

def test_record_tombstones_selects_id_col_by_name(spark, tmp_path):
    """Round-8 advice: a multi-column ids frame must tombstone the
    NAMED id column, not silently columns[0]; ambiguous frames raise."""
    from tap_airbyte_wrapper_spark.functions import _maint

    name = "t9_tomb_guard"
    spark.sql(f"DROP TABLE IF EXISTS {name}_tombstones")
    ids = spark.createDataFrame(
        [("textA", "doc1"), ("textB", "doc2")], ["text", "doc_id"])
    _maint.record_tombstones_table(
        spark, name, str(tmp_path / "idx"), ids, "doc_id")
    got = {r[0] for r in
           spark.table(f"{name}_tombstones").select("doc_id").collect()}
    assert got == {"doc1", "doc2"}

    bad = spark.createDataFrame([("x", "y")], ["a", "b"])
    with pytest.raises(ValueError, match="none is 'doc_id'"):
        _maint.record_tombstones_table(
            spark, name, str(tmp_path / "idx"), bad, "doc_id")
    spark.sql(f"DROP TABLE IF EXISTS {name}_tombstones")
