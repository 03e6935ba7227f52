"""Round-8 operator contracts: df-ordered asymmetric prefix filtering
for containment_pairs (the round-7 scale-killer fix) and persisted-index
delete/replace maintenance."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------

def test_ngram_novelty_fractions_and_edges(spark):
    from tap_airbyte_wrapper_spark.functions import ngram_novelty

    ref = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string")  # grams: abc bcd cde
    cur = spark.createDataFrame(
        [(10, "a b c d e"),          # fully seen -> novelty 0
         (11, "x y z w"),            # fully novel -> novelty 1
         (12, "a b c q r s"),        # 1 of 4 grams seen -> 0.75
         (13, "a b"),                # < n words: no grams -> novelty 1.0
         (14, "")],                  # empty -> novelty 1.0
        "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_novelty(cur, ref, n=3).collect()}
    assert len(out) == 5
    assert out[10].novelty == 0.0 and out[10].n_seen == 3
    assert out[11].novelty == 1.0 and out[11].n_seen == 0
    assert out[12].n_grams == 4 and out[12].novelty == pytest.approx(0.75)
    assert out[13].n_grams == 0 and out[13].novelty == 1.0
    assert out[14].n_grams == 0 and out[14].novelty == 1.0
    # broadcast flag: identical output
    out_b = {r.doc_id: r.novelty for r in ngram_novelty(
        cur, ref, n=3, broadcast_reference=True).collect()}
    assert out_b == {k: v.novelty for k, v in out.items()}


# ---------------------------------------------------------------------
# novelty index + streaming novelty gate
# ---------------------------------------------------------------------

def test_novelty_probe_equals_batch_ngram_novelty(spark, tmp_path):
    """The incremental probe against the persisted gram index returns
    exactly what the batch ngram_novelty computes against the same
    reference docs."""
    from tap_airbyte_wrapper_spark.functions import (
        ngram_novelty, novelty_index_write, novelty_probe)

    ref = spark.createDataFrame(
        [(i, f"shared prefix tokens w{i} x{i} y{i} z{i}")
         for i in range(10)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, "shared prefix tokens w3 x3 brand new tail"),
         (101, "completely novel content nothing shared here"),
         (102, "x")], "doc_id long, text string")
    novelty_index_write(ref, "nvx8", str(tmp_path / "idx"), n=3,
                        n_buckets=4)
    got = sorted(novelty_probe(batch, "nvx8", str(tmp_path / "idx"))
                 .collect(), key=lambda r: r.doc_id)
    want = sorted(ngram_novelty(batch, ref, n=3).collect(),
                  key=lambda r: r.doc_id)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_novelty_probe_plan_shape(spark, tmp_path):
    """The probe reads the bucketed gram table (no cartesian; the
    batch-ids exclusion is a broadcast anti-join) — same zero-corpus-
    shuffle family as the fingerprint/BM25 probes whose bucket
    co-location the bucketing suite pins."""
    from tap_airbyte_wrapper_spark.functions import (
        novelty_index_write, novelty_probe)

    ref = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(20)],
        "doc_id long, text string")
    novelty_index_write(ref, "nvp8", str(tmp_path / "idx"), n=3,
                        n_buckets=4)
    batch = spark.createDataFrame(
        [(100, "w1 x1 y1 fresh")], "doc_id long, text string")
    plan = novelty_probe(batch, "nvp8", str(tmp_path / "idx")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "nvp8_grams" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_stream_novelty_gate_and_replay(spark, tmp_path):
    """Gate E2E: novel docs land and fold their grams in; a later doc
    stitched from an earlier batch's spans is dropped; replaying the
    in-flight batch (Structured Streaming's at-least-once contract —
    same batch boundaries) reproduces the same survivor set thanks to
    the owner-exclusion probe."""
    from pyspark.sql import Row
    from tap_airbyte_wrapper_spark.functions import novelty_index_write
    from tap_airbyte_wrapper_spark.streaming import stream_novelty_gate

    src = tmp_path / "in"
    src.mkdir()
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "clean")
    schema = "doc_id long, text string"
    novelty_index_write(
        spark.createDataFrame([], schema), "nvg8", idx, n=3, n_buckets=4)

    b1_text = "alpha beta gamma delta epsilon zeta eta theta"
    spark.createDataFrame(
        [Row(doc_id=1, text=b1_text),
         Row(doc_id=2, text="one two three four five six")],
        schema).coalesce(1).write.mode("append").parquet(str(src))

    def drain(ck):
        q = stream_novelty_gate(
            spark.readStream.schema(schema).parquet(str(src)),
            "doc_id", "text", "nvg8", idx, out,
            checkpoint=str(tmp_path / ck), min_novelty=0.5)
        q.awaitTermination(120)

    drain("ck1")
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out).collect()) == [1, 2]

    # batch 2: doc 3 is stitched from doc 1's spans (novelty ~0),
    # doc 4 is genuinely new
    spark.createDataFrame(
        [Row(doc_id=3, text=b1_text + " theta eta"),
         Row(doc_id=4, text="seven eight nine ten eleven twelve")],
        schema).coalesce(1).write.mode("append").parquet(str(src))
    drain("ck1")
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4]

    # same-checkpoint no-op re-drain: output unchanged
    drain("ck1")
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out).collect()) == [1, 2, 4]

    # at-least-once replay at the batch level (the real Structured
    # Streaming contract: the in-flight batch re-runs with the SAME
    # boundaries): re-probing batch 2 after its grams were folded
    # keeps exactly the first run's survivors — doc 4's own folded
    # grams are owner-excluded, doc 3 still loses to doc 1's grams
    from tap_airbyte_wrapper_spark.functions import novelty_probe

    b2 = spark.createDataFrame(
        [Row(doc_id=3, text=b1_text + " theta eta"),
         Row(doc_id=4, text="seven eight nine ten eleven twelve")],
        schema)
    re_probe = {r.doc_id: r.novelty for r in novelty_probe(
        b2, "nvg8", idx).collect()}
    assert re_probe[4] == 1.0           # own grams excluded on replay
    assert re_probe[3] < 0.5            # still mostly doc 1's spans


# ---------------------------------------------------------------------
# baseline JPEG codec
# ---------------------------------------------------------------------

def _gradient_rgb(h=40, w=56):
    import numpy as np

    xx, yy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    return np.stack([xx, yy, (xx + yy) / 2], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_rgb_and_gray():
    """Encode -> decode reproduces smooth images within tight DCT
    quantization error, exact dims, correct channel counts; noise
    images (worst case for JPEG) stay bounded at high quality."""
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import decode_jpeg, encode_jpeg

    img = _gradient_rgb()
    enc = encode_jpeg(img, quality=92)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    w, h, dec = decode_jpeg(enc)
    assert (w, h, dec.shape) == (56, 40, (40, 56, 3))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    gray = img[:, :, 0]
    wg, hg, decg = decode_jpeg(encode_jpeg(gray, quality=92))
    assert decg.shape == (40, 56, 1)
    assert np.abs(decg[:, :, 0].astype(int) - gray.astype(int)).max() <= 3

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    _, _, decn = decode_jpeg(encode_jpeg(noise, quality=95))
    assert np.abs(decn.astype(int) - noise.astype(int)).max() <= 40


def test_jpeg_non_multiple_of_8_dims_and_quality_ladder():
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import decode_jpeg, encode_jpeg

    img = _gradient_rgb(h=13, w=21)   # forces edge-replicate padding
    w, h, dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert (w, h) == (21, 13) and dec.shape == (13, 21, 3)
    # lower quality -> smaller file, larger (but sane) error
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    _, _, dlo = decode_jpeg(lo)
    assert np.abs(dlo.astype(int) - img.astype(int)).mean() < 30


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 (the web's dominant layout) exercises the decoder's
    multi-block MCU interleave and chroma upsample path: exact dims on
    non-multiple-of-16 images, luma near-exact, chroma within
    subsampling loss."""
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import decode_jpeg, encode_jpeg

    img = _gradient_rgb(h=37, w=53)   # forces partial MCUs both axes
    enc = encode_jpeg(img, quality=92, subsampling="420")
    w, h, dec = decode_jpeg(enc)
    assert (w, h) == (53, 37) and dec.shape == (37, 53, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3
    # 420 should be smaller than 444 at the same quality
    assert len(enc) < len(encode_jpeg(img, quality=92, subsampling="444"))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="422")


def test_jpeg_unsupported_process_rejected_with_clear_error():
    """Since round 10 SOF2 (progressive) DECODES (see
    test_round10_ops); the unsupported boundary moved to lossless /
    hierarchical / arithmetic processes, which must still raise
    ValueError naming the process — never a silent wrong decode.  A
    baseline stream merely RELABELED as SOF2 is a malformed
    progressive frame (its single scan claims Ss=0..Se=63) and must
    also fail loudly, not decode garbage."""
    import struct

    from tap_airbyte_wrapper_spark.functions import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(_gradient_rgb(16, 16), quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(enc))
    enc[i + 1] = 0xC2  # baseline scan under a progressive header
    with pytest.raises(ValueError, match="Se=0|single-component"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    assert struct.unpack(">H", bytes(enc[i + 2:i + 4]))[0] > 0  # sanity


def test_jpeg_registered_in_codec_registry_and_spark_path(spark):
    """Without PIL, image/jpeg routes to the baseline decoder through
    the full Spark decode_image mapInPandas path — real dims and a
    pixel checksum, not the fake fallback."""
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import (
        decode_image, encode_jpeg, with_media_metadata)
    from tap_airbyte_wrapper_spark.functions import codecs as _codecs

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: image/* codec outranks the baseline")
    except ImportError:
        pass
    assert _codecs.image_codec_for("image/jpeg") is not None

    payloads = [(i, encode_jpeg(_gradient_rgb(16 + 8 * i, 24),
                                quality=90)) for i in range(3)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    media = with_media_metadata(df, "payload", "image/jpeg")
    out = {r.doc_id: r
           for r in decode_image(media, "media_bundle").collect()}
    assert len(out) == 3
    for i in range(3):
        assert (out[i].width, out[i].height) == (24, 16 + 8 * i)
        assert out[i].channels == 3
        assert out[i].pixel_checksum is not None


# ---------------------------------------------------------------------
# k_anonymity / compression_ratio
# ---------------------------------------------------------------------

def test_k_anonymity_planted(spark):
    from tap_airbyte_wrapper_spark.operators import k_anonymity

    rows = ([("10001", "f")] * 6          # k-anonymous at k=5
            + [("10002", "m")] * 2        # violating (2 < 5)
            + [("10003", "f")])           # violating singleton
    df = spark.createDataFrame(rows, "zip string, gender string")
    out = sorted(k_anonymity(df, ["zip", "gender"], k=5).collect(),
                 key=lambda r: r.rank)
    assert [(r.zip, r.n_rows) for r in out] == [("10003", 1),
                                                ("10002", 2)]
    top = out[0]
    assert top.n_groups == 3 and top.n_violating_groups == 2
    assert top.rows_at_risk == 3
    assert top.risk_frac == pytest.approx(round(3 / 9, 6))
    # fully anonymous table -> empty output
    ok = spark.createDataFrame([("a", "x")] * 5, "zip string, g string")
    assert k_anonymity(ok, ["zip", "g"], k=5).count() == 0


def test_compression_ratio_separates_repeats_from_prose(spark):
    import zlib

    from tap_airbyte_wrapper_spark.functions import compression_ratio

    repeat = "spam " * 200
    prose = ("The quick brown fox jumps over the lazy dog while a "
             "committee debates the merits of lazy evaluation in "
             "distributed systems, concluding nothing in particular.")
    df = spark.createDataFrame(
        [(1, repeat), (2, prose), (3, None), (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: r.cr for r in df.select(
        "doc_id", compression_ratio(F.col("text")).alias("cr")).collect()}
    # exact values: the UDF is plain zlib level 6 over utf-8 bytes
    for doc_id, text in [(1, repeat), (2, prose)]:
        want = len(zlib.compress(text.encode())) / len(text.encode())
        assert out[doc_id] == pytest.approx(want)
    assert out[1] < 0.05 < out[2]     # repeats compress away; prose doesn't
    assert out[3] is None and out[4] is None


# ---------------------------------------------------------------------
# bitext_mine
# ---------------------------------------------------------------------

def test_bitext_mine_margin_beats_hub(spark):
    """The reason margin exists: a HUB vector (close to every query)
    wins on raw cosine for both sources, but its own dense
    neighborhood inflates the denominator — the genuinely-aligned
    pairs win mutual-best margin instead."""
    from tap_airbyte_wrapper_spark.functions import bitext_mine

    src = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(11, [0.6, -0.8, 0.0, 0.0]),    # aligned to 1, far from 2
         (12, [-0.8, 0.6, 0.0, 0.0]),    # aligned to 2, far from 1
         (13, [0.707, 0.707, 0.0, 0.0])],  # hub: cos ~0.707 to BOTH
        "vec_id long, embedding array<double>")
    out = bitext_mine(src, tgt, k=2, threshold=1.0).collect()
    pairs = {(r.src_id, r.tgt_id) for r in out}
    assert pairs == {(1, 11), (2, 12)}
    # the hub actually beat the winners on raw cosine (0.707 > 0.6):
    # margin is what flipped the decision
    for r in out:
        assert r.cos_sim == pytest.approx(0.6, abs=1e-6)
        assert r.margin > 1.0
    assert not any(t == 13 for _, t in pairs)


# ---------------------------------------------------------------------
# corpus_diff
# ---------------------------------------------------------------------

def test_corpus_diff_statuses(spark):
    from tap_airbyte_wrapper_spark.functions import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed"),
         (4, "Same   TEXT  normalized")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed now"),
         (4, "same text normalized"),   # cosmetic whitespace/case only
         (5, "brand new")],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "added"}


# ---------------------------------------------------------------------
# unigram-LM tokenizer training
# ---------------------------------------------------------------------

def _seq_unigram_em(word_freqs, logp, max_len):
    """Sequential reference E-step + M-step (forward-backward expected
    counts), mirroring the distributed implementation's math."""
    import math

    counts = {}
    for w, f in word_freqs.items():
        n = len(w)
        neg = float("-inf")
        alpha = [neg] * (n + 1)
        alpha[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                lp = logp.get(w[j:i])
                if lp is None or alpha[j] == neg:
                    continue
                v = alpha[j] + lp
                if alpha[i] == neg:
                    alpha[i] = v
                else:
                    m = max(alpha[i], v)
                    alpha[i] = m + math.log(
                        math.exp(alpha[i] - m) + math.exp(v - m))
        z = alpha[n]
        if z == neg:
            continue
        beta = [neg] * (n + 1)
        beta[n] = 0.0
        for i in range(n, 0, -1):
            if beta[i] == neg:
                continue
            for j in range(max(0, i - max_len), i):
                lp = logp.get(w[j:i])
                if lp is None:
                    continue
                v = lp + beta[i]
                if beta[j] == neg:
                    beta[j] = v
                else:
                    m = max(beta[j], v)
                    beta[j] = m + math.log(
                        math.exp(beta[j] - m) + math.exp(v - m))
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                lp = logp.get(w[j:i])
                if lp is None or alpha[j] == neg or beta[i] == neg:
                    continue
                c = math.exp(alpha[j] + lp + beta[i] - z)
                counts[w[j:i]] = counts.get(w[j:i], 0.0) + f * c
    return counts


def test_unigram_em_matches_sequential_reference(spark):
    """One distributed E+M step == the sequential forward-backward on
    the same word table and piece distribution."""
    import math

    from tap_airbyte_wrapper_spark.functions.unigram import (
        _estep_udf)

    word_freqs = {"abab": 3, "abc": 2, "cab": 1}
    pieces = ["a", "b", "c", "ab", "ba", "abc"]
    logp = {p: math.log(1.0 / len(pieces)) for p in pieces}

    df = spark.createDataFrame(list(word_freqs.items()),
                               "word string, freq long")
    got_rows = df.select(
        "freq", F.explode(_estep_udf(logp, 3)(F.col("word")))
        .alias("piece", "c")).groupBy("piece").agg(
        F.sum(F.col("freq") * F.col("c")).alias("n")).collect()
    got = {r.piece: r.n for r in got_rows}
    want = _seq_unigram_em(word_freqs, logp, 3)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_train_unigram_learns_frequent_pieces_and_segments(spark):
    from tap_airbyte_wrapper_spark.functions import (
        train_unigram, unigram_segment)

    docs = spark.createDataFrame(
        [(i, "banana bandana cabana " * 3) for i in range(8)],
        "doc_id long, text string")
    model = train_unigram(docs, vocab_size=12, seed_size=60,
                          max_piece_len=4, em_iters=2)
    assert "an" in model.pieces or "ana" in model.pieces or \
        "na" in model.pieces          # a frequent multi-char piece won
    # coverage: every single char of the corpus survives pruning
    for ch in set("banandacab"):
        assert ch in model.pieces
    segged = docs.limit(1).select(
        unigram_segment(F.col("text"), model).alias("toks")).collect()[0]
    assert "".join(segged.toks) == ("banana" + "bandana" + "cabana") * 3
    assert any(len(t) > 1 for t in segged.toks)  # multi-char pieces used


def test_unigram_save_load_roundtrip(spark, tmp_path):
    from tap_airbyte_wrapper_spark.functions import (
        UnigramModel, load_unigram, save_unigram)

    m = UnigramModel(pieces={"a": -0.5, "ab": -1.25})
    save_unigram(m, spark, str(tmp_path / "uni"))
    m2 = load_unigram(spark, str(tmp_path / "uni"))
    assert m2.pieces == m.pieces


# ---------------------------------------------------------------------
# key_skew_profile
# ---------------------------------------------------------------------

def test_key_skew_profile_planted(spark):
    from tap_airbyte_wrapper_spark.operators import key_skew_profile

    rows = [(99,)] * 50 + [(k,) for k in range(10)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_profile(df, ["k"], top=3).collect()
    assert [r.k for r in out] == [99, 0, 1]       # heaviest first, id ties
    top = out[0]
    assert top.n_rows == 50 and top.rank == 1
    assert top.n_keys == 11
    assert top.share == pytest.approx(round(50 / 60, 6))
    # mean = 60/11; skew_ratio = 50/(60/11); rec_salt levels max to mean
    assert top.skew_ratio == pytest.approx(round(50 * 11 / 60, 4))
    assert top.rec_salt == 10
    assert top.p50_rows == 1.0 and top.max_rows == 50
    # approx_percentile is rank-exact here (11 keys << accuracy):
    # discrete element at rank ceil(0.99*11) = 11 -> 50
    assert top.p99_rows == 50.0


# ---------------------------------------------------------------------
# lsh_plan / truncation_recall
# ---------------------------------------------------------------------

def test_lsh_plan_closed_form(spark):
    import math

    from tap_airbyte_wrapper_spark.functions import lsh_plan

    rows = lsh_plan(spark, num_hashes=128,
                    thresholds=(0.5, 0.8)).collect()
    # every factorization of 128, twice (two thresholds)
    assert len(rows) == 8 * 2
    got = {(r.bands, r.threshold): r for r in rows}
    r = got[(32, 0.8)]
    assert r.rows_per_band == 4
    assert r.p_capture == pytest.approx(
        round(1 - (1 - 0.8 ** 4) ** 32, 6))
    assert r.s50 == pytest.approx(round((1 / 32) ** (1 / 4), 6))
    # monotonicity: more bands (fewer rows) -> higher capture at fixed s
    caps = [got[(b, 0.5)].p_capture for b in (1, 2, 4, 8, 16, 32, 64, 128)]
    assert caps == sorted(caps)
    assert math.isclose(got[(128, 0.5)].p_capture, 1 - 0.5 ** 128 + 0,
                        abs_tol=1e-6) or got[(128, 0.5)].p_capture == 1.0


def test_truncation_recall_planted(spark):
    """Vectors whose signal lives in the first 4 coords keep recall 1.0
    under a 4-dim cut; a query whose nearest neighbor differs only in
    the TAIL coords loses it under the cut."""
    from tap_airbyte_wrapper_spark.functions import truncation_recall

    # corpus: 8-dim; ids 1..4 differ in head coords, 5..6 differ only in tail
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (5, [0.5, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (6, [0.5, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    # head-only corpus: truncation is lossless, recall must be 1.0
    head = corpus.filter(F.col("vec_id") <= 3)
    out = {(r.query_id, r.dim): r for r in truncation_recall(
        head, head.filter(F.col("vec_id") == 1), dims=(4,),
        k=2).collect()}
    assert out[(1, 4)].recall_at_k == pytest.approx(1.0)

    q_tail = corpus.filter(F.col("vec_id") == 5)   # tail disambiguates
    out_t = {r.dim: r for r in truncation_recall(
        corpus, q_tail, dims=(4, 8), k=1).collect()}
    # full 8 dims: nearest is 6? no — 5 vs 6 share head, differ in tail;
    # nearest to 5 at full width is 1 or 2 (head-aligned) vs 6 (half
    # mass shared)... assert the audit DETECTS a cut-induced change:
    # at dim=8 the truncated ranking IS the full ranking -> recall 1.0
    assert out_t[8].recall_at_k == pytest.approx(1.0)
    # at dim=4, ids 5 and 6 collapse onto the same prefix as id 1's
    # scaled head, so the top-1 flips away from the full-width winner
    assert out_t[4].recall_at_k <= out_t[8].recall_at_k


# ---------------------------------------------------------------------
# streaming CDC -> index maintenance gates
# ---------------------------------------------------------------------

def _write_change_batch(spark, src, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, _op string, _cursor long"
    ).coalesce(1).write.mode("append").parquet(str(src))


def test_stream_bm25_index_maintenance_matches_fresh_rebuild(
        spark, tmp_path):
    """Drain a changelog (inserts, an update, a delete, and an
    intra-batch insert+update collapse) through the maintenance gate:
    post-stream search must equal BM25 over the final corpus state
    computed from scratch, and a fresh-checkpoint re-drain (full
    at-least-once replay) converges to the same output."""
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_search, bm25_index_write, bm25_topk)
    from tap_airbyte_wrapper_spark.streaming import (
        stream_bm25_index_maintenance)

    src = tmp_path / "changes"
    src.mkdir()
    idx = str(tmp_path / "idx")
    schema = "doc_id long, text string, _op string, _cursor long"
    bm25_index_write(
        spark.createDataFrame([], "doc_id long, text string"),
        "bm25maint", idx, "doc_id", "text", n_buckets=4)

    _write_change_batch(spark, src, [
        (1, "alpha shared body", "insert", 1),
        (2, "gamma body text", "c", 2),
        (3, "first version of three", "insert", 3),
        # intra-batch collapse: 3 is inserted then updated — only the
        # _cursor-latest content may land
        (3, "alpha gamma shared three", "update", 4),
    ])

    def drain(ck):
        q = stream_bm25_index_maintenance(
            spark.readStream.schema(schema).parquet(str(src)),
            "bm25maint", idx, checkpoint=str(tmp_path / ck))
        q.awaitTermination(120)

    drain("ck1")
    _write_change_batch(spark, src, [
        (2, None, "delete", 5),
        (4, "alpha body four", "u", 6),   # update of unseen id = upsert
    ])
    drain("ck1")

    final = spark.createDataFrame(
        [(1, "alpha shared body"),
         (3, "alpha gamma shared three"),
         (4, "alpha body four")], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha shared"), (1, "gamma body")],
        "query_id int, query_text string")
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    want = sorted(bm25_topk(final, queries, k=10).collect(), key=key)
    got = sorted(bm25_index_search(spark, "bm25maint", queries, idx,
                                   k=10).collect(), key=key)
    assert got == want

    # full at-least-once replay: new checkpoint re-applies EVERY batch;
    # tombstone-count liveness converges to the same live generation
    drain("ck2")
    got2 = sorted(bm25_index_search(spark, "bm25maint", queries, idx,
                                    k=10).collect(), key=key)
    assert got2 == want


def test_stream_fingerprint_index_maintenance(spark, tmp_path):
    """Fingerprint maintenance: an updated doc's OLD content stops
    dropping new docs, its NEW content starts; a deleted doc's content
    is readmitted."""
    from tap_airbyte_wrapper_spark.functions import (
        fingerprint_dedup_delta, fingerprint_index_write)
    from tap_airbyte_wrapper_spark.streaming import (
        stream_fingerprint_index_maintenance)

    src = tmp_path / "changes"
    src.mkdir()
    idx = str(tmp_path / "idx")
    schema = "doc_id long, text string, _op string, _cursor long"
    fingerprint_index_write(
        spark.createDataFrame([], "doc_id long, text string"),
        "fpmaint", idx, "doc_id", "text", n_buckets=4)

    _write_change_batch(spark, src, [
        (1, "old content one", "insert", 1),
        (2, "stays unchanged", "insert", 2),
    ])
    q = stream_fingerprint_index_maintenance(
        spark.readStream.schema(schema).parquet(str(src)),
        "fpmaint", idx, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)
    _write_change_batch(spark, src, [
        (1, "new content one", "update", 3),
        (2, None, "delete", 4),
    ])
    q = stream_fingerprint_index_maintenance(
        spark.readStream.schema(schema).parquet(str(src)),
        "fpmaint", idx, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    def survivors(rows):
        return sorted(r.doc_id for r in fingerprint_dedup_delta(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "fpmaint", "doc_id", "text").collect())

    assert survivors([(90, "old content one")]) == [90]   # readmitted
    assert survivors([(91, "new content one")]) == []     # now indexed
    assert survivors([(92, "stays unchanged")]) == [92]   # deleted -> free


# ---------------------------------------------------------------------
# containment_prefix_candidates: bounded on boilerplate, total recall
# ---------------------------------------------------------------------

def _boilerplate_corpus(spark, n_docs=60):
    """Every doc shares one boilerplate phrase (a license-header stand-in
    whose shingles have df == n_docs) plus ~20 unique-content words; doc
    100000 is doc 0's lead quoted verbatim (containment 1.0)."""
    boiler = "all rights reserved by the original author"
    rows = []
    for i in range(n_docs):
        uniq = " ".join(f"u{i}w{j}" for j in range(20))
        rows.append((i, uniq + " " + boiler))
    quote = " ".join(f"u0w{j}" for j in range(10))
    rows.append((100000, quote))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_candidates_bounded_on_universal_shingle(spark):
    """The round-7 scale-killer: a near-universal boilerplate shingle
    (df == n) made the naive full-posting self-join emit ~n^2/2
    candidate rows from that single posting list.  Under the df-ASC
    prefix order the boilerplate shingles sort LAST in every doc and
    never enter a prefix, so candidates stay near-zero — while the
    planted quoted-lead pair (total-recall contract) is still found."""
    from tap_airbyte_wrapper_spark.functions import (
        containment_pairs, containment_prefix_candidates)

    n = 60
    df = _boilerplate_corpus(spark, n)
    cand = containment_prefix_candidates(
        df, "doc_id", "text", n=3, threshold=0.8)
    rows = cand.collect()
    # naive: the df=n boilerplate posting alone yields n*(n-1)/2 = 1770
    assert len(rows) < n          # bounded: no quadratic blowup
    assert (0, 100000) in {(r.id_a, r.id_b) for r in rows}  # recall

    out = {(r.id_a, r.id_b): r for r in containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.8).collect()}
    assert out[(0, 100000)].cont_b_in_a == pytest.approx(1.0)


def test_containment_pairs_equals_bruteforce(spark):
    """Exact-recall check of the prefix-filtered formulation against a
    Python brute force over all pairs, on a random corpus with heavy
    shingle sharing (small vocabulary) — covers the float-ceil boundary
    (t*|S| exactly integer) and the either-direction OR contract."""
    from tap_airbyte_wrapper_spark.functions import containment_pairs

    rng = random.Random(81)
    vocab = [f"t{k}" for k in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 14))))
            for i in range(40)]

    def sh_set(text):
        w = text.lower().split()
        if len(w) >= 3:
            return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
        return {" ".join(w)}

    t = 0.5
    expected = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            sa, sb = sh_set(ta), sh_set(tb)
            c = len(sa & sb)
            if c / len(sa) >= t or c / len(sb) >= t:
                expected[(ia, ib)] = (c / len(sa), c / len(sb))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
           for r in containment_pairs(
               df, "doc_id", "text", n=3, threshold=t).collect()}
    assert set(got) == set(expected)
    for k, (ea, eb) in expected.items():
        assert got[k][0] == pytest.approx(ea)
        assert got[k][1] == pytest.approx(eb)


# ---------------------------------------------------------------------
# BM25 index delete / replace (tombstone maintenance)
# ---------------------------------------------------------------------

def _bm25_corpus(spark, texts):
    return spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")


def _bm25_queries(spark):
    return spark.createDataFrame(
        [(0, "alpha shared"), (1, "gamma body")],
        "query_id int, query_text string")


def test_bm25_index_replace_equals_fresh_rebuild(spark, tmp_path):
    """The re-crawled/edited-document case the append contract
    excludes: replace a doc's text in-place, search must equal BM25
    over a from-scratch index on the EDITED corpus — N, avgdl, df and
    tf all reflect only the live generation."""
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_replace, bm25_index_search, bm25_index_write,
        bm25_topk)

    texts = {i: f"token{i % 5} alpha shared body text w{i}"
             for i in range(30)}
    bm25_index_write(_bm25_corpus(spark, texts), "bm25r8a",
                     str(tmp_path / "idx"), "doc_id", "text",
                     n_buckets=4)
    # re-crawl: docs 3 and 7 changed content (and length)
    texts[3] = "gamma gamma body entirely new content now"
    texts[7] = "alpha gamma shared"
    delta = _bm25_corpus(spark, {3: texts[3], 7: texts[7]})
    from tap_airbyte_wrapper_spark.functions import bm25_index_delete  # noqa
    bm25_index_replace(delta, "bm25r8a", str(tmp_path / "idx"),
                       "doc_id", "text")
    got = bm25_index_search(spark, "bm25r8a", _bm25_queries(spark),
                            str(tmp_path / "idx"), k=10).collect()
    want = bm25_topk(_bm25_corpus(spark, texts), _bm25_queries(spark),
                     k=10).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_bm25_index_delete_then_compact_folds_tombstones(spark, tmp_path):
    """Deleted docs vanish from search results AND from N/avgdl; after
    compact the tombstones fold physically (dst has no tombstone table)
    and search output is unchanged."""
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_compact, bm25_index_delete, bm25_index_search,
        bm25_index_write, bm25_topk)

    texts = {i: f"token{i % 5} alpha shared body text w{i}"
             for i in range(30)}
    bm25_index_write(_bm25_corpus(spark, texts), "bm25r8b",
                     str(tmp_path / "idx"), "doc_id", "text",
                     n_buckets=4)
    dead = [2, 11, 29]
    bm25_index_delete(
        spark, "bm25r8b", str(tmp_path / "idx"),
        spark.createDataFrame([(i,) for i in dead], "doc_id long"))
    kept = {k: v for k, v in texts.items() if k not in dead}
    want = bm25_topk(_bm25_corpus(spark, kept), _bm25_queries(spark),
                     k=10).collect()
    got = bm25_index_search(spark, "bm25r8b", _bm25_queries(spark),
                            str(tmp_path / "idx"), k=10).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)

    stats = bm25_index_compact(spark, "bm25r8b", str(tmp_path / "idx"),
                               "bm25r8bc", str(tmp_path / "idx2"))
    assert stats["files_out"] <= stats["files_in"]
    assert not spark.catalog.tableExists("bm25r8bc_tombstones")
    got2 = bm25_index_search(spark, "bm25r8bc", _bm25_queries(spark),
                             str(tmp_path / "idx2"), k=10).collect()
    assert sorted(got2, key=key) == sorted(want, key=key)


def test_bm25_index_delete_then_append_revives_id(spark, tmp_path):
    """An id deleted and later re-appended is live again at its new
    content — the tombstone-count liveness predicate must keep the NEW
    generation, not resurrect the old one."""
    from tap_airbyte_wrapper_spark.functions import (
        bm25_index_append, bm25_index_delete, bm25_index_search,
        bm25_index_write, bm25_topk)

    texts = {i: f"token{i % 5} alpha shared body text w{i}"
             for i in range(20)}
    bm25_index_write(_bm25_corpus(spark, texts), "bm25r8c",
                     str(tmp_path / "idx"), "doc_id", "text",
                     n_buckets=4)
    bm25_index_delete(
        spark, "bm25r8c", str(tmp_path / "idx"),
        spark.createDataFrame([(5,)], "doc_id long"))
    texts[5] = "gamma body resurrected doc"
    bm25_index_append(_bm25_corpus(spark, {5: texts[5]}), "bm25r8c",
                      "doc_id", "text")
    got = bm25_index_search(spark, "bm25r8c", _bm25_queries(spark),
                            str(tmp_path / "idx"), k=10).collect()
    want = bm25_topk(_bm25_corpus(spark, texts), _bm25_queries(spark),
                     k=10).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


# ---------------------------------------------------------------------
# MinHash / fingerprint / IVF index delete + replace
# ---------------------------------------------------------------------

def test_minhash_index_replace_matches_fresh_rebuild(spark, tmp_path):
    """After replacing a doc's text, delta probes behave exactly as if
    the index had been rebuilt from scratch on the edited corpus: a
    near-dup of the NEW text matches the doc; a near-dup of the OLD
    text no longer does."""
    from tap_airbyte_wrapper_spark.functions import (
        minhash_dedup_delta, minhash_index_replace, minhash_index_write)

    old_text = "the quick brown fox jumps over the lazy dog " * 4
    new_text = "entirely different replacement content body " * 4
    docs = spark.createDataFrame(
        [(1, old_text)] + [(10 + i, f"filler doc w{i} " * 8)
                           for i in range(5)],
        "doc_id long, text string")
    minhash_index_write(docs, "doc_id", "text", "mhr8",
                        str(tmp_path / "idx"), num_hashes=64, bands=16,
                        n_buckets=4)
    minhash_index_replace(
        spark.createDataFrame([(1, new_text)], "doc_id long, text string"),
        "mhr8", str(tmp_path / "idx"), "doc_id", "text")

    probe_new = spark.createDataFrame(
        [(100, new_text + " tail")], "doc_id long, text string")
    hits = minhash_dedup_delta(probe_new, "mhr8", str(tmp_path / "idx"),
                               "doc_id", "text", threshold=0.5).collect()
    assert any(r.id_b == 1 and r.kind == "corpus" for r in hits)

    probe_old = spark.createDataFrame(
        [(101, old_text + " tail")], "doc_id long, text string")
    ghosts = minhash_dedup_delta(probe_old, "mhr8", str(tmp_path / "idx"),
                                 "doc_id", "text", threshold=0.5).collect()
    assert not any(r.id_b == 1 for r in ghosts)  # old generation is dead


def test_minhash_index_delete_then_compact_folds(spark, tmp_path):
    from tap_airbyte_wrapper_spark.functions import (
        minhash_dedup_delta, minhash_index_compact, minhash_index_delete,
        minhash_index_write)

    text = "shared content that will be deleted from corpus " * 4
    docs = spark.createDataFrame(
        [(1, text), (2, "unrelated filler body " * 8)],
        "doc_id long, text string")
    minhash_index_write(docs, "doc_id", "text", "mhd8",
                        str(tmp_path / "idx"), num_hashes=64, bands=16,
                        n_buckets=4)
    minhash_index_delete(spark, "mhd8", str(tmp_path / "idx"),
                         spark.createDataFrame([(1,)], "doc_id long"))
    probe = spark.createDataFrame(
        [(50, text + " tail")], "doc_id long, text string")
    assert not minhash_dedup_delta(
        probe, "mhd8", str(tmp_path / "idx"), "doc_id", "text",
        threshold=0.5).filter(F.col("id_b") == 1).count()

    minhash_index_compact(spark, "mhd8", str(tmp_path / "idx"),
                          "mhd8c", str(tmp_path / "idx2"))
    assert not spark.catalog.tableExists("mhd8c_tombstones")
    assert not minhash_dedup_delta(
        probe, "mhd8c", str(tmp_path / "idx2"), "doc_id", "text",
        threshold=0.5).filter(F.col("id_b") == 1).count()


def test_fingerprint_index_delete_readmits_content(spark, tmp_path):
    """A removed doc's fingerprint must stop dropping future docs with
    the same content; re-appending keeps working afterwards."""
    from tap_airbyte_wrapper_spark.functions import (
        fingerprint_dedup_delta, fingerprint_index_append,
        fingerprint_index_delete, fingerprint_index_write)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "other content")],
        "doc_id long, text string")
    fingerprint_index_write(docs, "fpr8", str(tmp_path / "idx"),
                            "doc_id", "text", n_buckets=4)
    dup = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string")
    assert fingerprint_dedup_delta(dup, "fpr8", "doc_id",
                                   "text").count() == 0  # dropped: dup of 1
    fingerprint_index_delete(spark, "fpr8", str(tmp_path / "idx"),
                             spark.createDataFrame([(1,)], "fid long"))
    survivors = fingerprint_dedup_delta(dup, "fpr8", "doc_id", "text")
    assert [r.doc_id for r in survivors.collect()] == [100]  # readmitted
    fingerprint_index_append(survivors, "fpr8", "doc_id", "text")
    # replay self-match: the survivor matches ITSELF and is kept
    assert [r.doc_id for r in fingerprint_dedup_delta(
        dup, "fpr8", "doc_id", "text").collect()] == [100]


def test_ivf_replace_and_delete(spark, tmp_path):
    """ivf_replace swaps a vector in-place: queries near the NEW vector
    find the id at ~1.0 similarity, the OLD vector is unfindable, and
    compaction folds the tombstones with unchanged search output."""
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import (
        ivf_build, ivf_compact, ivf_load, ivf_replace, ivf_search)

    rng = np.random.default_rng(8)
    dim = 16
    base = [(i, (rng.normal(size=dim) / 10
                 + np.eye(dim)[i % dim]).tolist())
            for i in range(60)]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    ivf_build(corpus, n_clusters=4, train_sample=60, path=path)

    new_vec = (np.eye(dim)[3] * 5).tolist()
    ivf_replace(spark, path,
                spark.createDataFrame([(7, new_vec)],
                                      "vec_id long, embedding array<double>"))
    idx = ivf_load(spark, path)
    q = spark.createDataFrame([(999, new_vec)],
                              "vec_id long, embedding array<double>")
    hits = ivf_search(idx, q, k=3, n_probe=4).collect()
    assert hits[0].vec_id == 7 and hits[0].cos_sim == pytest.approx(1.0)
    # the id appears exactly once (old generation dead, not duplicated)
    assert sum(1 for r in ivf_search(idx, q, k=60, n_probe=4).collect()
               if r.vec_id == 7) == 1

    stats = ivf_compact(spark, path, str(tmp_path / "ivf2"))
    assert stats["files_out"] <= stats["files_in"]
    from tap_airbyte_wrapper_spark.fsutil import exists
    assert not exists(spark, str(tmp_path / "ivf2") + "/tombstones")
    idx2 = ivf_load(spark, str(tmp_path / "ivf2"))
    got2 = ivf_search(idx2, q, k=3, n_probe=4).collect()
    assert [r.vec_id for r in got2] == [r.vec_id for r in hits]


def test_containment_blocking_cols_still_partition_pairs(spark):
    """Blocking keys restrict candidate generation to same-block pairs
    under the prefix-filtered path too."""
    from tap_airbyte_wrapper_spark.functions import containment_pairs

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, "en", text), (2, "en", text + " extra tail words here"),
         (3, "de", text)],  # same text, other block: must NOT pair
        "doc_id long, lang string, text string")
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9,
                            blocking_cols=["lang"])
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}
