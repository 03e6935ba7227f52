"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched ``mapInPandas``
transforms, partition sizing — and decode goes through the pluggable
codec registry in :mod:`.codecs`: PCM WAV and 8-bit PNG decode for real
with stdlib-only codecs; PIL registers a generic ``image/*`` decoder
when importable; media types with no registered codec raise
``NotImplementedError`` executor-side unless ``fake=True``, which
substitutes deterministic byte-derived stubs so the pipeline shape
(schemas, batch flow, fan-out cardinality) stays testable for any type.

Design rules for 100 TB of media:
* binary payloads ride a dedicated ``media`` column; never groupBy/join on
  it — all bucketing happens on the md5 ``media_hash``;
* media transforms are ``mapInPandas`` (Arrow batches) so bytes cross the
  JVM<->Python boundary once per batch, not per row;
* frame sampling fans out rows; keep ``spark.sql.files.maxPartitionBytes``
  small enough that post-fanout partitions still fit executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from . import codecs as _codecs


def _payload_and_type(b) -> tuple[bytes, str]:
    """Unpack a media-struct dict or raw binary cell."""
    if isinstance(b, dict):
        return bytes(b.get("media") or b""), b.get("media_type") or ""
    return bytes(b or b""), ""

__all__ = [
    "MEDIA_SCHEMA",
    "as_media",
    "with_media_metadata",
    "probe_media_meta",
    "decode_image",
    "decode_audio",
    "header_dimensions",
    "image_ahash",
    "image_near_dup_pairs",
    "audio_ahash",
    "hamming_near_dup_pairs",
    "media_window_sig",
    "media_container_near_dup_pairs",
    "mp4_asset_payload",
    "resize_image",
    "extract_features",
    "sample_frames",
]

#: Canonical multimodal column bundle: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),       # image/png, audio/wav, ...
        T.StructField("media_hash", T.StringType()),       # md5 hex of payload
        T.StructField("size_bytes", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def as_media(payload: Column, media_type: Column | str) -> Column:
    """Bundle a binary payload into the canonical media struct."""
    mt = F.lit(media_type) if isinstance(media_type, str) else media_type
    return F.struct(
        payload.alias("media"),
        mt.alias("media_type"),
        F.md5(payload).alias("media_hash"),
        F.length(payload).cast("long").alias("size_bytes"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def with_media_metadata(df: DataFrame, binary_col: str, media_type: str,
                        out_col: str = "media_bundle") -> DataFrame:
    """Bundle a binary column into the canonical media struct and fill
    ``meta`` with whatever HEADER-ONLY probes recognize: image
    width/height (PNG/JPEG/GIF header walk) and — for video containers
    — duration/resolution/codec/track counts (MP4 ``moov`` box walk,
    Matroska EBML; see :mod:`.video`).  No pixel or frame decode: the
    probes read container metadata only, which is what makes this the
    asset-inventory pass that can run over 100 TB of media (frame
    decode stays behind the codec registry / out of engine scope)."""
    bundled = df.withColumn(out_col, as_media(F.col(binary_col), media_type))
    probed = probe_media_meta(F.col(out_col).getField("media"))
    merged = F.map_concat(
        F.col(out_col).getField("meta"),
        F.map_filter(probed, lambda _, v: v.isNotNull()))
    return bundled.withColumn(
        out_col,
        F.struct(
            F.col(out_col).getField("media").alias("media"),
            F.col(out_col).getField("media_type").alias("media_type"),
            F.col(out_col).getField("media_hash").alias("media_hash"),
            F.col(out_col).getField("size_bytes").alias("size_bytes"),
            merged.alias("meta"),
        ))


def mp4_stub_payload(width: Column, height: Column,
                     duration_ms: Column) -> Column:
    """Assemble a minimal real MP4 container per row (see
    :func:`.video.mp4_stub`) — deterministic fake payloads for
    exercising the probe/filter plumbing end-to-end with actual
    container bytes.  Arrow pandas UDF, one builder call per row."""
    from .video import mp4_stub

    @pandas_udf("binary")
    def build(w: pd.Series, h: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series([
            mp4_stub(int(a), int(b), int(c))
            for a, b, c in zip(w, h, d)])

    return build(width, height, duration_ms)


def wav_stub_payload(sample_rate: Column, channels: Column,
                     n_frames: Column) -> Column:
    """Per-row RIFF/WAVE headers (see :func:`.audio_meta.wav_stub`) —
    deterministic fake audio assets for probe/gate plumbing tests."""
    from .audio_meta import wav_stub

    @pandas_udf("binary")
    def build(sr: pd.Series, ch: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series([
            wav_stub(int(a), int(b), int(c))
            for a, b, c in zip(sr, ch, n)])

    return build(sample_rate, channels, n_frames)


def probe_media_meta(col: Column) -> Column:
    """``map<string,string>`` of header-probe results for a binary
    payload: video container metadata (``container``/``duration_s``/
    ``width``/``height``/``video_codec``/``n_video_tracks``/
    ``n_audio_tracks``), audio container metadata (``container``/
    ``codec``/``sample_rate``/``channels``/``duration_s``/
    ``duration_exact``), or image dims (``width``/``height``).  Values
    are stringified for the open-ended meta map; absent keys mean no
    probe recognized the container.  Arrow pandas UDF, one pass, zero
    shuffle."""
    from . import audio_meta as _audio
    from . import video as _video

    @pandas_udf("map<string,string>")
    def probe(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            b = bytes(p) if p is not None else None
            entries: dict[str, str] = {}
            got = None
            dims = None
            if b:
                # magic-exact probes first; the MP3 sync scan inside
                # audio_metadata is heuristic, so images must not
                # reach it
                got = _video.video_metadata(b)
                if got is None:
                    dims = _codecs.image_dimensions(b)
                if got is None and dims is None:
                    got = _audio.audio_metadata(b)
            if got is not None:
                entries = {k: str(v) for k, v in got.items()
                           if v is not None}
            elif dims is not None:
                entries = {"width": str(dims[0]),
                           "height": str(dims[1])}
            out.append(entries)
        return pd.Series(out)

    return probe(col)


_IMAGE_SCHEMA = (
    "width int, height int, channels int, pixel_checksum bigint"
)


def decode_image(
    df: DataFrame, media_col: str, fake: bool = False, batch_hint: int = 64
) -> DataFrame:
    """Decode images to (width, height, channels, pixel_checksum).

    Decode is real for any media_type with a registered codec (PNG via
    the stdlib codec; every image family once PIL is importable) —
    ``pixel_checksum`` is the md5-derived checksum of the DECODED pixel
    buffer.  Types with no codec raise NotImplementedError executor-side
    on first batch; ``fake=True`` instead derives deterministic
    dimensions from the payload hash, keeping the Arrow batch path,
    schema, and row cardinality production-shaped.
    """
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(passthrough + list(T.StructType.fromDDL(_IMAGE_SCHEMA)))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[[f.name for f in passthrough]].copy()
            ws, hs, chs, cks = [], [], [], []
            for b in pdf[media_col]:
                payload, mtype = _payload_and_type(b)
                codec = _codecs.image_codec_for(mtype)
                if codec is not None and not fake:
                    w, h, pixels = codec(payload)
                    ws.append(w)
                    hs.append(h)
                    chs.append(pixels.shape[2])
                    d = hashlib.md5(pixels.tobytes()).digest()
                elif fake:
                    d = hashlib.md5(payload).digest()
                    ws.append(16 + d[0] % 64)
                    hs.append(16 + d[1] % 64)
                    chs.append(3)
                else:
                    raise NotImplementedError(
                        f"no image codec registered for {mtype!r} (stdlib "
                        "codec covers image/png; install PIL for other "
                        "formats, or pass fake=True for the deterministic "
                        "stub)"
                    )
                cks.append(int.from_bytes(d[:8], "big", signed=True))
            out["width"] = ws
            out["height"] = hs
            out["channels"] = chs
            out["pixel_checksum"] = cks
            yield out

    return df.mapInPandas(decode, out_schema)


def resize_image(
    df: DataFrame,
    media_col: str,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize images to (width, height): media bundle in, media bundle out
    (payload replaced, metadata updated with target dims).

    With a registered codec the pipeline is real: decode ->
    nearest-neighbor resample (numpy fancy indexing) -> re-encode as
    PNG.  Codec-less types raise executor-side unless ``fake=True``,
    which emits a deterministic byte-stub of plausible size (w*h*3
    capped) so downstream batch shape, hashing, and size accounting are
    still exercised."""
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        passthrough + [T.StructField(media_col, MEDIA_SCHEMA)])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bundles = []
            for b in pdf[media_col]:
                payload, mtype = _payload_and_type(b)
                codec = _codecs.image_codec_for(mtype)
                if codec is not None and not fake:
                    _, _, pixels = codec(payload)
                    resized = _codecs.encode_png(
                        _codecs.nearest_resize(pixels, width, height))
                    out_type = "image/png"
                elif fake:
                    seed = hashlib.md5(payload).digest()
                    size = min(width * height * 3, 4096)
                    resized = (seed * (size // len(seed) + 1))[:size]
                    out_type = mtype or "image/raw"
                else:
                    raise NotImplementedError(
                        f"no image codec registered for {mtype!r} — install "
                        "PIL or pass fake=True for the deterministic stub"
                    )
                bundles.append({
                    "media": resized,
                    "media_type": out_type,
                    "media_hash": hashlib.md5(resized).hexdigest(),
                    "size_bytes": len(resized),
                    "meta": {"width": str(width), "height": str(height)},
                })
            out = pdf[[f.name for f in passthrough]].copy()
            out[media_col] = bundles
            yield out

    return df.mapInPandas(resize, out_schema)


_AUDIO_SCHEMA = "sample_rate int, n_samples bigint, duration_s double, rms double"


def decode_audio(
    df: DataFrame, media_col: str, fake: bool = False
) -> DataFrame:
    """Decode audio to (sample_rate, n_samples, duration_s, rms).

    Same contract as :func:`decode_image`: PCM WAV decodes for real via
    the stdlib codec (rms over actual normalized samples); codec-less
    types raise executor-side unless ``fake=True``, which derives
    deterministic byte-based stand-ins while the Arrow batch path,
    schema, and cardinality stay production-shaped."""
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        passthrough + list(T.StructType.fromDDL(_AUDIO_SCHEMA)))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates = (8000, 16000, 22050, 44100, 48000)
            out = pdf[[f.name for f in passthrough]].copy()
            sr, ns, dur, rms = [], [], [], []
            for b in pdf[media_col]:
                payload, mtype = _payload_and_type(b)
                codec = _codecs.audio_codec_for(mtype)
                if codec is not None and not fake:
                    rate, n, samples = codec(payload)
                    sr.append(rate)
                    ns.append(n)
                    dur.append(n / rate if rate else 0.0)
                    rms.append(float(np.sqrt(np.mean(samples ** 2)))
                               if len(samples) else 0.0)
                elif fake:
                    d = hashlib.md5(payload).digest()
                    rate = rates[d[0] % len(rates)]
                    n = max(1, len(payload)) * 4
                    sr.append(rate)
                    ns.append(n)
                    dur.append(n / rate)
                    # deterministic pseudo-RMS from payload bytes
                    arr = np.frombuffer(payload[:4096].ljust(4, b"\0"),
                                        dtype=np.uint8).astype(np.float64)
                    rms.append(
                        float(np.sqrt(np.mean((arr - 127.5) ** 2)) / 127.5))
                else:
                    raise NotImplementedError(
                        f"no audio codec registered for {mtype!r} (stdlib "
                        "codec covers audio/wav; register soundfile/ffmpeg "
                        "codecs for other formats, or pass fake=True)"
                    )
            out["sample_rate"] = sr
            out["n_samples"] = ns
            out["duration_s"] = dur
            out["rms"] = rms
            yield out

    return df.mapInPandas(decode, out_schema)


def extract_features(
    df: DataFrame, media_col: str, dim: int = 64, fake: bool = False
) -> DataFrame:
    """Media -> embedding (array<float>).  Deterministic md5-seeded fake
    vectors when ``fake=True``; the Arrow/batch shape is production."""
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        passthrough + [T.StructField("feature", T.ArrayType(T.FloatType()))]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction needs a model runtime — pass "
                    "fake=True for the deterministic stub"
                )
            vecs = []
            for b in pdf[media_col]:
                payload = b["media"] if isinstance(b, dict) else bytes(b or b"")
                seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
                vecs.append(
                    np.random.RandomState(seed).standard_normal(dim).astype("float32")
                )
            out = pdf[[f.name for f in passthrough]].copy()
            out["feature"] = vecs
            yield out

    return df.mapInPandas(feats, out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str,
    every_n: int = 10,
    max_frames: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Video -> one row per sampled frame (frame_idx, frame binary).

    Row fan-out is real (xN rows per video); frame bytes are a
    deterministic slice of the payload in fake mode."""
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        passthrough
        + [T.StructField("frame_idx", T.IntegerType()),
           T.StructField("frame", T.BinaryType())]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video demux needs a codec — pass fake=True for the stub"
                )
            rows = []
            for _, row in pdf.iterrows():
                b = row[media_col]
                payload = b["media"] if isinstance(b, dict) else bytes(b or b"")
                n_frames = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for i in range(n_frames):
                    rec = {f.name: row[f.name] for f in passthrough}
                    rec["frame_idx"] = i
                    lo = i * every_n
                    rec["frame"] = payload[lo:lo + every_n]
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(frames, out_schema)


def header_dimensions(col: Column) -> Column:
    """(width, height) struct from HEADER BYTES of a binary image column
    (PNG/JPEG/GIF; null when unrecognized) — no pixel decode.

    The pre-decode gate for multimodal curation at scale: filter
    ``header_dimensions(media).width >= 64`` reads a few dozen bytes
    per asset, and only survivors pay :func:`decode_image`.  Arrow
    pandas UDF (per-element byte parsing has no Catalyst expression),
    one pass, zero shuffle.
    """

    @pandas_udf("struct<width:int, height:int>")
    def dims(payloads: pd.Series) -> pd.DataFrame:
        ws, hs = [], []
        for p in payloads:
            got = _codecs.image_dimensions(bytes(p) if p is not None else None)
            ws.append(got[0] if got else None)
            hs.append(got[1] if got else None)
        return pd.DataFrame({"width": ws, "height": hs})

    return dims(col)


def image_ahash(col: Column, media_type: str = "image/png") -> Column:
    """Perceptual average-hash of a binary image column as a 64-bit
    long: decode -> grayscale -> 8x8 nearest resample -> bit i = pixel
    above the 64-pixel mean.  Visually similar images (recompression,
    mild noise, small edits) land within a few hamming bits, so
    near-dup detection reuses the TEXT sketch machinery unchanged:
    :func:`..dedup.simhash_near_dup_pairs`'s pigeonhole bucketing works
    on any 64-bit hamming space, this column included.

    Arrow pandas UDF over payload bytes (decode is per-element work);
    unsupported/corrupt payloads hash to null and drop out of pairing.
    """

    @pandas_udf("long")
    def ahash(payloads: pd.Series) -> pd.Series:
        codec = _codecs.image_codec_for(media_type)
        out = []
        for p in payloads:
            try:
                _, _, pixels = codec(bytes(p))
            except Exception:
                out.append(None)
                continue
            gray = pixels[..., :3].astype("float64").mean(axis=2) \
                if pixels.ndim == 3 else pixels.astype("float64")
            small = _codecs.nearest_resize(
                gray[..., None].astype("uint8"), 8, 8)[..., 0]
            bits = (small.astype("float64") > small.mean()).flatten()
            v = np.uint64(0)
            for i, bit in enumerate(bits):
                if bit:
                    v |= np.uint64(1) << np.uint64(i)
            iv = int(v)
            out.append(iv if iv < (1 << 63) else iv - (1 << 64))
        return pd.Series(out, dtype="object").astype("Int64")

    return ahash(col)


def hamming_near_dup_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str = "sh",
    max_hamming: int = 6,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit hamming space (text simhash,
    image/audio perceptual hashes, byte-window signatures): pigeonhole
    the hash into ``chunks`` segments (recall guaranteed for hamming <
    chunks), bucket-join, and verify with ``bit_count(xor)``.  Shuffles
    8-byte hashes + ids only — the payloads that produced the hashes
    never move.  ``block_cols`` adds extra equi-join blocking keys
    (e.g. a container-metadata bucket): candidates must then share a
    block AND a hash segment, never a cross-block comparison."""
    chunks = max_hamming + 1 if max_hamming < 15 else 16
    hashed = hashed.select(
        F.col(id_col), F.col(hash_col).alias("sh"), *block_cols
    ).filter(F.col("sh").isNotNull())
    seg_bits = 64 // chunks
    segs = hashed.select(
        id_col, "sh", *block_cols,
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("sh"), i * seg_bits).bitwiseAND(
                    F.lit((1 << seg_bits) - 1))
                for i in range(chunks)
            ])).alias("seg_idx", "seg_val"),
    )
    a = segs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                    "seg_idx", "seg_val", *block_cols)
    b = segs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                    "seg_idx", "seg_val", *block_cols)
    return (
        a.join(b, on=["seg_idx", "seg_val", *block_cols])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    media_col: str,
    max_hamming: int = 6,
    media_type: str = "image/png",
) -> DataFrame:
    """Visual near-duplicate pairs ``(id_a, id_b, hamming)``: average-
    hash each image (one parallel decode pass — the expensive part),
    then :func:`hamming_near_dup_pairs` on the 64-bit hashes."""
    hashed = df.select(
        F.col(id_col), image_ahash(F.col(media_col), media_type).alias("sh"))
    return hamming_near_dup_pairs(hashed, id_col, "sh", max_hamming)


def audio_ahash(col: Column, media_type: str = "audio/wav",
                n_windows: int = 64) -> Column:
    """Perceptual hash of a binary audio column as a 64-bit long:
    decode to mono -> ``n_windows`` equal windows -> bit i = window RMS
    energy above the median window energy.  Gain changes barely move
    the bits (median threshold scales with the signal); silence
    padding, mild noise and re-encoding flip only a few — so
    :func:`hamming_near_dup_pairs` finds re-uploads and trims the same
    way it finds near-identical images.  Undecodable payloads -> null.
    """

    @pandas_udf("long")
    def ahash(payloads: pd.Series) -> pd.Series:
        codec = _codecs.audio_codec_for(media_type)
        out = []
        for p in payloads:
            try:
                _, _, samples = codec(bytes(p))
                if len(samples) < n_windows:
                    samples = np.pad(samples, (0, n_windows - len(samples)))
            except Exception:
                out.append(None)
                continue
            cut = (len(samples) // n_windows) * n_windows
            win = samples[:cut].reshape(n_windows, -1)
            energy = np.sqrt((win.astype("float64") ** 2).mean(axis=1))
            bits = energy > np.median(energy)
            v = 0
            for i, bit in enumerate(bits):
                if bit:
                    v |= 1 << i
            out.append(v if v < (1 << 63) else v - (1 << 64))
        return pd.Series(out, dtype="object").astype("Int64")

    return ahash(col)


# ----------------------------------------- container-level near-dup

#: byte patterns that begin a container's media-essence region; the
#: window signature anchors AFTER the first match so metadata edits
#: (tag rewrites, inserted free/udta boxes, remuxed headers) in front
#: of the essence do not shift the sampled windows.
_ESSENCE_MARKERS = (b"mdat", b"\x1fC\xb6u", b"data")


def media_window_sig(col: Column, n_windows: int = 64,
                     window: int = 64, stride: int = 4096) -> Column:
    """Byte-window signature of a binary media payload as a 64-bit
    long — the DECODE-FREE near-dup sketch for the 100 TB triage
    layer: bit ``i`` is the parity of ``md5`` over the ``window``-byte
    slice at ``anchor + i*stride``, where ``anchor`` is the start of
    the first media-essence region (MP4 ``mdat`` payload, Matroska
    Cluster, RIFF ``data``; offset 0 when none is found).

    What it catches (and what it honestly cannot): re-uploads with
    edited container metadata hash IDENTICALLY (the anchor skips the
    metadata region), tail-trimmed/truncated copies agree on every
    window before the cut (windows past EOF contribute fixed 0 bits),
    and a localized byte edit flips at most the few bits whose windows
    cover it.  A RE-ENCODE rewrites the essence bytes entirely — that
    is the decoded-payload hashes' job (:func:`image_ahash` /
    :func:`audio_ahash`), not this one.

    Unrelated payloads agree per bit with p=0.5, so the expected
    hamming distance is 32 and a <=6 cutoff passes by chance with
    probability ~1e-10.  Arrow pandas UDF, one pass over the first
    ``n_windows*stride`` bytes of essence per asset, zero shuffle;
    null/empty payloads -> null signatures (dropped by the pairing
    machinery)."""

    @pandas_udf("long")
    def sig(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            if p is None or len(p) == 0:
                out.append(None)
                continue
            b = bytes(p)
            anchor = 0
            for marker in _ESSENCE_MARKERS:
                at = b.find(marker)
                if at >= 0:
                    anchor = at + len(marker)
                    break
            v = 0
            for i in range(n_windows):
                off = anchor + i * stride
                win = b[off:off + window]
                if win and (hashlib.md5(win).digest()[-1] & 1):
                    v |= 1 << i
            out.append(v if v < (1 << 63) else v - (1 << 64))
        return pd.Series(out, dtype="object").astype("Int64")

    return sig(col)


def media_container_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    media_col: str,
    max_hamming: int = 6,
    duration_bucket_s: float = 2.0,
    n_windows: int = 64,
    window: int = 64,
    stride: int = 4096,
) -> DataFrame:
    """Video/audio near-duplicate pairs WITHOUT any decode — the
    container-level triage gate: one header probe + one byte-window
    signature pass per asset, candidates blocked on probe metadata
    (container kind, principal dimensions, duration bucket with +-1
    bucket tolerance for trims), verified in the shared 64-bit hamming
    machinery.  Output ``(id_a, id_b, hamming)``.

    Plan shape at scale: the probe and signature are one Arrow pass
    over payload bytes (map-only); everything after shuffles 8-byte
    signatures + ids + a short block key — never payloads.  The
    duration tolerance is the standard neighbor-key trick (each asset
    posts buckets ``b`` and ``b+1``, so assets within one bucket share
    a key) — no range join, no all-pairs; assets whose container no
    probe recognizes are skipped (this gate only speaks container
    formats)."""
    m = F.col("__m")
    probed = (
        df.select(
            F.col(id_col),
            probe_media_meta(F.col(media_col)).alias("__m"),
            media_window_sig(F.col(media_col), n_windows=n_windows,
                             window=window, stride=stride).alias("sh"))
        .withColumn(
            "__kind",
            F.coalesce(m.getItem("container"),
                       F.when(m.getItem("width").isNotNull(),
                              F.lit("image"))))
        .filter(F.col("__kind").isNotNull() & F.col("sh").isNotNull())
        .withColumn(
            "__dims",
            F.concat_ws(
                "x",
                F.coalesce(m.getItem("width"), m.getItem("sample_rate"),
                           F.lit("?")),
                F.coalesce(m.getItem("height"), m.getItem("channels"),
                           F.lit("?"))))
        .withColumn(
            "__db",
            F.floor(F.coalesce(m.getItem("duration_s").cast("double"),
                               F.lit(-1.0))
                    / F.lit(float(duration_bucket_s))).cast("long")))
    blocked = (
        probed.select(
            id_col, "sh", "__kind", "__dims",
            F.explode(F.array(F.col("__db"),
                              F.col("__db") + 1)).alias("__dbk"))
        .withColumn("__blk", F.concat_ws(
            "|", "__kind", "__dims", F.col("__dbk").cast("string")))
        .select(id_col, "sh", "__blk"))
    return hamming_near_dup_pairs(
        blocked, id_col, "sh", max_hamming, block_cols=("__blk",))


def mp4_asset_payload(width: Column, height: Column,
                      duration_ms: Column, essence_seed: Column,
                      remux_tag: Column, trim_bytes: Column,
                      essence_len: int = 2300) -> Column:
    """Per-row deterministic MP4 asset WITH essence bytes — the
    fixture builder for the container-level near-dup gate: a real
    :func:`.video.mp4_stub` header whose trailing ``mdat`` carries an
    md5-chain essence derived from ``essence_seed`` (two rows with the
    same seed are the same recording).  A non-empty ``remux_tag``
    inserts a ``free`` box between ``ftyp`` and ``moov`` (a metadata
    edit in front of the essence — the remuxed re-upload case);
    ``trim_bytes > 0`` cuts that many tail bytes (the truncated-upload
    case).  Arrow pandas UDF, one builder call per row."""
    import struct as _struct

    from .video import mp4_stub

    @pandas_udf("binary")
    def build(w: pd.Series, h: pd.Series, d: pd.Series, s: pd.Series,
              tag: pd.Series, trim: pd.Series) -> pd.Series:
        out = []
        for wi, hi, di, si, ti, tr in zip(w, h, d, s, tag, trim):
            stub = mp4_stub(int(wi), int(hi), int(di))
            body = stub[:-16]  # drop the stock empty mdat box
            if ti:
                junk = str(ti).encode()
                ftyp_len = _struct.unpack(">I", stub[:4])[0]
                free = _struct.pack(">I", 8 + len(junk)) + b"free" + junk
                body = stub[:ftyp_len] + free + stub[ftyp_len:-16]
            ess = bytearray()
            i = 0
            while len(ess) < essence_len:
                ess += hashlib.md5(f"{int(si)}:{i}".encode()).digest()
                i += 1
            payload = body + _struct.pack(
                ">I", 8 + essence_len) + b"mdat" + bytes(ess[:essence_len])
            tr = int(tr)
            out.append(payload[:len(payload) - tr] if tr > 0 else payload)
        return pd.Series(out)

    return build(width, height, duration_ms, essence_seed, remux_tag,
                 trim_bytes)
