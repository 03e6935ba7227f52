"""Round-9 property tests (hypothesis): probe robustness on arbitrary
bytes, matcher equivalence, agreement-statistic invariances.

All driver-side (no SparkSession) — these pin the pure-Python kernels
the Arrow UDFs wrap, so hypothesis can run hundreds of examples in
seconds.
"""
from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

import pytest
# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow


# ------------------------------------------------ probes never crash

@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_video_metadata_never_raises(payload):
    from tap_airbyte_wrapper_spark.functions import video_metadata

    got = video_metadata(payload)
    assert got is None or isinstance(got, dict)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_audio_metadata_never_raises(payload):
    from tap_airbyte_wrapper_spark.functions import audio_metadata

    got = audio_metadata(payload)
    assert got is None or isinstance(got, dict)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_image_dimensions_never_raises(payload):
    from tap_airbyte_wrapper_spark.functions.codecs import image_dimensions

    got = image_dimensions(payload)
    assert got is None or (isinstance(got, tuple) and len(got) == 2)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=256))
def test_decode_jpeg_raises_only_valueerror(payload):
    """The codec's error contract: arbitrary bytes produce ValueError
    (or IndexError-free decode), never a crash of another class — the
    executor-side behavior a malformed asset triggers."""
    from tap_airbyte_wrapper_spark.functions.jpeg import decode_jpeg

    try:
        decode_jpeg(b"\xff\xd8" + payload)
    except ValueError:
        pass  # the documented malformed-stream contract
    except Exception as e:  # noqa: BLE001 — the assertion IS the test
        raise AssertionError(
            f"non-ValueError escaped decode_jpeg: {type(e).__name__}: {e}")


def test_decode_jpeg_mutation_fuzz():
    """Deep-path error contract: corrupting a VALID stream reaches the
    scan decoder where random bytes never do.  500 seeded mutations
    (byte flips + truncations) of a real 4:2:0 encode must decode or
    raise ValueError — never KeyError/IndexError/OverflowError (all
    three escaped before round 9's hardening: undefined Huffman/quant
    table ids, truncated DHT/SOF/SOS segments, DC predictor overflow)."""
    import random

    import numpy as np

    from tap_airbyte_wrapper_spark.functions.jpeg import (decode_jpeg,
                                                          encode_jpeg)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    base = bytearray(encode_jpeg(img, quality=70, subsampling="420"))
    random.seed(42)
    for _ in range(500):
        b = bytearray(base)
        for _ in range(random.randint(1, 4)):
            b[random.randrange(2, len(b))] = random.randrange(256)
        if random.random() < 0.2:
            b = b[:random.randrange(4, len(b))]
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass


def test_container_probe_mutation_fuzz():
    """Probes must return a dict or None on CORRUPTED valid containers
    (byte flips + truncations reach the box-walk/EBML depths random
    bytes never do); a mutated mvhd/tkhd with an empty payload escaped
    with IndexError before round 9's guard."""
    import os
    import random

    from tap_airbyte_wrapper_spark.functions import (audio_metadata,
                                                     video_metadata)
    from tap_airbyte_wrapper_spark.functions.audio_meta import wav_stub
    from tap_airbyte_wrapper_spark.functions.video import mp4_stub

    viddir = os.path.join(os.path.dirname(__file__), "fixtures", "video")
    bases = [open(os.path.join(viddir, n), "rb").read()
             for n in ("tiny.mp4", "tiny.mkv", "tiny.webm")]
    bases += [mp4_stub(640, 360, 5000), wav_stub(16000, 1, 16000)]
    random.seed(11)
    for base in bases:
        for _ in range(400):
            b = bytearray(base)
            for _ in range(random.randint(1, 6)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            if random.random() < 0.3:
                b = b[:random.randrange(0, len(b))]
            for probe in (video_metadata, audio_metadata):
                got = probe(bytes(b))
                assert got is None or isinstance(got, dict)


# -------------------------------------------- AC matcher equivalence

_words = st.text(alphabet="abcxyz ", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(_words, min_size=1, max_size=8, unique=True),
       st.text(alphabet="abcxyz ", max_size=60))
def test_aho_corasick_matches_python_in(phrases, text):
    from tap_airbyte_wrapper_spark.functions.text import _AhoCorasick

    plist = [p.lower() for p in phrases]
    ac = _AhoCorasick(plist)
    got = {plist[i] for i in ac.match_ids(text.lower())}
    want = {p for p in plist if p in text.lower()}
    assert got == want


# ------------------------------------- mojibake repair never corrupts

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_mojibake_repair_idempotent_kernel(text):
    """Driver-side kernel property: repairing twice equals repairing
    once (the marker-decrease acceptance rule guarantees a fixed
    point), and marker-free text is untouched."""
    from tap_airbyte_wrapper_spark.functions.text import _MOJI_RE

    def repair(t, max_passes=3):
        for _ in range(max_passes):
            marks = len(_MOJI_RE.findall(t))
            if not marks:
                return t
            cand = None
            for enc in ("cp1252", "latin-1"):
                try:
                    cand = t.encode(enc).decode("utf-8")
                    break
                except (UnicodeDecodeError, UnicodeEncodeError):
                    cand = None
            if cand is None or len(_MOJI_RE.findall(cand)) >= marks:
                return t
            t = cand
        return t

    once = repair(text)
    assert repair(once) == once
    if not _MOJI_RE.search(text):
        assert once == text


# --------------------------------- agreement statistics invariances

_labels = st.sampled_from(["x", "y", "z"])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_labels, _labels), min_size=1, max_size=40))
def test_cohen_kappa_kernel_invariances(pairs):
    """Driver-side recomputation of the cohen_kappa formula: kappa is
    symmetric under swapping raters, invariant under relabeling, and
    bounded above by 1."""
    def kappa(ps):
        n = len(ps)
        agree = sum(1 for a, b in ps if a == b)
        labels = {l for p in ps for l in p}
        pe_num = sum(
            sum(1 for a, _ in ps if a == l) * sum(1 for _, b in ps if b == l)
            for l in labels)
        po, pe = agree / n, pe_num / (n * n)
        if pe == 1.0:
            return None
        return (po - pe) / (1 - pe)

    k = kappa(pairs)
    swapped = kappa([(b, a) for a, b in pairs])
    ren = kappa([(a + "_", b + "_") for a, b in pairs])
    if k is None:
        assert swapped is None and ren is None
    else:
        assert math.isclose(k, swapped, abs_tol=1e-12)
        assert math.isclose(k, ren, abs_tol=1e-12)
        assert k <= 1.0 + 1e-12
