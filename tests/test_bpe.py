"""Distributed BPE training vs the sequential Sennrich reference
algorithm (same tie rule), plus segmentation round-trips."""

from collections import Counter

from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.functions import bpe_segment, train_bpe

EOW = "</w>"


def _reference_bpe(word_freqs: dict[str, int], num_merges: int,
                   min_pair_freq: int = 2):
    """Pure-Python Sennrich BPE with (max count, lexicographic) ties."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([Row(text=t) for t in CORPUS])
    got = train_bpe(df, "text", num_merges=12, checkpoint_every=4)

    freqs: Counter = Counter()
    for t in CORPUS:
        freqs.update(t.split())
    want = _reference_bpe(dict(freqs), 12)
    assert got == want
    assert len(got) > 5                      # actually learned something
    # classic result on this corpus: 'est' forms early for newest/widest
    joined = ["".join(p) for p in got]
    assert any("est" in j for j in joined)


def test_train_bpe_early_stop(spark):
    df = spark.createDataFrame([Row(text="a b c")])   # all freq-1 pairs
    got = train_bpe(df, "text", num_merges=10, min_pair_freq=2)
    assert got == []


def test_bpe_segment_applies_merges(spark):
    df = spark.createDataFrame([Row(text=t) for t in CORPUS])
    merges = train_bpe(df, "text", num_merges=15, checkpoint_every=5)
    seg = spark.createDataFrame([Row(text="low lowest")]).select(
        bpe_segment(F.col("text"), merges).alias("toks")).first()["toks"]
    # round-trip: concatenating tokens restores the words + markers
    assert "".join(seg) == "low" + EOW + "lowest" + EOW
    # 'low' was merged to a single token during training
    assert seg[0] in ("low" + EOW, "low")
