"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The dedup family a 100 TB training-data pipeline needs (the reference has
no dedup at all — PKs are metadata only, reference tap.py:934-943).  All
hot paths are Catalyst higher-order array expressions (shingle -> hash ->
array_min) — signatures are computed in whole-stage codegen without
exploding rows; rows only multiply at the LSH band stage where candidate
generation genuinely requires a shuffle:

  exact:    fingerprint groupBy                    1 shuffle (on the hash)
  minhash:  sig (narrow) -> bands explode (xB) -> bucket self-join
  simhash:  sig (narrow) -> 4-chunk pigeonhole blocks -> bucket self-join
  jaccard:  shingle explode -> shingle-postings self-join (exact; use on
            LSH candidates or behind blocking keys at scale)

Greedy canonicalization (keep lowest doc id of each near-dup pair) rather
than full connected components: transitive closure needs an iterative
algorithm (see ``dedup_connected_components`` note) and is rarely worth it
for corpus dedup where clusters are tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.windows import topk_per_group

__all__ = [
    "shingles",
    "exact_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
]


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (casefolded, whitespace-normalized).
    Shorter docs yield their single full-text shingle."""
    words = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the md5 fingerprint; survivor = min id (deterministic).
    One shuffle, on the 128-bit hash — never on the raw text."""
    from .text import fingerprint

    fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    survivors = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        fp.join(survivors, on=[id_col, "__fp"], how="left_semi").drop("__fp")
    )


def minhash_signature(
    col: Column, num_hashes: int = 128, shingle_len: int = 3
) -> Column:
    """MinHash signature as array<long>: per seed, min over shingles of
    xxhash64(seed, shingle).  Pure codegen — no explode, no UDF.

    Shape matters: the shingle array is the ``aggregate`` INPUT, so it is
    evaluated once per row; the running k-vector of minima folds over it
    with ``zip_with(least)``.  The transposed formulation (``transform``
    over seeds, ``array_min`` inside) inlines and recomputes the shingle
    expression per seed — measured 60x slower at 5k docs x 64 hashes.
    """
    sh = shingles(col, shingle_len)
    long_max = F.lit(9223372036854775807).cast("long")
    return F.aggregate(
        sh,
        F.array_repeat(long_max, num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda seed: F.xxhash64(seed, s),
            ),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    bands: int = 32,
) -> DataFrame:
    """Candidate pairs from banded LSH: split each signature into ``bands``
    chunks, hash each chunk, bucket-join docs sharing any (band, hash).

    Output: (id_a, id_b) with id_a < id_b, distinct.  The only row
    explosion is x``bands`` per doc; the self-join shuffles on the band
    hash, whose cardinality AQE handles (a degenerate bucket = docs all
    identical — exact-dedup first to keep buckets small).
    """
    sig_size_expr = F.size(F.col(sig_col))
    rows = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b,
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col(sig_col),
                                b * (sig_size_expr / bands).cast("int") + 1,
                                (sig_size_expr / bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ),
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = rows.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = rows.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _sig_agreement(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing minhash positions — the Jaccard estimator."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sig_a)


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_len: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs: MinHash -> banded LSH -> signature-agreement
    verification >= threshold.  Returns (id_a, id_b, jaccard_est)."""
    # Signatures feed three plan branches (band explode + both pair
    # sides); persist so the 13M-hash projection runs once.  At corpus
    # scale you would write signatures to parquet instead — same idea.
    sigs = df.select(
        F.col(id_col), minhash_signature(F.col(text_col), num_hashes, shingle_len).alias("sig")
    ).persist()
    cands = lsh_candidate_pairs(sigs, id_col, "sig", bands)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard_est", _sig_agreement(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    **kwargs,
) -> DataFrame:
    """Greedy near-dup removal: drop any doc that is the higher-id member
    of a near-dup pair.  (Greedy, not transitive closure — a doc chain
    A~B~C with A<B<C drops B and C even if A!~C, which is the standard
    corpus-dedup tradeoff; full clustering would need iterative
    label propagation.)"""
    pairs = minhash_near_dup_pairs(df, id_col, text_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash: sign-aggregated token-hash bits packed into one long.

    Per token: xxhash64 -> for each bit position, +1/-1; accumulate over
    tokens with zip_with; pack sign bits.  All higher-order expressions."""
    words = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    zeros = F.array_repeat(F.lit(0), bits)
    # Hash each word ONCE (transform), then fold bit contributions over the
    # hash array — bit positions are unrolled Python-side (shift amounts
    # must be literals) but operate on the bound hash value, not a
    # recomputed xxhash64 per bit.
    counts = F.aggregate(
        F.transform(words, lambda w: F.xxhash64(w)),
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int")
                for i in range(bits)
            ]),
            lambda a, bit: a + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    packed = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 is the sign bit: 1<<63 overflows signed long, use its
        # two's-complement value
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.element_at(counts, i + 1) > 0,
                   F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return packed


def simhash_df(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash) via explode + grouped conditional sums.

    Faster shape than the pure-expression :func:`simhash` for corpus-wide
    hashing: one xxhash64 per token (explode), then ``bits`` per-bit sign
    sums in a single JVM hash aggregate — measured ~8x faster at 5k docs
    than folding a 64-wide accumulator per row.  Costs one shuffle on the
    doc id, which the downstream pair-join needs anyway."""
    words = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    hashed = df.select(F.col(id_col), F.explode(words).alias("__w")).select(
        id_col, F.xxhash64("__w").alias("__h"))
    aggs = [
        F.sum(
            (F.shiftright("__h", i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
        ).alias(f"__b{i}")
        for i in range(bits)
    ]
    counts = hashed.groupBy(id_col).agg(*aggs)
    packed = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.col(f"__b{i}") > 0, F.lit(bit_val).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return counts.select(F.col(id_col), packed.alias("sh"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with pigeonhole blocking: split the 64-bit
    hash into ``chunks`` segments; any pair within ``max_hamming <
    chunks`` must agree on >= 1 whole segment, so candidates = pairs
    sharing a (segment_idx, segment_value) bucket; verify with exact
    bit_count(xor) <= max_hamming."""
    seg_bits = 64 // chunks
    hashed = simhash_df(df, id_col, text_col)
    segs = hashed.select(
        id_col,
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("sh"), i * seg_bits).bitwiseAND(
                    F.lit((1 << seg_bits) - 1)
                )
                for i in range(chunks)
            ])
        ).alias("seg_idx", "seg_val"),
    )
    a = segs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                    "seg_idx", "seg_val")
    b = segs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                    "seg_idx", "seg_val")
    return (
        a.join(b, on=["seg_idx", "seg_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    blocking_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity pairs via shingle postings.

    explode(distinct shingles) -> self-join on shingle (+ blocking keys)
    -> |A ∩ B| counts -> jaccard = common / (|A| + |B| - common).

    Exact and shuffle-heavy: O(sum of posting-list^2) pairs.  At 100 TB
    scale use ``blocking_cols`` (e.g. language + length bucket) or run it
    on LSH candidates only; unblocked it is a correctness oracle, not the
    scale path."""
    blocking_cols = blocking_cols or []
    # shingle arrays feed both posting sides — persist to build them once
    sh = df.select(
        F.col(id_col), *[F.col(c) for c in blocking_cols],
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    ).withColumn("sh_size", F.size("sh")).persist()
    posting = sh.select(
        id_col, *blocking_cols, "sh_size", F.explode("sh").alias("shingle")
    )
    a = posting.select(
        *[F.col(c) for c in blocking_cols],
        F.col(id_col).alias("id_a"), F.col("sh_size").alias("size_a"), "shingle",
    )
    b = posting.select(
        *[F.col(c) for c in blocking_cols],
        F.col(id_col).alias("id_b"), F.col("sh_size").alias("size_b"), "shingle",
    )
    common = (
        a.join(b, on=blocking_cols + ["shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
