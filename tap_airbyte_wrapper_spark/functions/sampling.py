"""Deterministic sampling / splitting for training-data pipelines.

Reproducibility rules this module enforces:
* splits NEVER depend on row order, partitioning, or a session seed —
  membership is a pure function of the row's id (hash-bucketed), so the
  same row lands in the same split on any cluster size, any day;
* md5 (not xxhash64) keys the split so any engine (or SQL oracle) can
  recompute membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_split", "leakage_safe_split",
           "mixture_sample",
           "stratified_sample", "sample_per_group", "weighted_sample",
           "bottomk_sample",
           "assign_shards", "write_training_shards", "temperature_weights",
           "upsample_repeat", "domain_quota_cap"]


#: Width (hex chars) of the md5 prefix the samplers key on.  12 hex
#: chars = 48 bits, so ``2**48 % buckets`` leaves a mod-bias below
#: ``buckets / 2**48`` (< 4e-11 for the 10^4-bucket samplers here) —
#: the earlier 16-bit prefix made 65536 % 10000 = 5536 buckets carry
#: 7/65536 probability vs 6/65536 for the rest (~17% relative skew),
#: so a 0.5 threshold actually kept ~53.4%.  48 bits also fit a double
#: exactly (53-bit mantissa), keeping the uniforms below loss-free.
HASH_HEX_CHARS = 12
_HASH_SPACE = float(2 ** (4 * HASH_HEX_CHARS))  # 2^48


def _hash_long(col: Column, salt: str = "") -> Column:
    """First 48 bits of md5(id || salt) as a long — the shared key
    every sampler derives buckets/uniforms from.  md5 (not xxhash64)
    so any engine recomputes membership bit-for-bit: the DuckDB twin is
    ``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR) || salt), 1, 12))
    AS BIGINT)``."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, HASH_HEX_CHARS), 16, 10).cast("long")


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): md5 the id (+ salt), take the
    first 12 hex chars (48 bits) as an integer, mod buckets.  Engine-
    portable; uniform to within ``buckets / 2**48`` (see
    :data:`HASH_HEX_CHARS`)."""
    return _hash_long(col, salt) % buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/test split column: rows whose id-hash
    bucket < ``train_pct`` are 'train', the rest 'test'.  Changing
    ``salt`` re-deals the split without touching the data."""
    b = hash_bucket(F.col(id_col), 100, salt)
    return df.withColumn(
        split_col, F.when(b < train_pct, F.lit("train")).otherwise(F.lit("test")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): deterministic for a
    fixed (data, seed, partitioning) triple — use for down-weighting
    over-represented sources/languages in a training mix."""
    return df.sampleBy(strata_col, fractions, seed)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic source-weighted sampling for mixture construction:
    keep each row of group g with probability ``rates[g]``, decided by
    the row's md5 hash bucket — never by a session seed or partitioning.

    This is how a 100 TB training mix downweights over-represented
    sources reproducibly: membership is a pure row-id function, so the
    same document survives (or not) on any cluster size, any run, and
    an auditing engine (the DuckDB oracle) recomputes the exact kept
    set.  Unlike ``stratified_sample`` (Bernoulli ``sampleBy``, seed-
    and-partitioning dependent) this is restart-stable — the property
    that matters when a 1000-executor job retries tasks.

    ``rates`` maps group value -> keep fraction in [0, 1], resolved in
    10_000ths (md5 bucket < rate * 10_000); unlisted groups fall back
    to ``default_rate``.
    """
    bucket = hash_bucket(F.col(id_col), 10_000, salt)
    thresh = F.lit(int(default_rate * 10_000))
    for g, r in rates.items():
        thresh = F.when(F.col(group_col) == g, F.lit(int(r * 10_000))) \
            .otherwise(thresh)
    return df.filter(bucket < thresh)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``k`` rows per group (fewer if the group is smaller),
    chosen deterministically: rank rows inside each group by the md5 of
    their id and keep the first ``k`` — a reservoir-sample equivalent
    that is a pure function of (id, salt), so the same rows survive on
    any cluster size or retry, and a SQL oracle recomputes the exact
    set.  Changing ``salt`` re-deals the sample.

    The fraction-based samplers above cannot promise a count; this is
    the "give me 1000 eval docs per language" primitive.  One shuffle
    on ``group_col``; the rank window is per-group (bounded memory —
    never a global sort).  Heavily skewed groups pay that group's
    partition; for pathological single-group corpora use the two-phase
    global-ranks pattern (``operators/windows.py``).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis): keep the ``k`` rows with the largest ``u^(1/w)`` where
    ``u`` is the row's md5-derived uniform — inclusion probability is
    proportional to ``w`` (sample documents by quality score, tokens,
    ...), and membership is a pure function of (id, salt): restart-
    stable, partitioning-independent, SQL-recomputable like every
    sampler here (a seeded ``rand()`` would be none of those).

    Keys are order-preserved under any positive rescaling of the
    weights (``u^(1/cw)`` is a monotone transform), so only RELATIVE
    weights matter.  Rows with null/non-positive weight are excluded.
    Plan: per-row key expression + ``TakeOrderedAndProject`` — per-
    partition heaps, no global sort, no shuffle of non-winners.

    The uniform takes all 48 hash bits (not a 16-bit bucket): at
    billions of rows a 65536-value ``u`` would collide equal-weight
    rows en masse and the id tie-break would systematically favor low
    ids inside each colliding bucket; 48 bits push the first expected
    collision out to ~2^24 rows per distinct weight and stay exactly
    representable in a double.
    """
    u = (_hash_long(F.col(id_col), salt).cast("double") + F.lit(0.5)) \
        / F.lit(_HASH_SPACE)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .orderBy(key.desc(), F.col(id_col))
        .limit(k)
    )


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    salt: str = "",
    priority_col: str | None = None,
) -> DataFrame:
    """Deterministic exact-``k`` UNIFORM sample without replacement:
    the ``k`` rows with the smallest md5-derived priority (ties broken
    on id).  Bottom-k-by-hash is the classic mergeable uniform sample
    (the KMV/bottom-k sketch): the sample of a UNION is the bottom-k
    of the parts' bottom-k's, which is what makes it the offline twin
    of :func:`~..streaming.selection.stream_reservoir_sample` — a
    stream folding batches into a persisted bottom-k converges to
    exactly this function's answer over the union, replay-idempotent
    because the priority is a pure function of (id, salt).

    Equal-weight :func:`weighted_sample` picks the same distribution;
    this variant skips the weight column, keeps the priority
    ascending (cheaper to reason about for the merge property), and
    optionally exposes it via ``priority_col`` for downstream folds.
    Plan: per-row key expression + ``TakeOrderedAndProject`` — per-
    partition heaps, no global sort, no shuffle of non-winners.
    """
    pri = _hash_long(F.col(id_col), salt)
    out = df.orderBy(pri.asc(), F.col(id_col)).limit(k)
    if priority_col:
        out = out.withColumn(priority_col, pri)
    return out


def assign_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment: ``shard = md5-bucket(id)
    % num_shards``.  Same reproducibility contract as the splits above —
    a pure row-id function, independent of row order, partitioning,
    cluster size and session seed, so a resumed/retried 1000-executor
    write produces byte-identical shard membership and any engine can
    recompute it.  md5 balances shards to within sampling noise
    (each shard ~ n/num_shards docs) with no coordination.
    """
    return df.withColumn(
        shard_col,
        hash_bucket(F.col(id_col), 2 ** 15, salt) % num_shards)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 256,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write the frame as hash-sharded training output:
    ``{path}/shard=K/part-*.{fmt}`` via ``partitionBy`` after ONE
    repartition on the shard column, so each shard is written by the
    task that owns it (no small-file spray: tasks x shards files
    otherwise).  Shard membership comes from :func:`assign_shards` —
    deterministic, so a re-run overwrites each shard with identical
    content.  Within a shard, rows are sorted by id for stable diffs.
    """
    sharded = assign_shards(df, id_col, num_shards, salt)
    (
        sharded.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.7,
    budget_frac: float = 1.0,
) -> DataFrame:
    """Temperature-flattened mixture rates: per-group keep fractions
    making each group's share of the output proportional to
    ``count^alpha`` (multilingual/multi-source LM training's standard
    rebalance — alpha<1 upsamples the tail relative to the head;
    alpha=1 keeps natural proportions, alpha=0 equalizes groups).

    Returns ``(group, n_rows, weight)`` where ``weight`` is the
    per-ROW keep probability: target share p_g = n_g^alpha / sum, and
    weight_g = budget * p_g / n_g (capped at 1 — a tail group whose
    target exceeds its size keeps everything; upsampling-by-repeat is
    a separate choice).  ``budget_frac`` scales the total kept volume
    as a fraction of the corpus.  Feed the weights straight into
    :func:`mixture_sample` for the deterministic membership pick.

    One groupBy over the grouping column; the normalization constant
    rides a broadcast one-row cross join, never a driver collect, so
    the plan composes lazily into the sampling job.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    z = counts.agg(
        F.sum(F.pow(F.col("n_rows").cast("double"), F.lit(alpha)))
        .alias("__z"),
        F.sum("n_rows").alias("__total"),
    )
    share = F.pow(F.col("n_rows").cast("double"), F.lit(alpha)) / F.col("__z")
    weight = F.least(
        F.lit(1.0),
        F.lit(budget_frac) * F.col("__total") * share / F.col("n_rows"),
    )
    return counts.crossJoin(F.broadcast(z)).select(
        group_col, "n_rows", F.round(weight, 6).alias("weight"))


def upsample_repeat(
    df: DataFrame,
    epochs: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_epochs: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Fractional-epoch repetition — the UPSAMPLING half of mixture
    construction (:func:`temperature_weights` computes keep-rates
    capped at 1; training mixes also say "2.3 epochs of books"):
    every row of group g appears ``floor(e_g)`` or ``ceil(e_g)``
    times so that the group's total multiplicity is e_g in expectation
    (exact to the 48-bit bucket's < 4e-11 mod-bias; the earlier 16-bit
    bucket skewed a 0.5 threshold to ~0.534), decided per row by the
    md5-bucket of its id —
    deterministic, order/partition/seed-independent, and
    SQL-recomputable like every sampler here.  ``e < 1`` degrades
    gracefully to plain downsampling (``floor = 0`` + fractional
    keep), so one epochs map drives the whole mix.

    Output rows carry ``copy_col`` (0-based duplicate index) so
    downstream shuffles/shard writers can spread the copies (feed
    ``concat(id, '#', copy)`` to :func:`assign_shards` — copies land
    in different shards instead of back-to-back in one file).

    Zero shuffle: the repeat is a per-row ``explode(sequence())``.
    """
    def parts(e: float) -> tuple[int, int]:
        # round, not int(): 2.3 % 1.0 is 0.29999...977 in binary — a
        # truncating cast would lose a bucket and make the expected
        # multiplicity 2.2999 instead of the documented e_g
        return int(e), int(round((e % 1.0) * 10_000))

    whole, frac_b = (F.lit(v) for v in parts(default_epochs))
    for g, e in epochs.items():
        is_g = F.col(group_col) == g
        w_g, f_g = parts(e)
        whole = F.when(is_g, F.lit(w_g)).otherwise(whole)
        frac_b = F.when(is_g, F.lit(f_g)).otherwise(frac_b)
    # a NULL id cannot take the fractional decision; coalesce to False
    # so it still gets the guaranteed floor(e) copies instead of
    # silently vanishing from the mix
    extra = F.coalesce(
        hash_bucket(F.col(id_col), 10_000, salt) < frac_b, F.lit(False))
    k = whole + extra.cast("int")
    return (
        df.withColumn("__k", k)
        .filter(F.col("__k") > 0)
        .withColumn(copy_col,
                    F.explode(F.sequence(F.lit(0), F.col("__k") - 1)))
        .drop("__k")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    train_pct: int = 80,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/test split: every document splits by its
    CONNECTED-COMPONENT representative's hash over the near-dup pair
    graph, so a document and its near-duplicates can never straddle
    the train/test boundary.

    A plain :func:`hash_split` leaks: a doc in train and its 0.95-
    jaccard twin in test inflates eval (the memorization-vs-
    generalization confound benchmark-decontamination work exists to
    prevent) — splitting must treat a near-dup CLUSTER as one unit.
    ``pairs`` is any (id_a, id_b) near-dup pair frame — the exact
    generators (:func:`~.dedup.ngram_jaccard_pairs`,
    :func:`~.dedup.containment_pairs`) give SQL-recomputable splits;
    sketch generators (MinHash/SimHash) work too but their pair sets
    are not oracle-reproducible.

    Scale shape: pair graphs are tiny relative to their corpus (edges
    << documents after blocking/banding), so
    :func:`~.dedup.connected_components` resolves them at bounded cost
    (guarded driver union-find, distributed label-prop fallback); the
    corpus-side work is one broadcast-friendly left join + the same
    pure-function-of-id hash as every sampler — restart-stable,
    partitioning-independent, engine-recomputable.

    Unpaired documents are their own component (rep = own id), so the
    overall train fraction stays ~``train_pct`` (cluster mass moves in
    units, but clusters are few).  Returns ``df`` + ``split_col``.
    """
    from .dedup import connected_components

    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias(id_col), F.col("component"))
    rep = F.coalesce(F.col("component"), F.col(id_col))
    b = hash_bucket(rep, 100, salt)
    return (
        df.join(comp, id_col, "left")
        .withColumn(split_col, F.when(b < train_pct, F.lit("train"))
                    .otherwise(F.lit("test")))
        .drop("component")
    )


def domain_quota_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    quota: int,
    order_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Per-domain document cap: keep at most ``quota`` rows per value of
    ``domain_col`` — the per-site quota gate web-corpus curation runs
    after the URL blocklist (one template-heavy host otherwise floods
    the mixture).  Retention is quality-ranked when ``order_col`` is
    given (keep the ``quota`` HIGHEST values, ties broken by the id
    hash) and fair-random otherwise (rank on the salted md5 of the id —
    the same pure-function-of-id determinism as every sampler here:
    restart- and partitioning-independent, SQL-recomputable).

    Scale shape — the window only ever sees offenders: a domain count
    (one partial-agg shuffle, domain-sized output) broadcast-splits the
    corpus into under-quota domains, which pass through with ZERO
    further shuffle, and over-quota domains, which alone pay the
    per-domain rank window.  On a crawl-shaped corpus (long-tail hosts,
    few mega-hosts) that is a map-only plan for ~all rows.  A single
    pathological mega-domain still ranks on one partition — at that
    shape use the two-phase global-ranks pattern
    (``operators/windows.py``) scoped to the one domain.

    The broadcast of the over-quota domain list is guarded: if more
    than 1M domains exceed quota the list is joined un-broadcast (AQE
    picks the strategy) rather than risking driver memory.
    """
    from pyspark.sql import Window

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    from ._cache import cache_bounded

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # pooled cache: the guard count below materializes the offender
    # list once; the broadcast build and both join sides then reuse it
    # instead of re-scanning the corpus for the aggregate
    over = cache_bounded(
        counts.filter(F.col("__n") > quota).select(domain_col))
    n_over = over.count()
    over = F.broadcast(over) if n_over <= 1_000_000 else over
    under_rows = df.join(over, domain_col, "left_anti")
    tie = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    order = ([F.col(order_col).desc()] if order_col else []) + \
        [tie, F.col(id_col)]
    w = Window.partitionBy(domain_col).orderBy(*order)
    over_rows = (
        df.join(over, domain_col, "semi")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )
    return under_rows.unionByName(over_rows)
