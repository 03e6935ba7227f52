"""BM25 lexical retrieval over a document corpus.

The curation stack's retrieval gap: tf-idf (`corpus.tfidf_top_terms`)
characterizes GROUPS, but pipelines also need per-QUERY ranked document
retrieval — benchmark-decontamination sweeps ("which training docs
score high against this eval question"), targeted quality audits, and
RAG-corpus preparation all reduce to BM25 top-k.  Scoring follows the
Lucene/Okapi formulation:

    idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    s(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape: the query set is small by definition and broadcasts
everywhere; corpus-side work is one tokenize+explode pass into a
(doc, term) count table, a doc-length aggregate, then an EARLY
broadcast semi-join to query terms, so document frequencies and the
scoring join only ever touch postings whose term appears in some query
— never the full vocabulary.  Nothing all-pairs; the final top-k is a
per-query window over candidate docs.  On a standing 100 TB corpus the
(doc, term) tf table and the doc-length table are exactly the pieces a
deployment would precompute once and reuse across query batches — the
function takes them as optional precomputed inputs for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._cache import cache_bounded
from .corpus import words

__all__ = ["bm25_topk", "doc_term_freq", "rrf_fuse", "rank_eval",
           "prf_expand_topk",
           "bm25_index_write", "bm25_index_append", "bm25_index_compact",
           "bm25_index_search", "bm25_index_delete", "bm25_index_replace"]


def doc_term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) counts — the precomputable corpus half of BM25.

    One tokenize+explode pass, one partial-agg-friendly shuffle on
    (id, term).  Persist this (and its ``groupBy(id).sum`` doc-length
    rollup) for a standing corpus; both are linear in corpus tokens.
    """
    return (
        df.select(F.col(id_col), F.explode(words(F.col(text_col)))
                  .alias("term"))
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tf_table: DataFrame | None = None,
    dl_table: DataFrame | None = None,
    prune_term_scan: bool = False,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is a small (query_id, query_text) frame — it is
    broadcast; never pass a corpus-scale frame here (per-doc-vs-doc
    similarity is the dedup family's job, not retrieval's).
    ``tf_table``: optional precomputed :func:`doc_term_freq` output for
    a standing corpus (skips the tokenize pass; ``df`` may then be
    ``None``).  ``dl_table``: optional precomputed ``(id, dl)`` doc
    lengths — with a term-bucketed postings table it also skips the
    id-keyed length shuffle (see :func:`bm25_index_write`).

    Returns (query_id, id, bm25, rank), rank 1..k per query.  Ranking
    orders by ``round(bm25, 6)`` then doc id, so the order — and with
    it the returned row set — is reproducible across engines and runs
    (raw float sums are partition-order-dependent in the last ulp).
    """
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(words(F.col(query_text_col))))
        .alias("term"))
    if tf_table is not None:
        tf = tf_table
        dl = dl_table if dl_table is not None else \
            tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        return _bm25_from_terms(tf, dl, qterms, id_col, query_id_col,
                                k, k1, b,
                                prune_term_scan=prune_term_scan)
    # Text path (round 14, guide §2.3/§2.4): the old shape aggregated
    # the FULL vocabulary into (id, term, tf) — a corpus-token shuffle
    # — then rolled doc lengths out of it with a second id-keyed
    # shuffle, only to immediately prune postings down to query terms.
    # Both full-corpus shuffles are removable: tokens are filtered to
    # query terms BEFORE the (id, term) aggregation (the broadcast
    # join runs map-side, so the aggregation shuffle carries only
    # query-matching tokens), the doc length is ``size(words(text))``
    # carried through the group key (identical integer: dl was the sum
    # of ALL the doc's tf, i.e. its token count), and N/avgdl come
    # from a one-row token-length aggregate (docs with zero tokens
    # were absent from the old tf-derived dl — the ``> 0`` filter
    # reproduces that).  Scores are bit-identical; the corpus now pays
    # two tokenize passes and ZERO full-vocabulary shuffles.
    ws = df.select(F.col(id_col), words(F.col(text_col)).alias("__ws"))
    toks = ws.select(F.col(id_col), F.size("__ws").alias("__dl"),
                     F.explode("__ws").alias("term"))
    tf = (toks.join(F.broadcast(qterms.select("term").distinct()), "term")
          .groupBy(id_col, "__dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    totals = (ws.select(F.size("__ws").alias("__dl"))
              .filter(F.col("__dl") > 0)
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("__dl").alias("avgdl")))
    return _bm25_from_terms(tf, None, qterms, id_col, query_id_col,
                            k, k1, b, dl_col="__dl", totals=totals)


def _bm25_from_terms(
    tf: DataFrame,
    dl: DataFrame,
    qterms: DataFrame,
    id_col: str,
    query_id_col: str,
    k: int,
    k1: float,
    b: float,
    prune_term_scan: bool = False,
    max_pruned_terms: int = 10_000,
    dl_col: str | None = None,
    totals: DataFrame | None = None,
) -> DataFrame:
    """Scoring core shared by text-query BM25 and the PRF-expanded
    second pass: ``qterms`` is a small (query_id, term) frame (distinct
    per query) that broadcasts everywhere.

    ``prune_term_scan``: a broadcast hash join still SCANS the whole
    postings side — on a persisted term-bucketed index that made
    search cost O(corpus postings) per call (the round-10 x100 study
    measured 3.4 s -> 19.6 s across a 10x corpus).  With the flag on,
    the distinct query terms (query-sized by the caller's contract)
    are collected and pushed down as a LITERAL ``isin`` — Spark then
    bucket-prunes the term-bucketed scan and skips row groups via the
    sorted-by-term min/max stats, so both postings subtrees read only
    the buckets that can contain query terms.  Guarded by
    ``max_pruned_terms``: past the cap the literal would bloat the
    plan, so it falls back to the full-scan broadcast join.  Scores
    are identical either way (the filter removes only rows that could
    never join).

    ``dl_col`` (round 14): the text path carries each doc's length as
    a column of ``tf`` itself (it is constant per id), so the id-keyed
    length join disappears; ``totals`` then supplies the (n_docs,
    avgdl) one-row frame the caller computed without a doc-length
    table."""
    if prune_term_scan:
        terms = [r[0] for r in qterms.select("term").distinct()
                 .limit(max_pruned_terms + 1).collect()]
        if len(terms) <= max_pruned_terms:
            tf = tf.filter(F.col("term").isin(terms))
    if totals is None:
        totals = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                        F.avg("dl").alias("avgdl"))
    # document frequency for QUERY terms only: the semi-join prunes the
    # vocabulary-sized aggregate down to |query terms| rows (a no-op
    # when the caller already term-filtered tf, as the text path does)
    dfreq = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
    )
    scored = scored if dl_col is not None else scored.join(dl, id_col)
    scored = (
        scored.withColumn(
            "dl", F.col(dl_col) if dl_col is not None else F.col("dl"))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf",
            F.log(1 + (F.col("n_docs") - F.col("dft") + 0.5)
                  / (F.col("dft") + 0.5)))
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "bm25", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    retrieval lists: ``rrf(d) = sum_lists 1 / (c + rank_list(d))``, the
    standard score-free way to combine lexical (BM25) and embedding
    (KNN) retrieval into one hybrid ranking — no score calibration
    between the two systems is needed, only their ranks.

    Inputs are ``(query_id, id, rank)`` frames (extra columns pass
    through from neither side); a document absent from one list simply
    contributes nothing for it.  Returns ``(query_id, id, rrf, rank)``
    with rank 1..k per query, ordered by ``(rrf desc, id)`` so the
    result is reproducible across engines (the two-term sum is a fixed
    IEEE expression, not an order-dependent aggregate).

    Scale shape: both inputs are top-k-per-query lists — |queries| * k
    rows, metadata-sized next to the corpus the retrievers scanned —
    so the full-outer join and the per-query window are trivially
    cheap; the expensive work already happened inside the retrievers.
    """
    a = ranked_a.select(
        F.col(query_id_col), F.col(id_col),
        F.col(rank_col).alias("__ra"))
    b = ranked_b.select(
        F.col(query_id_col), F.col(id_col),
        F.col(rank_col).alias("__rb"))
    fused = (
        a.join(b, [query_id_col, id_col], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (F.lit(c) + F.col("__ra")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(c) + F.col("__rb")), F.lit(0.0)),
                6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf").desc(), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rrf", "rank")
    )


def rank_eval(
    ranked: DataFrame,
    truth: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Per-query IR metrics for a ranked retrieval result against a
    relevance set: ``(query_id, n_rel, n_hit, recall_at_k,
    precision_at_k, rr, ndcg)`` — the evaluation half every retrieval
    deployment needs next to :func:`bm25_topk`/:func:`rrf_fuse`
    (sweeping k1/b, comparing fusion variants, regression-gating an
    index rebuild).

    ``truth`` is ``(query_id, id[, rel])``; without ``rel_col`` every
    judged doc counts relevance 1.  With ``rel_col``, rows with
    ``rel <= 0`` are judged-non-relevant (standard graded qrels): they
    never count as relevant or as hits, and a query whose judgments
    are all non-relevant is absent from the output (trec_eval drops
    such queries too).  Metrics: recall@k and precision@k
    on the top-``k`` cut, reciprocal rank of the first relevant hit,
    and nDCG@k with the standard ``rel / log2(rank+1)`` discounted
    gain against the ideal ordering of the query's judgments.

    Scale shape: both inputs are per-query lists (k-bounded results,
    author-bounded judgments) — joins key on (query, id), aggregates
    are one partial-agg pass each, and the ideal-DCG ranking windows
    over judgment lists only.  Queries with no judged docs are absent
    (metrics are undefined there), matching trec_eval."""
    rel = (F.col(rel_col).cast("double") if rel_col
           else F.lit(1.0))
    # deliberately uncached: the judgment table feeds three subtrees,
    # but their shuffle stages are plan-identical and Spark's
    # ReusedExchange already computes them once — a persist here
    # measured SLOWER (3.0 -> 4.2 s on the fleet entry at sf0.1, where
    # the lineage is itself a BM25 run) by blocking that reuse behind
    # an InMemoryRelation materialization.
    t = truth.select(
        F.col(query_id_col), F.col(id_col), rel.alias("__rel"))
    # graded judgment files (trec qrels) carry explicit rel=0 rows for
    # judged-NON-relevant docs: they must not count toward n_rel, hits,
    # recall/precision, or set the reciprocal-rank first hit (their
    # nDCG gain is already zero)
    pos = t.filter(F.col("__rel") > 0)
    n_rel = pos.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_rel"))
    cut = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col), F.col(id_col), F.col(rank_col))
    hits = cut.join(pos, [query_id_col, id_col])
    per_q = hits.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min(rank_col).alias("__first"),
        F.sum(F.col("__rel")
              / F.log2(F.col(rank_col) + 1)).alias("__dcg"))
    # ideal DCG: the query's judgments in best order, discounted at
    # ranks 1..n — windows over author-bounded judgment lists only
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__rel").desc(), F.col(id_col))
    idcg = (
        pos.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(query_id_col)
        .agg(F.sum(F.col("__rel") / F.log2(F.col("__r") + 1))
             .alias("__idcg"))
    )
    return (
        n_rel.join(per_q, query_id_col, "left")
        .join(idcg, query_id_col)
        .select(
            F.col(query_id_col),
            F.col("n_rel"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.col("n_rel"), 6).alias("recall_at_k"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.lit(float(k)), 6).alias("precision_at_k"),
            F.round(F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6)
            .alias("rr"),
            F.round(F.coalesce(F.col("__dcg"), F.lit(0.0))
                    / F.col("__idcg"), 6).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Persisted BM25 index — the retrieval member of the engine's persisted-
# index family (MinHash postings, IVF cells, exact fingerprints): build
# the corpus-side tables once, search any number of query batches, fold
# new documents in at O(delta).
# ---------------------------------------------------------------------------

def bm25_index_write(
    df: DataFrame,
    table_name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Build the persisted BM25 index: the ``(term, id, tf)`` postings
    table bucketed+sorted by ``term`` (query-term lookups and the
    document-frequency aggregate scan co-located buckets with ZERO
    postings shuffle) and the ``(id, dl)`` doc-length table bucketed by
    ``id`` (the scoring join's length lookup needs no length shuffle
    either).  N and avgdl derive from the length table at search time —
    one metadata-sized aggregate — so appends never maintain running
    totals that could drift."""
    import json as _json
    import os as _os

    from ..fsutil import write_text as _write_text

    spark = df.sparkSession
    tf = doc_term_freq(df, id_col, text_col).withColumn(
        "__ver", F.lit(0).cast("long"))
    spark.sql(f"DROP TABLE IF EXISTS {table_name}_postings")
    spark.sql(f"DROP TABLE IF EXISTS {table_name}_doclen")
    spark.sql(f"DROP TABLE IF EXISTS {table_name}_tombstones")
    (tf.write.bucketBy(n_buckets, "term").sortBy("term")
       .option("path", _os.path.join(path, "postings"))
       .mode("overwrite").saveAsTable(f"{table_name}_postings"))
    # doc length per ROW (round 14, guide §2.4): dl was
    # ``tf.groupBy(id).sum(tf)`` — but the sum of a doc's term
    # frequencies IS its token count, a per-row expression.  The old
    # spelling re-ran the whole postings subtree (tokenize + explode +
    # (id, term) aggregate, two exchanges) for this second write
    # action; this one tokenizes only.  The ``> 0`` filter reproduces
    # "docs with no terms have no dl row" exactly.
    (df.select(F.col(id_col),
               F.size(words(F.col(text_col))).cast("long").alias("dl"))
       .filter(F.col("dl") > 0)
       .withColumn("__ver", F.lit(0).cast("long"))
       .write.bucketBy(n_buckets, id_col).sortBy(id_col)
       .option("path", _os.path.join(path, "doclen"))
       .mode("overwrite").saveAsTable(f"{table_name}_doclen"))
    _write_text(spark, _os.path.join(path, "_index_meta.json"),
                _json.dumps({"id_col": id_col, "n_buckets": n_buckets}))


def _live(spark, table_name: str, which: str, id_col: str) -> DataFrame:
    """The LIVE rows of a versioned index table: a row written at
    version v is live iff exactly v tombstones exist for its id (a
    delete bumps the id's tombstone count past every stored row; a
    replace re-appends rows at the new count).  See ``_maint``."""
    from ._maint import live_rows, tombstone_counts_table

    return live_rows(spark.table(f"{table_name}_{which}"),
                     tombstone_counts_table(spark, table_name, id_col),
                     id_col)


def bm25_index_append(
    delta: DataFrame,
    table_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold documents into the index at O(delta): the delta's postings
    and lengths insert into the bucketed tables (bucket spec respected,
    so lookups stay co-located).  Contract: delta ids must not be LIVE
    — brand-new ids always qualify, and a previously
    :func:`bm25_index_delete`-d id revives here (its rows stamp the
    id's current tombstone count as their version, so the liveness
    filter keeps them and keeps ignoring the dead generation).
    Appending an id that is still live double-counts its postings —
    re-crawled docs go through :func:`bm25_index_replace`."""
    from ._maint import stamp_version, tombstone_counts_table

    spark = delta.sparkSession
    tombs = tombstone_counts_table(spark, table_name, id_col)
    tf = stamp_version(doc_term_freq(delta, id_col, text_col),
                       tombs, id_col)
    tf.select(id_col, "term", "tf", "__ver") \
        .write.mode("append").insertInto(f"{table_name}_postings")
    # per-row dl, same equivalence as bm25_index_write: sum of a doc's
    # tf IS its token count, and the old groupBy re-ran the delta's
    # postings subtree for this second action.  __ver stamps the same
    # per-id tombstone count the postings rows got.
    (stamp_version(
        delta.select(F.col(id_col),
                     F.size(words(F.col(text_col))).cast("long")
                     .alias("dl"))
        .filter(F.col("dl") > 0), tombs, id_col)
       .select(id_col, "dl", "__ver")
       .write.mode("append").insertInto(f"{table_name}_doclen"))


def bm25_index_delete(
    spark,
    table_name: str,
    path: str,
    ids: DataFrame,
) -> None:
    """Delete documents from the index at O(delete batch): one
    tombstone row per id appends to the ``_tombstones`` table; the
    stored postings/doclen rows stay on disk but every reader filters
    to live versions (a row is live iff its stamped version equals the
    id's tombstone count).  :func:`bm25_index_compact` folds tombstones
    physically.  ``ids`` is a 1-column frame named as the index's id
    column; deleting an absent or already-dead id is a harmless extra
    tombstone for it — the liveness predicate compares exact counts, so
    re-appending after N deletes still works."""
    import json as _json
    import os as _os

    from ..fsutil import read_text as _read_text
    from ._maint import record_tombstones_table

    meta = _json.loads(
        _read_text(spark, _os.path.join(path, "_index_meta.json")))
    record_tombstones_table(spark, table_name, path, ids, meta["id_col"])


def bm25_index_replace(
    delta: DataFrame,
    table_name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Replace documents in-place at O(delta) — the re-crawl/edited-doc
    maintenance op the append contract excludes: tombstone the delta's
    ids (killing the stored generation), then append the new text,
    whose rows stamp the bumped tombstone count as their version.
    Post-replace search equals a from-scratch rebuild on the edited
    corpus (pinned by test and by the ``bm25_index_docs`` fleet
    oracle)."""
    spark = delta.sparkSession
    bm25_index_delete(spark, table_name, path,
                      delta.select(id_col).distinct())
    bm25_index_append(delta, table_name, id_col, text_col)


def bm25_index_sync(
    new_corpus: DataFrame,
    diff: DataFrame,
    table_name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drive index maintenance from a :func:`..corpus.corpus_diff`
    churn report — the composition the two layers exist for: ``added``
    / ``changed`` docs REPLACE (tombstone + re-append), ``removed``
    ids DELETE, ``unchanged`` docs cost nothing.  Total cost is
    O(churn), never O(corpus): the upsert set semi-joins out of the
    new corpus on id, and both maintenance ops are tombstone appends +
    churn-sized postings inserts.  Post-sync search equals a
    from-scratch index built on the new corpus (pinned by the
    composition test)."""
    spark = new_corpus.sparkSession
    # one evaluation of the diff (it costs two corpus fingerprint
    # scans): the churn rows are id+status-sized, so checkpoint them
    # eagerly and let the guard counts, the semi-join, and the delete
    # all read the materialized churn instead of re-diffing
    churn = (diff.filter(F.col("status").isin("added", "changed",
                                              "removed"))
             .select(id_col, "status").localCheckpoint(eager=True))
    upsert_ids = (churn.filter(F.col("status") != "removed")
                  .select(id_col))
    removed_ids = churn.filter(F.col("status") == "removed") \
        .select(id_col)
    upserts = new_corpus.join(upsert_ids, id_col, "left_semi")
    if upsert_ids.limit(1).count():
        bm25_index_replace(upserts, table_name, path, id_col, text_col)
    if removed_ids.limit(1).count():
        bm25_index_delete(spark, table_name, path, removed_ids)


def bm25_index_compact(
    spark,
    table_name: str,
    path: str,
    dst_table: str,
    dst_path: str,
) -> dict:
    """LAYOUT-PRESERVING compaction of a persisted BM25 index — the
    retrieval member of the index family's maintenance triple
    (``minhash_index_compact``, ``ivf_compact``): each
    :func:`bm25_index_append` adds one file per touched bucket, so a
    long-lived index accumulates small files and every query-term
    lookup pays per-file open/footer cost.  A plain parquet rewrite
    would fix the file count but destroy the bucket metadata, silently
    re-introducing the postings shuffle the index exists to avoid —
    so the postings/doclen tables are re-read with the bucketed scan
    forced on and rewritten under the SAME bucket spec: one task per
    bucket, one file per bucket, ZERO shuffle.  The write goes to a
    NEW table/path (crash-safe swap-by-rename contract, same as the
    other compactors).  Tombstones from :func:`bm25_index_delete` /
    :func:`bm25_index_replace` FOLD here: the destination holds only
    live rows, re-versioned to 0, with no tombstone table.

    Returns ``{"files_in", "files_out"}``.
    """
    import json as _json
    import os as _os

    from ..fsutil import copy_text as _copy_text, \
        count_parquet_files as _nfiles, read_text as _read_text

    if _os.path.abspath(path) == _os.path.abspath(dst_path):
        raise ValueError("bm25_index_compact writes to a NEW path")
    if dst_table.casefold() == table_name.casefold():
        # Spark SQL resolves table names case-insensitively; the DROPs
        # below would otherwise destroy the live index's catalog entry
        raise ValueError("bm25_index_compact writes to a NEW table "
                         "name (dst_table must differ from table_name)")
    meta = _json.loads(
        _read_text(spark, _os.path.join(path, "_index_meta.json")))
    n_buckets, id_col = meta["n_buckets"], meta["id_col"]

    files_in = _nfiles(path, spark)
    spark.sql(f"DROP TABLE IF EXISTS {dst_table}_postings")
    spark.sql(f"DROP TABLE IF EXISTS {dst_table}_doclen")
    spark.sql(f"DROP TABLE IF EXISTS {dst_table}_tombstones")
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        # tombstones FOLD here: only live rows are rewritten, versions
        # reset to 0, and the dst index starts with no tombstone table
        # — the liveness filter is a broadcast join, so the per-bucket
        # narrow rewrite (one task per bucket, zero shuffle) survives
        (_live(spark, table_name, "postings", id_col)
            .withColumn("__ver", F.lit(0).cast("long"))
            .write.bucketBy(n_buckets, "term").sortBy("term")
            .option("path", _os.path.join(dst_path, "postings"))
            .mode("overwrite").saveAsTable(f"{dst_table}_postings"))
        (_live(spark, table_name, "doclen", id_col)
            .withColumn("__ver", F.lit(0).cast("long"))
            .write.bucketBy(n_buckets, id_col).sortBy(id_col)
            .option("path", _os.path.join(dst_path, "doclen"))
            .mode("overwrite").saveAsTable(f"{dst_table}_doclen"))
    finally:
        spark.conf.set(conf_key, old)
    _copy_text(spark, _os.path.join(path, "_index_meta.json"),
               _os.path.join(dst_path, "_index_meta.json"))
    return {"files_in": files_in, "files_out": _nfiles(dst_path, spark)}


def bm25_index_search(
    spark,
    table_name: str,
    queries: DataFrame,
    path: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Search the persisted index: identical output contract (and
    scores) to running :func:`bm25_topk` over the full current corpus —
    pinned by the fleet's build-half/append-half oracle entry.  The
    corpus never re-tokenizes; the query-term literal pushdown
    bucket-prunes the postings scan (``prune_term_scan`` — queries are
    query-sized by contract, so collecting their distinct terms is the
    same scale as the broadcasts the scorer already does) and N/avgdl
    come from one doc-length aggregate."""
    import json as _json
    import os as _os

    from ..fsutil import read_text as _read_text

    meta = _json.loads(
        _read_text(spark, _os.path.join(path, "_index_meta.json")))
    id_col = meta["id_col"]
    return bm25_topk(
        None, queries,
        id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
        k=k, k1=k1, b=b,
        tf_table=_live(spark, table_name, "postings", id_col),
        dl_table=_live(spark, table_name, "doclen", id_col),
        prune_term_scan=True)


def prf_expand_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    r: int = 5,
    e: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    tf_table: DataFrame | None = None,
    dl_table: DataFrame | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback BM25 (Rocchio-style two-pass): a
    first BM25 pass retrieves the top ``r`` docs per query, the ``e``
    highest-mass terms of those docs (summed tf, minus the original
    query terms) expand the query, and the second pass ranks the
    corpus against the expanded term set — the classic recall lever
    when exact query vocabulary misses relevant docs (benchmark
    decontamination sweeps: an eval question's paraphrases surface via
    the expansion terms).

    Fully deterministic, so the DuckDB oracle replays both passes:
    expansion terms tie-break on (mass desc, term), both ranking
    passes on (round(bm25,6) desc, id).  Returns
    ``(query_id, id, bm25, rank)`` for the SECOND pass, rank 1..k.

    Scale shape: everything query-sized stays broadcast (first-pass
    top-r lists, expansion term sets are r- and e-bounded); the corpus
    pays the tokenize pass ONCE (the tf/dl tables feed both passes —
    pass precomputed ``tf_table``/``dl_table`` or the persisted BM25
    index's tables on a standing corpus), and each pass prunes
    postings to its query terms before any aggregation."""
    # tf deliberately UNCACHED (round-8 re-measure): with a
    # plan-stable queries frame, Spark's ReusedExchange already dedups
    # the term-filtered tf subtrees across both passes, and persisting
    # forces materializing the FULL postings table — measured 3.4 s
    # cached vs 1.4 s uncached median (11.6 vs 3.6 s cold) at
    # sf0.1/local[32] in the bench harness.  (Round 14: the
    # filter-before-aggregate restructure that replaced bm25_topk's
    # text path was measured HERE too and reverted — PRF reads the
    # postings under THREE different term sets (pass 1, the
    # expansion-mass join, pass 2), so per-term-set token re-scans
    # cost three tokenize+explode passes where the one full
    # (id, term) aggregate is shared by every subtree via
    # ReusedExchange: 1.59 s -> 2.10 s median at sf0.1.  On a
    # standing corpus pass tf_table/dl_table or the persisted BM25
    # index, which is the real scale path.)
    tf = tf_table if tf_table is not None else \
        doc_term_freq(df, id_col, text_col)
    dl = dl_table if dl_table is not None else \
        tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    orig = cache_bounded(queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(words(F.col(query_text_col))))
        .alias("term")))
    first = _bm25_from_terms(tf, dl, orig, id_col, query_id_col,
                             r, k1, b)
    # expansion-term mass: summed tf over each query's top-r docs —
    # the candidate table is (r * per-doc-vocab)-bounded per query
    cand = first.select(query_id_col, id_col).join(tf, id_col)
    cand = cand.join(
        orig.select(F.col(query_id_col), F.col("term")),
        on=[query_id_col, "term"], how="left_anti")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__mass").desc(), F.col("term"))
    expansion = (
        cand.groupBy(query_id_col, "term")
        .agg(F.sum("tf").alias("__mass"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= e)
        .select(query_id_col, "term")
    )
    # the expanded term set EMBEDS the whole first pass — the second
    # pass broadcasts it from three subtrees (dfreq semi-join, the
    # postings join's qterms, and their distinct), each of which would
    # re-run pass 1 end-to-end.  It is a query-sized frame (<= |Q| *
    # (orig terms + e) rows): persist it so pass 1 runs once
    # (measured 5.9 s -> 3.5 s at sf0.1).
    expanded = cache_bounded(orig.unionByName(expansion).distinct())
    return _bm25_from_terms(tf, dl, expanded, id_col, query_id_col,
                            k, k1, b)
