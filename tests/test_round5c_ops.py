"""Round-5 third-session operators: bigram-LM perplexity gates,
exact-substring removal, incremental aggregate maintenance, snapshot
diff, mergeable histogram sketches, pseudonymization, HTML stripping,
URL canonicalization.  Driver-window oracles live in
tests/test_oracle_parity.py; these pin semantics, edge cases, and the
plan shapes the oracles can't see."""

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.functions import (
    canonical_url,
    perplexity_filter,
    remove_dup_spans,
    score_perplexity,
    strip_html,
    train_bigram_lm,
)
from tap_airbyte_wrapper_spark.functions.pii import pseudonymize
from tap_airbyte_wrapper_spark.operators import (
    histogram_quantiles,
    histogram_rollup,
    histogram_sketch_table,
    maintain_agg_snapshot,
    snapshot_diff,
)


# ---------------------------------------------------------------- LM


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)])


def test_lm_fluent_text_scores_lower_than_shuffled(spark):
    # 30 copies of the same sentence teach the bigrams; a doc in that
    # word order must out-score (lower nll) the same words reversed
    corpus = _docs(spark, ["the cat sat on the mat"] * 30
                   + ["mat the on sat cat the"])
    lm = train_bigram_lm(corpus)
    s = {r["doc_id"]: r["avg_nll"]
         for r in score_perplexity(corpus, lm).collect()}
    assert s[0] < s[30]


def test_lm_empty_doc_keeps_row_with_null_score(spark):
    corpus = _docs(spark, ["a b a b", "   "])
    lm = train_bigram_lm(corpus)
    rows = {r["doc_id"]: r for r in score_perplexity(corpus, lm).collect()}
    assert rows[1]["n_tok"] == 0 and rows[1]["avg_nll"] is None
    assert rows[0]["n_tok"] == 4


def test_lm_oov_scoring_well_defined(spark):
    train = _docs(spark, ["a b c a b c"] * 5)
    lm = train_bigram_lm(train)
    test = _docs(spark, ["z z z z"])
    row = score_perplexity(test, lm).collect()[0]
    assert row["avg_nll"] is not None and row["avg_nll"] > 0


def test_lm_capped_model_broadcasts(spark):
    corpus = _docs(spark, ["a b c d e f g h"] * 4)
    lm = train_bigram_lm(corpus, max_vocab=4, max_bigrams=4)
    assert lm.capped
    plan = score_perplexity(corpus, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # cap keeps the most frequent tokens; totals stay uncapped
    assert lm.unigrams.count() == 4
    assert lm.vocab_size == 8


def test_lm_cap_changes_scores_not_totals(spark):
    corpus = _docs(spark, ["x y x y x y", "q r q r"])
    full = train_bigram_lm(corpus)
    capped = train_bigram_lm(corpus, max_vocab=2)
    assert full.total_tokens == capped.total_tokens
    assert full.vocab_size == capped.vocab_size
    # x/y survive the cap, q/r fall to the smoothed floor => doc 1
    # must score strictly worse under the capped model
    s_full = {r["doc_id"]: r["avg_nll"]
              for r in score_perplexity(corpus, full).collect()}
    s_cap = {r["doc_id"]: r["avg_nll"]
             for r in score_perplexity(corpus, capped).collect()}
    assert s_cap[1] > s_full[1]
    assert s_cap[0] == pytest.approx(s_full[0], abs=1e-3)


def test_perplexity_filter_band_and_max(spark):
    corpus = _docs(spark, ["the cat sat on the mat"] * 30
                   + ["mat the on sat cat the"])
    lm = train_bigram_lm(corpus)
    scores = sorted(r["avg_nll"]
                    for r in score_perplexity(corpus, lm).collect())
    mid = (scores[0] + scores[-1]) / 2
    kept = perplexity_filter(corpus, lm, max_avg_nll=mid)
    assert kept.count() == 30
    assert set(kept.columns) >= {"doc_id", "text", "n_tok", "avg_nll"}
    band = perplexity_filter(corpus, lm, band=(mid, 1e9))
    assert band.count() == 1


# ------------------------------------------------- remove_dup_spans


def test_remove_dup_spans_erases_all_copies(spark):
    span = "one two three four five six seven eight"
    df = _docs(spark, [f"alpha {span} beta", f"gamma {span} delta",
                       "unrelated words only here nothing shared at all"])
    out = {r["doc_id"]: r for r in
           remove_dup_spans(df, "doc_id", "text", n=8).collect()}
    # the 8-token span is removed from BOTH carriers (not kept-first)
    assert out[0]["text"] == "alpha beta"
    assert out[1]["text"] == "gamma delta"
    assert out[0]["n_removed"] == 8
    assert out[2]["n_removed"] == 0
    assert out[2]["text"] == "unrelated words only here nothing shared at all"


def test_remove_dup_spans_short_docs_pass_through(spark):
    df = _docs(spark, ["a b c", "a b c"])
    out = remove_dup_spans(df, "doc_id", "text", n=8).collect()
    assert all(r["n_removed"] == 0 and r["text"] == "a b c" for r in out)


def test_remove_dup_spans_within_doc_repeat_not_dup(spark):
    # the gram repeats inside ONE doc only => doc frequency 1 => kept
    span = "one two three four five six seven eight"
    df = _docs(spark, [f"{span} {span}",
                       "totally different text with no shared grams at x"])
    out = {r["doc_id"]: r for r in
           remove_dup_spans(df, "doc_id", "text", n=8).collect()}
    assert out[0]["n_removed"] == 0


def test_remove_dup_spans_fully_covered_doc_empties(spark):
    span = "one two three four five six seven eight"
    df = _docs(spark, [span, span, "other doc unrelated"])
    out = {r["doc_id"]: r for r in
           remove_dup_spans(df, "doc_id", "text", n=8).collect()}
    assert out[0]["text"] == "" and out[0]["n_removed"] == 8
    assert out[1]["text"] == ""


# ------------------------------------------- maintain_agg_snapshot


def test_incremental_agg_equals_recompute(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cut = "1997-01-01"
    snap = maintain_agg_snapshot(
        None, orders.filter(F.col("o_orderdate") < cut),
        keys="o_orderstatus", sum_cols=["o_totalprice"],
        min_cols=["o_orderdate"], max_cols=["o_orderdate"])
    out = maintain_agg_snapshot(
        snap, orders.filter(F.col("o_orderdate") >= cut),
        keys="o_orderstatus", sum_cols=["o_totalprice"],
        min_cols=["o_orderdate"], max_cols=["o_orderdate"])
    direct = maintain_agg_snapshot(
        None, orders, keys="o_orderstatus", sum_cols=["o_totalprice"],
        min_cols=["o_orderdate"], max_cols=["o_orderdate"])

    def norm(df):
        return {r["o_orderstatus"]:
                (r["n_rows"], round(r["sum_o_totalprice"], 2),
                 r["min_o_orderdate"], r["max_o_orderdate"])
                for r in df.collect()}

    assert norm(out) == norm(direct)


def test_incremental_agg_empty_delta_is_identity(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    snap = maintain_agg_snapshot(
        None, orders, keys="o_orderstatus", sum_cols=["o_totalprice"])
    refreshed = maintain_agg_snapshot(
        snap, orders.limit(0), keys="o_orderstatus",
        sum_cols=["o_totalprice"])
    a = {r["o_orderstatus"]: (r["n_rows"], round(r["sum_o_totalprice"], 2))
         for r in snap.collect()}
    b = {r["o_orderstatus"]: (r["n_rows"], round(r["sum_o_totalprice"], 2))
         for r in refreshed.collect()}
    assert a == b


def test_incremental_agg_new_key_in_delta(spark):
    base = spark.createDataFrame([Row(k="a", v=1.0), Row(k="a", v=2.0)])
    delta = spark.createDataFrame([Row(k="b", v=5.0)])
    snap = maintain_agg_snapshot(None, base, keys="k", sum_cols=["v"])
    out = {r["k"]: (r["n_rows"], r["sum_v"]) for r in
           maintain_agg_snapshot(snap, delta, keys="k",
                                 sum_cols=["v"]).collect()}
    assert out == {"a": (2, 3.0), "b": (1, 5.0)}


def test_incremental_agg_missing_partial_errors(spark):
    base = spark.createDataFrame([Row(k="a", v=1.0)])
    snap = maintain_agg_snapshot(None, base, keys="k", sum_cols=["v"])
    with pytest.raises(ValueError, match="missing partial"):
        maintain_agg_snapshot(snap.drop("sum_v"),
                              base, keys="k", sum_cols=["v"])


# --------------------------------------------------- snapshot_diff


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=2.0),
         Row(k=3, a="z", b=3.0)])
    new = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=9.0),
         Row(k=4, a="w", b=4.0)])
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k").collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_empty_distinct(spark):
    # per-column digests: NULL and '' are different states, and a
    # separator byte inside a value cannot shift content across
    # column boundaries
    old = spark.createDataFrame(
        [Row(k=1, a=None, b="q"), Row(k=2, a=None, b="q"),
         Row(k=3, a="a|b", b=""), Row(k=4, a="a\x1fb", b="")],
        schema="k int, a string, b string")
    new = spark.createDataFrame(
        [Row(k=1, a="x", b="q"), Row(k=2, a="", b="q"),
         Row(k=3, a="a", b="|b"), Row(k=4, a="a", b="\x1fb")],
        schema="k int, a string, b string")
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k").collect()}
    assert out == {1: "changed", 2: "changed",
                   3: "changed", 4: "changed"}


def test_snapshot_diff_compare_cols_subset(spark):
    old = spark.createDataFrame([Row(k=1, a="x", noise="p")])
    new = spark.createDataFrame([Row(k=1, a="x", noise="q")])
    assert snapshot_diff(old, new, "k").count() == 1
    assert snapshot_diff(old, new, "k", compare_cols=["a"]).count() == 0


# ------------------------------------------------ histogram sketch


def test_histogram_sketch_merge_equals_direct(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = histogram_sketch_table(
        ev, "value", "event_type", lo=0.0, hi=500.0, bins=50)
    merged = histogram_rollup(per_type, group_keys=None)
    direct = histogram_sketch_table(
        ev.withColumn("g", F.lit(1)), "value", "g",
        lo=0.0, hi=500.0, bins=50).drop("g")
    a = {r["bin"]: r["n"] for r in merged.collect()}
    b = {r["bin"]: r["n"] for r in direct.collect()}
    assert a == b


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [Row(g=1, v=-5.0), Row(g=1, v=999.0), Row(g=1, v=None)])
    out = {r["bin"]: r["n"] for r in histogram_sketch_table(
        df, "v", "g", lo=0.0, hi=10.0, bins=10).collect()}
    assert out == {0: 1, 9: 1}  # null skipped


def test_histogram_quantiles_exact_to_bin_edge(spark):
    # 100 values 0..99 in 10 bins of width 10: p50 -> bin 4 edge 50
    df = spark.createDataFrame([Row(g=1, v=float(i)) for i in range(100)])
    sk = histogram_sketch_table(df, "v", "g", lo=0.0, hi=100.0, bins=10)
    q = {r["p"]: r["q"] for r in histogram_quantiles(
        histogram_rollup(sk), [0.5, 1.0], lo=0.0, hi=100.0,
        bins=10).collect()}
    assert q == {0.5: 50.0, 1.0: 100.0}


def test_histogram_quantiles_grouped(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=float(i)) for i in range(10)]
        + [Row(g="b", v=90.0 + i) for i in range(10)])
    sk = histogram_sketch_table(df, "v", "g", lo=0.0, hi=100.0, bins=10)
    q = {(r["g"], r["p"]): r["q"] for r in histogram_quantiles(
        sk, [1.0], lo=0.0, hi=100.0, bins=10,
        group_keys=["g"]).collect()}
    assert q == {("a", 1.0): 10.0, ("b", 1.0): 100.0}


# -------------------------------------------- pseudonymize / text


def test_pseudonymize_consistent_and_salted(spark):
    df = spark.createDataFrame([Row(u=7), Row(u=7), Row(u=8), Row(u=None)])
    out = df.select(
        pseudonymize(F.col("u"), "s1").alias("a"),
        pseudonymize(F.col("u"), "s1").alias("b"),
        pseudonymize(F.col("u"), "s2").alias("c")).collect()
    assert out[0]["a"] == out[1]["a"]          # same value+salt joins
    assert out[0]["a"] == out[0]["b"]
    assert out[0]["a"] != out[0]["c"]          # salt rotation breaks link
    assert out[0]["a"] != out[2]["a"]
    assert out[3]["a"] is None                  # null stays null
    assert len(out[0]["a"]) == 16


def test_strip_html_tags_script_entities(spark):
    df = spark.createDataFrame([Row(x=(
        '<html><style>p{}</style><body><!-- c --><p a="b">Hello'
        '<br/>world</p><script>if(1<2){x()}</script>'
        '&lt;tag&gt; &amp; &quot;q&quot;&nbsp;&#39;s&#39;</body></html>'))])
    out = df.select(strip_html(F.col("x")).alias("t")).collect()[0]["t"]
    assert out == 'Hello world <tag> & "q" \'s\''


def test_strip_html_plain_text_unchanged(spark):
    df = spark.createDataFrame([Row(x="  just   words  ")])
    assert df.select(strip_html(F.col("x")).alias("t")
                     ).collect()[0]["t"] == "just words"


def test_canonical_url_collapses_mirror_noise(spark):
    urls = [
        "HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a?a=1&b=2",
        "https://Example.com:443/a",
        "https://example.com:8443/a",       # non-default port kept
        "not a url at all  ",
    ]
    df = spark.createDataFrame([Row(u=u) for u in urls])
    out = [r["c"] for r in
           df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert out[0] == out[1] == "http://example.com/a?a=1&b=2"
    assert out[2] == "https://example.com/a"
    assert out[3] == "https://example.com:8443/a"
    assert out[4] == "not a url at all"


def test_canonical_url_root_slash_kept(spark):
    df = spark.createDataFrame(
        [Row(u="http://x.com/"), Row(u="http://x.com"),
         Row(u="HTTP://X.com:80"), Row(u="http://x.com/?gclid")])
    out = [r["c"] for r in
           df.select(canonical_url(F.col("u")).alias("c")).collect()]
    # bare host, root slash, default port, and a value-less tracking
    # param all collapse to ONE canonical form
    assert out == ["http://x.com/"] * 4


# ------------------------------- global_cumsum / pack_sequences


def test_global_cumsum_matches_window(spark, sf_dir):
    from tap_airbyte_wrapper_spark.operators import global_cumsum
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    got = {r["o_orderkey"]: round(r["cum"], 2) for r in global_cumsum(
        orders, "o_orderkey", "o_totalprice", num_ranges=8).collect()}
    w = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    want = {r["o_orderkey"]: round(r["cum"], 2) for r in orders.withColumn(
        "cum", F.sum("o_totalprice").over(w)).collect()}
    assert got == want


def test_global_cumsum_string_key_and_sortorder_rejection(spark):
    """String keys no longer raise (round 6: re-keyed on xxhash64 —
    covered in test_round6_ops); a SortOrder column still must."""
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.operators import global_cumsum

    df = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    assert sorted(r["cum"] for r in
                  global_cumsum(df, "k", "v").collect()) == [1, 3] or \
        sorted(r["cum"] for r in
               global_cumsum(df, "k", "v").collect()) == [2, 3]
    with pytest.raises(TypeError, match="SortOrder"):
        global_cumsum(df, F.col("k").desc(), "v")


def test_pack_sequences_invariants(spark):
    from tap_airbyte_wrapper_spark.functions import pack_sequences

    df = _docs(spark, ["a b c", "d e", "", "f g h i j", "k"])
    rows = sorted(pack_sequences(df, "doc_id", "text", seq_len=4).collect(),
                  key=lambda r: r["doc_id"])
    # offsets: 0,3,5,5,10 — contiguous concatenation in id order
    assert [r["tok_start"] for r in rows] == [0, 3, 5, 5, 10]
    # doc 1 (tokens 3-4) stays in seq 0; doc 3 (tokens 5-9) spans 1-2
    assert (rows[1]["seq_start"], rows[1]["seq_end"]) == (0, 1)
    assert (rows[3]["seq_start"], rows[3]["seq_end"]) == (1, 2)
    # empty doc occupies nothing
    assert rows[2]["seq_end"] < rows[2]["seq_start"] or rows[2]["n_tok"] == 0


def test_temperature_weights_extremes(spark):
    from tap_airbyte_wrapper_spark.functions import temperature_weights

    df = spark.createDataFrame(
        [Row(source="big", doc_id=i) for i in range(90)]
        + [Row(source="small", doc_id=100 + i) for i in range(10)])
    # alpha=1: natural proportions => every group keeps everything
    nat = {r["source"]: r["weight"] for r in
           temperature_weights(df, "source", alpha=1.0).collect()}
    assert nat == {"big": 1.0, "small": 1.0}
    # alpha=0: equal target shares => tail capped at 1, head downsampled
    flat = {r["source"]: r["weight"] for r in
            temperature_weights(df, "source", alpha=0.0).collect()}
    assert flat["small"] == 1.0
    assert flat["big"] == pytest.approx(50 / 90, abs=1e-4)
    # budget scales linearly below the cap
    half = {r["source"]: r["weight"] for r in
            temperature_weights(df, "source", alpha=1.0,
                                budget_frac=0.5).collect()}
    assert half == {"big": 0.5, "small": 0.5}


# ------------------------- streaming histogram sketch maintenance


def test_streaming_histogram_sketch_maintenance(spark, sf_dir, tmp_path):
    """foreachBatch appends per-batch histogram sketch rows; the rollup
    over the sketch table equals the batch histogram over all data —
    quantile state maintained incrementally, raw data scanned once per
    arrival."""
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    ev = load_parquet(spark, f"{sf_dir}/events.parquet")
    src = tmp_path / "landing"
    sketch_dir = str(tmp_path / "sketches")
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        def sink(batch_df, batch_id):
            sk = histogram_sketch_table(
                batch_df.withColumn("g", F.lit(1)), "value", "g",
                lo=0.0, hi=500.0, bins=50).drop("g")
            sk.withColumn("batch_id", F.lit(batch_id)) \
                .write.mode("append").parquet(sketch_dir)

        q = (spark.readStream.schema(ev.schema).parquet(str(src))
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(str(src))
    drain()

    rolled = histogram_rollup(
        spark.read.parquet(sketch_dir).drop("batch_id"), group_keys=None)
    direct = histogram_sketch_table(
        ev.withColumn("g", F.lit(1)), "value", "g",
        lo=0.0, hi=500.0, bins=50).drop("g")
    a = {r["bin"]: r["n"] for r in rolled.collect()}
    b = {r["bin"]: r["n"] for r in direct.collect()}
    assert a == b


# ---------------------------------------- text quality classifier


def _toy_corpus(spark):
    good = ["the quick brown fox jumps over the lazy dog",
            "a well formed english sentence with meaning",
            "another fluent and useful document about science"]
    bad = ["buy cheap pills xxx click now win win",
           "zzz spam spam casino jackpot free free free",
           "lorem click subscribe now cheap cheap xxx"]
    rows = [Row(doc_id=i, text=t, y=1) for i, t in enumerate(good)]
    rows += [Row(doc_id=100 + i, text=t, y=0) for i, t in enumerate(bad)]
    return spark.createDataFrame(rows)


def test_classifier_matches_numpy_reference(spark):
    """Distributed full-batch GD must equal the sequential numpy run of
    the identical recipe (same hashing, iterations, lr, l2)."""
    import numpy as np
    from tap_airbyte_wrapper_spark.functions import (
        fit_text_classifier, hashed_token_indices)

    df = _toy_corpus(spark)
    dim, n_iter, lr, l2 = 64, 10, 1.0, 1e-3
    model = fit_text_classifier(df, "y", dim=dim, n_iter=n_iter,
                                lr=lr, l2=l2)

    # same hashed indices, computed by the same JVM expression
    rows = df.select(
        "y", hashed_token_indices(F.col("text"), dim).alias("idxs")
    ).collect()
    w = np.zeros(dim)
    b = 0.0
    for _ in range(n_iter):
        gw = np.zeros(dim)
        gb = 0.0
        for r in rows:
            idx = np.array(r["idxs"])
            m = w[idx].sum() / len(idx) + b
            p = 1 / (1 + np.exp(-m))
            np.add.at(gw, idx, (p - r["y"]) / len(idx))
            gb += p - r["y"]
        n = len(rows)
        w -= lr * (gw / n + l2 * w)
        b -= lr * gb / n
    assert np.allclose(model.weights, w, atol=1e-9)
    assert abs(model.bias - b) < 1e-9


def test_classifier_separates_and_scores_declaratively(spark):
    import numpy as np
    from tap_airbyte_wrapper_spark.functions import (
        classify, fit_text_classifier)

    df = _toy_corpus(spark)
    model = fit_text_classifier(df, "y", dim=256, n_iter=60, lr=2.0)
    scored = classify(df, model)
    probs = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert all(probs[i] > 0.5 for i in (0, 1, 2))
    assert all(probs[100 + i] < 0.5 for i in (0, 1, 2))
    # the declarative scorer broadcasts the model table
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # empty doc scores sigmoid(bias)
    empty = spark.createDataFrame([Row(doc_id=7, text="  ")])
    p = classify(empty, model).collect()[0]
    assert p["n_tok"] == 0
    assert p["quality_prob"] == pytest.approx(
        1 / (1 + np.exp(-model.bias)), abs=1e-9)


def test_classifier_save_load_roundtrip(spark, tmp_path):
    import numpy as np
    from tap_airbyte_wrapper_spark.functions import (
        classify, fit_text_classifier, load_text_classifier,
        save_text_classifier)

    df = _toy_corpus(spark)
    model = fit_text_classifier(df, "y", dim=64, n_iter=5)
    save_text_classifier(model, spark, str(tmp_path / "clf"))
    loaded = load_text_classifier(spark, str(tmp_path / "clf"))
    assert np.array_equal(model.weights, loaded.weights)
    assert (model.bias, model.dim, model.salt) == (
        loaded.bias, loaded.dim, loaded.salt)
    a = {r["doc_id"]: r["quality_prob"] for r in classify(df, model).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in classify(df, loaded).collect()}
    assert a == b


# ----------------------------------------------- text_lines source


def test_text_lines_source_lines_and_wholetext(spark, tmp_path):
    from tap_airbyte_wrapper_spark.sources import get_source

    (tmp_path / "a.txt").write_text("doc one\ndoc two\n")
    (tmp_path / "b.txt").write_text("doc three\n")
    src = get_source("text_lines", {"path": str(tmp_path)})
    cat = src.discover(spark)
    entry = list(cat)[0]
    assert entry.schema.fieldNames() == ["value", "source_file"]
    rows = src.read(spark, entry).collect()
    assert sorted(r["value"] for r in rows) == [
        "doc one", "doc three", "doc two"]
    assert all(r["source_file"].endswith(".txt") for r in rows)

    whole = get_source("text_lines",
                       {"path": str(tmp_path), "wholetext": True})
    wrows = whole.read(spark, list(whole.discover(spark))[0]).collect()
    assert sorted(r["value"] for r in wrows) == [
        "doc one\ndoc two\n", "doc three\n"]


def test_text_lines_feeds_curation_layer(spark, tmp_path):
    """The raw-line stream runs the curation gates unmodified."""
    from tap_airbyte_wrapper_spark.functions import strip_html
    from tap_airbyte_wrapper_spark.functions.text import quality_score
    from tap_airbyte_wrapper_spark.sources import get_source

    (tmp_path / "c.txt").write_text(
        "<p>hello world</p>\nplain text line\n")
    src = get_source("text_lines", {"path": str(tmp_path)})
    df = src.read(spark, list(src.discover(spark))[0])
    out = df.select(
        strip_html(F.col("value")).alias("text")
    ).withColumn("q", quality_score(F.col("text"))).collect()
    assert sorted(r["text"] for r in out) == ["hello world",
                                              "plain text line"]
    assert all(r["q"] is not None for r in out)


def test_upsample_repeat_multiplicities(spark):
    from tap_airbyte_wrapper_spark.functions import upsample_repeat

    df = spark.createDataFrame(
        [Row(doc_id=i, source="a") for i in range(200)]
        + [Row(doc_id=1000 + i, source="b") for i in range(200)]
        + [Row(doc_id=2000 + i, source="c") for i in range(50)])
    out = upsample_repeat(df, {"a": 2.5, "b": 0.4}, "source", "doc_id")
    rows = out.groupBy("source").count().collect()
    n = {r["source"]: r["count"] for r in rows}
    # expectation 2.5x / 0.4x / 1.0x with md5-bucket concentration
    assert 400 <= n["a"] <= 600 and abs(n["a"] - 500) < 80
    assert 40 <= n["b"] <= 140
    assert n["c"] == 50
    # per-row multiplicity is floor/ceil of the epoch only
    per = out.filter("source = 'a'").groupBy("doc_id").count().collect()
    assert set(r["count"] for r in per) <= {2, 3}
    # deterministic: same call twice -> identical multiset
    again = upsample_repeat(df, {"a": 2.5, "b": 0.4}, "source", "doc_id")
    a = sorted((r["doc_id"], r["copy"]) for r in out.collect())
    b = sorted((r["doc_id"], r["copy"]) for r in again.collect())
    assert a == b


def test_upsample_repeat_zero_shuffle(spark):
    from tap_airbyte_wrapper_spark.functions import upsample_repeat

    df = spark.createDataFrame([Row(doc_id=1, source="a")])
    plan = upsample_repeat(df, {"a": 3.0}, "source", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_snapshot_diff_key_only_table(spark):
    old = spark.createDataFrame([Row(k=1), Row(k=2)])
    new = spark.createDataFrame([Row(k=2), Row(k=3)])
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k").collect()}
    assert out == {1: "removed", 3: "added"}


def test_expectation_dataclass_comparable(spark):
    from tap_airbyte_wrapper_spark.operators import Expectation

    df = spark.createDataFrame([Row(k=1)])
    a = Expectation("c", "foreign_key", ref=df, ref_col="k")
    b = Expectation("c", "foreign_key", ref=df, ref_col="k")
    assert a == b and a in [b]


def test_upsample_repeat_null_id_keeps_floor(spark):
    from tap_airbyte_wrapper_spark.functions import upsample_repeat

    df = spark.createDataFrame(
        [Row(doc_id=None, source="a"), Row(doc_id=7, source="a")],
        schema="doc_id long, source string")
    out = upsample_repeat(df, {"a": 2.5}, "source", "doc_id")
    per = {r["doc_id"]: 0 for r in out.collect()}
    for r in out.collect():
        per[r["doc_id"]] += 1
    assert per.get(None) == 2          # guaranteed floor, not dropped
    assert per[7] in (2, 3)


def test_value_bucket_plain_column_named_desc(spark):
    from tap_airbyte_wrapper_spark.operators import global_cumsum

    df = spark.createDataFrame(
        [Row(PRICE_DESC=float(i), v=1) for i in range(10)])
    out = global_cumsum(df, "PRICE_DESC", "v", num_ranges=4)
    assert sorted(r["cum"] for r in out.collect()) == list(range(1, 11))


def test_lm_merge_equals_union_train(spark):
    from tap_airbyte_wrapper_spark.functions import (
        merge_bigram_lm, train_bigram_lm)

    day1 = _docs(spark, ["the cat sat on the mat"] * 5)
    day2 = spark.createDataFrame(
        [Row(doc_id=100 + i, text="a dog ran in the park")
         for i in range(5)])
    both = day1.unionByName(day2)
    merged = merge_bigram_lm(train_bigram_lm(day1), train_bigram_lm(day2))
    direct = train_bigram_lm(both)
    assert merged.total_tokens == direct.total_tokens
    assert merged.vocab_size == direct.vocab_size
    mu = {r["tok"]: r["c_uni"] for r in merged.unigrams.collect()}
    du = {r["tok"]: r["c_uni"] for r in direct.unigrams.collect()}
    assert mu == du
    mb = {(r["w1"], r["w2"]): r["c_big"] for r in merged.bigrams.collect()}
    db = {(r["w1"], r["w2"]): r["c_big"] for r in direct.bigrams.collect()}
    assert mb == db
    # scoring under merged == scoring under direct
    s_m = {r["doc_id"]: r["avg_nll"]
           for r in score_perplexity(both, merged).collect()}
    s_d = {r["doc_id"]: r["avg_nll"]
           for r in score_perplexity(both, direct).collect()}
    assert s_m == s_d


def test_lm_merge_refuses_capped(spark):
    from tap_airbyte_wrapper_spark.functions import (
        merge_bigram_lm, train_bigram_lm)

    a = train_bigram_lm(_docs(spark, ["x y"]), max_vocab=1)
    b = train_bigram_lm(_docs(spark, ["x y"]))
    with pytest.raises(ValueError, match="cap"):
        merge_bigram_lm(a, b)


def test_lm_save_load_roundtrip(spark, tmp_path):
    from tap_airbyte_wrapper_spark.functions import (
        load_bigram_lm, save_bigram_lm, train_bigram_lm)

    docs = _docs(spark, ["the cat sat on the mat"] * 3)
    lm = train_bigram_lm(docs, max_vocab=4, max_bigrams=4)
    save_bigram_lm(lm, str(tmp_path / "lm"))
    loaded = load_bigram_lm(spark, str(tmp_path / "lm"))
    assert (loaded.total_tokens, loaded.vocab_size, loaded.add_k,
            loaded.uni_capped, loaded.big_capped) == (
        lm.total_tokens, lm.vocab_size, lm.add_k,
        lm.uni_capped, lm.big_capped)
    a = {r["doc_id"]: r["avg_nll"]
         for r in score_perplexity(docs, lm).collect()}
    b = {r["doc_id"]: r["avg_nll"]
         for r in score_perplexity(docs, loaded).collect()}
    assert a == b


def test_quality_weighted_sample_composition(spark):
    """Classifier probability drives Efraimidis-Spirakis sampling: the
    trained gate's scores feed weighted_sample directly, and the kept
    set concentrates on the high-quality class — the curation
    composition 'score, then sample by score'."""
    from tap_airbyte_wrapper_spark.functions import (
        classify, fit_text_classifier, weighted_sample)

    good = [Row(doc_id=i, text="a well formed useful sentence about "
                               f"science topic {i}", y=1)
            for i in range(30)]
    bad = [Row(doc_id=100 + i, text=f"spam spam buy now xxx {i}", y=0)
           for i in range(30)]
    df = spark.createDataFrame(good + bad)
    model = fit_text_classifier(df, "y", dim=256, n_iter=60, lr=2.0)
    scored = df.join(classify(df, model).select(
        "doc_id", "quality_prob"), "doc_id")
    kept = weighted_sample(scored, "quality_prob", "doc_id", k=20)
    ids = [r["doc_id"] for r in kept.collect()]
    assert len(ids) == 20
    n_good = sum(1 for i in ids if i < 100)
    assert n_good >= 15          # high-prob class dominates the sample
    # deterministic composition: rerun -> identical keep set
    again = [r["doc_id"] for r in weighted_sample(
        scored, "quality_prob", "doc_id", k=20).collect()]
    assert sorted(ids) == sorted(again)
