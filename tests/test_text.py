"""Text-analysis operators on the documents table + synthetic edge cases."""

import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.functions import (
    bpe_token_estimate,
    fingerprint,
    language_id,
    minhash_fingerprints,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_token_count(spark):
    rows = (
        one(spark, "a b  c").unionAll(one(spark, "")).unionAll(one(spark, "   "))
        .unionAll(one(spark, "single"))
        .select(token_count(F.col("text")).alias("n")).collect()
    )
    assert [r.n for r in rows] == [3, 0, 0, 1]


def test_token_count_matches_docs(docs):
    # documents are single-space word soup: tokens = spaces + 1
    bad = docs.select(
        token_count(F.col("text")).alias("n"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1).alias("want"),
    ).filter("n != want")
    assert bad.count() == 0


def test_bpe_estimate_monotone(spark):
    df = one(spark, "short words here").unionAll(
        one(spark, "supercalifragilisticexpialidocious antidisestablishmentarianism"))
    got = df.select(bpe_token_estimate(F.col("text")).alias("n")).collect()
    assert got[0].n == 3
    assert got[1].n > 2  # long words split into subword overflow tokens


def test_language_id(spark):
    cases = {
        "the cat and the dog is here": "en",
        "der hund und die katze ist nicht da": "de",
        "el perro y los gatos que es": "es",
        "le chien et les chats est que": "fr",
        "xyzzy qwerty": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r.text: r.lang for r in
           df.select("text", language_id(F.col("text")).alias("lang")).collect()}
    assert got == cases


def test_quality_score_bounds(docs):
    stats = docs.select(quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")).first()
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_quality_ranks_garbage_below_prose(spark):
    prose = " ".join(["the quick brown fox jumps over the lazy dog and runs"] * 10)
    garbage = "!!!! #### 1234 @@@@ %%%% ^^^^"
    df = spark.createDataFrame([("p", prose), ("g", garbage)], "k string, text string")
    got = {r.k: r.q for r in df.select("k", quality_score(F.col("text")).alias("q")).collect()}
    assert got["p"] > got["g"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("A  Dog ",), ("a dog",), ("a cat",)], "text string")
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert len(fps[0]) == 32  # md5 hex


def test_minhash_fingerprints_shape(docs):
    row = docs.limit(1).select(
        minhash_fingerprints(F.col("text"), num_hashes=8).alias("mh")).first()
    assert len(row.mh) == 8
    assert all(len(h) == 32 for h in row.mh)
    # deterministic across evaluations
    again = docs.limit(1).select(
        minhash_fingerprints(F.col("text"), num_hashes=8).alias("mh")).first()
    assert row.mh == again.mh


def test_sentence_splitter_udtf(spark):
    from tap_airbyte_wrapper_spark.functions.udtf import split_sentences

    docs = spark.createDataFrame([
        (1, "One sentence. Two sentences! Three? "),
        (2, "No terminator here"),
        (3, ""),
    ], "doc_id long, text string")
    rows = {(r.doc_id, r.idx): r.sentence
            for r in split_sentences(docs, "doc_id", "text").collect()}
    assert rows == {
        (1, 0): "One sentence.",
        (1, 1): "Two sentences!",
        (1, 2): "Three?",
        (2, 0): "No terminator here",
    }


def test_text_functions_null_empty_unicode(spark):
    """Real corpora contain nulls, blanks, and non-ASCII — nothing crashes
    and results are deterministic."""
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import (
        language_id, minhash_signatures_df, quality_score, simhash_df,
        token_count)

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "héllo wörld 你好 мир"),
         (5, "a.b\tc\nd")],
        "doc_id long, text string")
    rows = df.select(
        "doc_id",
        token_count(F.col("text")).alias("t"),
        language_id(F.col("text")).alias("l"),
        F.round(quality_score(F.col("text")), 4).alias("q"),
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].t == 0 and by_id[3].t == 0
    assert by_id[4].t == 4
    assert by_id[2].l == "und"
    assert all(r.q is None or 0.0 <= r.q <= 1.0 for r in rows)
    assert simhash_df(df, "doc_id", "text").count() == 5
    assert minhash_signatures_df(df, "doc_id", "text", 8).count() == 5


def test_hash_split_deterministic_and_stratified(spark, sf_dir):
    from tap_airbyte_wrapper_spark.functions import hash_split, stratified_sample
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    # repartitioning must NOT change membership
    s2 = {r.doc_id: r.split
          for r in hash_split(docs.repartition(7), "doc_id").collect()}
    assert s1 == s2
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.6 < frac < 0.95
    # a different salt re-deals
    s3 = {r.doc_id: r.split
          for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert s3 != s1
    # stratified sampling: down-weight one language deterministically
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fr = {lg: (0.1 if i == 0 else 1.0) for i, lg in enumerate(sorted(langs))}
    samp = stratified_sample(docs, "lang", fr, seed=7)
    again = stratified_sample(docs, "lang", fr, seed=7)
    assert samp.count() == again.count() < docs.count()


def test_winnow_fingerprints_shared_substring(spark):
    from tap_airbyte_wrapper_spark.functions import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "aaaa bbbb " + shared + " cccc dddd"),
        (2, "xxxx yyyy " + shared + " zzzz wwww"),
        (3, "completely different content with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: set(r.fps)
           for r in winnow_fingerprints(df, "text").collect()}
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # (here far longer) must yield at least one shared fingerprint
    assert out[1] & out[2]
    assert not (out[1] & out[3] and out[2] & out[3])
    # deterministic across runs
    again = {r.doc_id: set(r.fps)
             for r in winnow_fingerprints(df, "text").collect()}
    assert again == out


def test_winnow_fingerprints_short_and_empty(spark):
    from tap_airbyte_wrapper_spark.functions import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, None)], "doc_id int, text string")
    rows = {r.doc_id: r.fps for r in winnow_fingerprints(df, "text").collect()}
    # shorter-than-gram texts produce exactly one fingerprint
    assert len(rows[1]) == 1 and len(rows[2]) == 1 and len(rows[3]) == 1
    B, MOD = 1_000_003, 1 << 32
    expect = sum(ord(c) * pow(B, 2 - k, MOD)
                 for k, c in enumerate("abc")) % MOD
    assert rows[2] == [expect]
    md5_rows = {r.doc_id: r.fps for r in winnow_fingerprints(
        df, "text", hash_fn="md5").collect()}
    import hashlib
    assert md5_rows[2] == [hashlib.md5(b"abc").hexdigest()]


def test_normalize_text_matches_duckdb_semantics(spark):
    """Engine normalize_text must equal DuckDB's
    strip_accents(nfc_normalize(...)) on the hard cases (NFD input,
    Hangul recomposition, ligatures, stacked combining marks) — the
    exact expression the normalize_docs oracle runs."""
    import duckdb
    from tap_airbyte_wrapper_spark.functions import normalize_text
    from pyspark.sql import functions as F

    cases = ["café", "café", "ñoño", "straße", "ﬁle",
             "Ａｂｃ１２３", "한국어", "नमस्ते", "é̂x",
             "plain ascii", "", None]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i int, s string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text(F.col("s"), strip_accents=True).alias("n")
    ).collect()}
    con = duckdb.connect()
    for i, s in enumerate(cases):
        want = None if s is None else con.execute(
            "SELECT strip_accents(nfc_normalize(?))", [s]).fetchone()[0]
        assert got[i] == want, (i, s, got[i], want)


def test_normalize_text_forms_and_whitespace(spark):
    from tap_airbyte_wrapper_spark.functions import normalize_text
    from pyspark.sql import functions as F
    import unicodedata

    df = spark.createDataFrame(
        [("  a  b\n\tc  ",), ("\ufb01le",), ("x\u00a0y",)], "s string")
    rows = df.select(
        normalize_text(F.col("s"), collapse_whitespace=True).alias("ws"),
        normalize_text(F.col("s"), form="NFKC",
                       collapse_whitespace=True).alias("nfkc_ws"),
    ).collect()
    assert rows[0]["ws"] == "a b c"
    assert rows[1]["nfkc_ws"] == unicodedata.normalize("NFKC", "\ufb01le") == "file"
    # collapse is ASCII-whitespace (matches the RE2/JVM oracle); NBSP
    # survives NFC but folds to a regular space under NFKC
    assert rows[2]["ws"] == "x\u00a0y"
    assert rows[2]["nfkc_ws"] == "x y"

    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(F.col("s"), form="NFX")


GOOD_PROSE = (
    "The quick brown fox jumps over the lazy dog and then runs to have "
    "a rest of that day with friends. " * 5
)


def _gopher(spark, text):
    from tap_airbyte_wrapper_spark.functions import gopher_rules

    return one(spark, text).select(
        gopher_rules(F.col("text")).alias("g")).select("g.*").collect()[0]


def test_gopher_rules_passes_prose(spark):
    r = _gopher(spark, GOOD_PROSE)
    assert r["pass"] and r.words_ok and r.mean_word_ok and r.symbol_ok
    assert r.bullet_ok and r.ellipsis_ok and r.alpha_ok and r.stopword_ok


def test_gopher_rules_word_count_gate(spark):
    short = _gopher(spark, "the cat sat on that mat with milk")
    assert not short.words_ok and not short["pass"]
    # other rules still judge the short doc on its own merits
    assert short.stopword_ok and short.alpha_ok


def test_gopher_rules_bullet_and_ellipsis_lines(spark):
    # Rae et al. A1.1 removes only when the fraction EXCEEDS the
    # threshold: exactly 90% bullets passes, anything above fails.
    at_boundary = "\n".join(["- item %d" % i for i in range(9)]
                            + ["plain line"])
    assert _gopher(spark, at_boundary).bullet_ok  # 9/10 == 0.9 passes
    all_bullets = "\n".join(["- item %d" % i for i in range(10)])
    assert not _gopher(spark, all_bullets).bullet_ok  # 10/10 > 0.9
    dots = "\n".join(["this line trails off..."] * 3 + ["solid line"] * 3)
    assert not _gopher(spark, dots).ellipsis_ok  # 3/6 = 0.5 > 0.3
    dots_edge = "\n".join(["trails off..."] * 3 + ["solid line"] * 7)
    assert _gopher(spark, dots_edge).ellipsis_ok  # 3/10 == 0.3 passes


def test_gopher_rules_symbol_and_alpha(spark):
    hashy = " ".join(["#tag"] * 10)  # 10 hashes / 10 words = 1.0 > 0.1
    assert not _gopher(spark, hashy).symbol_ok
    nums = " ".join(["123"] * 8 + ["abc"] * 2)  # alpha frac 0.2 < 0.8
    assert not _gopher(spark, nums).alpha_ok


def test_gopher_rules_stopwords_distinct_not_repeats(spark):
    # 'the' repeated is ONE distinct stop word -> fails the >=2 rule
    assert not _gopher(spark, "the the the the cat").stopword_ok
    assert _gopher(spark, "the cat with a hat").stopword_ok


def test_gopher_rules_empty_doc(spark):
    r = _gopher(spark, "")
    assert not r.words_ok and not r.mean_word_ok and not r.alpha_ok
    # no lines / no symbols -> the ratio rules pass vacuously
    assert r.bullet_ok and r.ellipsis_ok and r.symbol_ok
    assert not r["pass"]


def _c4(spark, text, **kw):
    from tap_airbyte_wrapper_spark.functions import c4_clean

    return one(spark, text).select(
        c4_clean(F.col("text"), **kw).alias("c")).select("c.*").collect()[0]


def test_c4_clean_keeps_terminal_punct_lines(spark):
    text = "\n".join([
        "A good sentence that stays here.",
        "no terminal punctuation on this line",
        "Too few.",                      # 2 words < 3
        "Another proper sentence stays!",
        'He said "stop".',
        "This line mentions JavaScript somewhere.",
    ])
    r = _c4(spark, text, min_sentences=1)
    kept = r.clean_text.split("\n")
    assert kept == ["A good sentence that stays here.",
                    "Another proper sentence stays!",
                    'He said "stop".']
    assert r.n_lines_kept == 3 and not r.dropped


def test_c4_clean_page_level_drops(spark):
    base = "One full sentence here. " * 6  # plenty of sentences
    assert not _c4(spark, base).dropped
    assert _c4(spark, base + " config { x }").dropped
    assert _c4(spark, base + " Lorem Ipsum filler").dropped
    assert _c4(spark, "Just one sentence survives here.").dropped  # <5 marks


def test_c4_clean_counts_sentences_in_kept_text_only(spark):
    # 'Ha. No.' ends in a terminal mark but has only 2 words, so the
    # line is dropped — its 2 marks must not count toward n_sentences
    text = "Keep this sentence now. And keep this one too.\nHa. No."
    r = _c4(spark, text, min_sentences=1)
    assert r.n_sentences == 2


def test_url_host_and_parent_domains(spark):
    from tap_airbyte_wrapper_spark.functions import parent_domains, url_host

    df = spark.createDataFrame(
        [("HTTPS://WWW.Sub.Example.COM:8443/a?b=1",),
         ("http://localhost:8080/x",),
         ("not a url",),
         ("https://x@blocked.com/",),       # userinfo must not hide the host
         ("https://u:p@www.blocked.com./p",),
         # multi-'@' userinfo: the host is after the LAST '@'
         ("https://u@x@blocked.com/p",)], "url string")
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        parent_domains(url_host(F.col("url"))).alias("p")).collect()
    assert rows[0].h == "sub.example.com"
    assert rows[0].p == ["sub.example.com", "example.com"]
    assert rows[1].h == "localhost" and rows[1].p == ["localhost"]
    assert rows[2].h == ""
    assert rows[3].h == "blocked.com"
    assert rows[4].h == "blocked.com"
    assert rows[5].h == "blocked.com"


def test_domain_filter_block_allow_and_df_blocklist(spark):
    from tap_airbyte_wrapper_spark.functions import domain_filter

    df = spark.createDataFrame(
        [(1, "https://ads.tracker.net/a"),
         (2, "https://www.example.com/b"),
         (3, "https://deep.sub.tracker.net/c"),
         (4, "https://python.org/d")], "id long, url string")
    kept = domain_filter(df, "url", ["tracker.net"], mode="block")
    assert sorted(r.id for r in kept.collect()) == [2, 4]
    allowed = domain_filter(df, "url", ["tracker.net"], mode="allow")
    assert sorted(r.id for r in allowed.collect()) == [1, 3]
    # 1-column DataFrame blocklist is collected under the guard
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept2 = domain_filter(df, "url", bl, mode="block")
    assert sorted(r.id for r in kept2.collect()) == [1, 3, 4]
    # empty blocklist: block keeps everything, allow keeps nothing
    assert domain_filter(df, "url", [], mode="block").count() == 4
    assert domain_filter(df, "url", [], mode="allow").count() == 0
    with pytest.raises(ValueError):
        domain_filter(df, "url", ["x"], mode="purge")
    with pytest.raises(ValueError):
        domain_filter(df, "url", df.select("id", "url"))


def test_domain_filter_is_map_only(spark, sf_dir):
    from tap_airbyte_wrapper_spark.functions import domain_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.concat(F.lit("https://h"), F.col("doc_id") % 7,
                           F.lit(".example.com/p")).alias("url"))
    plan = domain_filter(docs, "url", [f"h{i}.example.com" for i in range(3)])\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
