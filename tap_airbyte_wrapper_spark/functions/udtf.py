"""Spark 4 Python UDTFs: table-valued functions for row fan-out.

Completes the UDF surface of SURVEY.md §2.3 (scalar pandas UDFs ->
functions/, grouped-map -> applyInPandas in streaming/, mapInPandas ->
multimodal/, and table-valued fan-out -> here).  UDTFs are the idiomatic
Spark 4 form for one-row-to-many-rows logic with per-row Python state —
use them where the fan-out logic needs imperative code; stick to
``explode`` over builtin arrays when an expression can do it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

__all__ = ["SentenceSplitter", "split_sentences"]

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="idx: int, sentence: string")
class SentenceSplitter:
    """text -> one row per sentence (idx, sentence); terminator-aware
    split, whitespace-trimmed, empty sentences dropped."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if not text:
            return
        for i, s in enumerate(
            s.strip() for s in _SENTENCE_RE.split(text.strip())
        ):
            if s:
                yield i, s


def split_sentences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, idx, sentence) — UDTF applied via lateral join, preserving the
    id column: ``SELECT id, f.* FROM t, LATERAL SentenceSplitter(text) f``."""
    spark = df.sparkSession
    spark.udtf.register("__split_sentences", SentenceSplitter)
    df.createOrReplaceTempView("__udtf_in")
    return spark.sql(
        f"SELECT {id_col}, f.idx, f.sentence "
        f"FROM __udtf_in, LATERAL __split_sentences({text_col}) f"
    )
