"""PII detection / redaction for training-data pipelines: scrub emails,
phone numbers, IPv4 addresses and long digit runs (account/card-style
identifiers) from a text column, and count what was scrubbed.

Not in the reference (its transform surface is stream maps, SURVEY.md
§2.2); this is part of the LLM-curation layer.  Pure Catalyst
``regexp_replace`` / ``regexp_extract_all`` chains — JVM regex, no
Python UDF, zero shuffle, so the cost is one linear scan per pattern
per row and the operator composes into any projection.

Pattern order matters and is fixed: emails first (so the user@host
digits cannot be half-eaten by the phone pattern), then IPv4 (dotted
digits would otherwise match the id-run pattern), then phones, then
bare digit runs.  The same four patterns in the same order reproduce
in any PCRE-ish engine, which keeps the operator oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts", "pseudonymize",
           "luhn_valid", "redact_cards"]

# name → (regex, replacement token). Insertion order = application order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (
        r"(?<![\d.])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\d.])",
        "<PHONE>",
    ),
    "id_number": (r"(?<![\d.])\d{8,}(?![\d.])", "<ID>"),
}


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its type token."""
    out = col
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-type match counts (``n_email``, ``n_ipv4``,
    ``n_phone``, ``n_id_number``) counted under the same sequential
    masking as :func:`redact_pii`, so the two always agree: a digit run
    inside an already-redacted email is not double-counted as an id."""
    fields = []
    cur = col
    for name, (pattern, token) in PII_PATTERNS.items():
        fields.append(
            F.size(F.regexp_extract_all(cur, F.lit(pattern), 0)).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pattern, token)
    return F.struct(*fields)


def pseudonymize(col: Column, salt: str, keep_len: int = 16) -> Column:
    """Deterministic keyed pseudonym for an identifier column: the
    first ``keep_len`` hex chars of ``md5(salt || value)``.

    Redaction (:func:`redact_pii`) destroys joinability; pipelines that
    must keep user-level grouping (dedup by author, per-user rate
    stats) while removing the raw identifier need a consistent token
    instead.  Same value + same salt → same token across every table
    and every run, so keys still join; without the salt the token is
    not reversible by rainbow lookup of the bare value.  Nulls stay
    null.  Pure JVM expression — zero shuffle, oracle-reproducible
    (``md5`` is everywhere); rotate the salt per release to break
    cross-release linkage.
    """
    return F.when(
        col.isNotNull(),
        F.substring(
            F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, keep_len),
    )


# Card-shaped digit run: 12-19 digits with optional single space/dash
# separators.  Deliberately lookaround-free — DuckDB's RE2 has no
# lookbehind, and the oracle must run the IDENTICAL pattern.  A >19-digit
# run therefore yields a 19-digit candidate (plus possibly another from
# the remainder); the Luhn check rejects such junk.
CARD_CANDIDATE = r"(?:\d[ -]?){11,18}\d"


def luhn_valid(col: Column) -> Column:
    """True when the digits of ``col`` (separators ignored) form a valid
    Luhn checksum of plausible PAN length (12-19 digits).

    The checksum is the decisive precision filter for card-number
    scrubbing: a bare ``\\d{16}`` rule redacts every order id and
    timestamp-ish run it meets, while only ~1 in 10 random runs passes
    Luhn.  Pure Catalyst higher-order expressions (sequence/transform/
    aggregate over per-position digits) — JVM codegen, zero shuffle,
    usable inside array lambdas, and exactly reproducible in ANSI SQL.
    """
    ds = F.regexp_replace(col, "[^0-9]", "")
    n = F.length(ds)
    # greatest() keeps sequence() ascending for empty/blank input (the
    # n BETWEEN 12 AND 19 gate already rejects those rows)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))

    def contrib(i):
        d = F.substring(ds, i, F.lit(1)).cast("int")
        doubled = 2 * d
        return F.when((n - i + 1) % 2 == 1, d).otherwise(
            F.when(doubled > 9, doubled - 9).otherwise(doubled))

    total = F.aggregate(
        F.transform(idx, contrib), F.lit(0), lambda a, x: a + x)
    return (n >= 12) & (n <= 19) & (total % 10 == 0)


def redact_cards(col: Column, token: str = "<CARD>") -> Column:
    """Text with every Luhn-VALID card-shaped digit run replaced by
    ``token``; invalid runs (order ids, timestamps) are left alone.

    Conditional replacement is not expressible as one regexp_replace,
    so the operator extracts candidates, Luhn-filters the small
    per-row array, and folds ``replace`` over the survivors — still
    pure per-row JVM expressions, zero shuffle.  Run BEFORE
    :func:`redact_pii` in a scrub chain: its ``id_number`` rule would
    otherwise eat card runs before validation (same ordering contract
    as the in-dict PII_PATTERNS sequencing).
    """
    cands = F.regexp_extract_all(col, F.lit(CARD_CANDIDATE), 0)
    valid = F.filter(cands, luhn_valid)
    return F.aggregate(
        valid, col, lambda acc, m: F.replace(acc, m, F.lit(token)))
