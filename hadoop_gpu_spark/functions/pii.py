"""PII detection / redaction column kernels (LLM-pipeline surface).

The reference has no text-scrubbing operator (its text surface stops at
grep/wordcount — ``X/Grep.java:41``, ``X/WordCount.java:43``); scrubbing
emails / phone numbers / IP addresses out of a crawl is a standard
pre-training pass, so it joins the beyond-reference pipeline set
(SURVEY.md "LLM-data-pipeline" extensions).

Design rules:

- Pure column expressions (``regexp_count`` / ``regexp_replace``) — JVM
  whole-stage codegen, no Python in the hot path, map-only plan (zero
  shuffles at any scale: each document is scrubbed where it sits).
- Patterns restricted to the syntax subset where Java ``Pattern`` (Spark
  executors) and RE2 (the DuckDB oracle) agree exactly: ASCII classes,
  bounded repetition, ``\\b`` word boundaries. No backreferences, no
  lookaround, no Unicode classes — those diverge between engines and are
  banned here by ``tests/test_pending_gates.py``
  (``test_pii_regex_engine_parity_on_edge_strings``), which runs both
  engines over the same corpus and requires identical redactions.
- Counts are taken BEFORE redaction; redaction order is fixed
  (email -> phone -> IPv4) so a pattern can never match inside another
  pattern's replacement token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One pattern per PII family, in the Java/RE2 common subset.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,4}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-family match counts on the ORIGINAL text (pre-redaction)."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
        "n_ips": F.regexp_count(col, F.lit(IPV4_RE)).cast("long"),
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its family token (email, phone, IPv4
    — in that fixed order)."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)


def attach_synthetic_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically inject PII into a text column (gate fixture).

    The synthetic corpus contains no PII, so the gate builds its own: a
    contact sentence derived byte-by-byte from ``md5(text)`` is appended
    to each document (same recipe the media gates use for byte fixtures —
    ``multimodal.attach_probe_media``). Every document gains one email;
    documents with ``b5 % 2 = 0`` gain a phone number; ``b5 % 3 = 0`` an
    IPv4; ``b0 % 4 = 0`` a second email — so the per-family counts vary
    per document and the redaction pass is never vacuous. The DuckDB
    oracle rebuilds the identical string from the same md5 bytes.
    """
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    b = [
        F.conv(F.substring(h, 1 + 2 * i, 2), 16, 10).cast("long") for i in range(6)
    ]
    email1 = F.concat(F.lit("user"), b[0], F.lit("@mail"), b[1], F.lit(".net"))
    email2 = F.when(
        b[0] % 4 == 0,
        F.concat(F.lit(" cc admin"), b[5], F.lit("@host"), b[2], F.lit(".net")),
    ).otherwise(F.lit(""))
    phone = F.when(
        b[5] % 2 == 0,
        F.concat(
            F.lit(" call +1-"),
            (b[2] % 800 + 200),
            F.lit("-"),
            (b[3] % 900 + 100),
            F.lit("-"),
            (b[4] * 256 + b[5]) % 9000 + 1000,
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        b[5] % 3 == 0,
        F.concat(F.lit(" from 10."), b[2], F.lit("."), b[3], F.lit("."), b[4]),
    ).otherwise(F.lit(""))
    pii_text = F.concat(
        F.col(text_col), F.lit(" contact "), email1, email2, phone, ip, F.lit(" end")
    )
    return df.select(F.col(id_col), pii_text.alias("text"))


# DuckDB mirror of attach_synthetic_pii (same md5 bytes, same string), used
# by the gate oracle. ``b(i)`` is the i-th md5 hex byte as BIGINT.
def _sql_b(i: int) -> str:
    return f"('0x' || substr(h, {1 + 2 * i}, 2))::BIGINT"


SYNTH_PII_SQL = (
    "SELECT doc_id, text || ' contact '"
    f" || 'user' || {_sql_b(0)} || '@mail' || {_sql_b(1)} || '.net'"
    f" || CASE WHEN {_sql_b(0)} % 4 = 0 THEN ' cc admin' || {_sql_b(5)}"
    f"      || '@host' || {_sql_b(2)} || '.net' ELSE '' END"
    f" || CASE WHEN {_sql_b(5)} % 2 = 0 THEN ' call +1-' || ({_sql_b(2)} % 800 + 200)"
    f"      || '-' || ({_sql_b(3)} % 900 + 100)"
    f"      || '-' || (({_sql_b(4)} * 256 + {_sql_b(5)}) % 9000 + 1000) ELSE '' END"
    f" || CASE WHEN {_sql_b(5)} % 3 = 0 THEN ' from 10.' || {_sql_b(2)}"
    f"      || '.' || {_sql_b(3)} || '.' || {_sql_b(4)} ELSE '' END"
    " || ' end' AS text"
    " FROM (SELECT doc_id, text, md5(text) AS h FROM documents)"
)
