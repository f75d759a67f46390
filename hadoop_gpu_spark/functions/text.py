"""Text-analysis functions for training-data pipelines (north-star surface).

All pure Column expressions over `documents.text` — JVM-side, no Python in
the hot path, so they run at scan speed on 100 TB. Every function has an
exactly-equivalent DuckDB SQL form (used by the oracles in queries.py).

Capabilities: token counting, quality scoring (length/punct/stopword
ratios), language ID (stopword-hit heuristic), document fingerprinting
(rolling-window md5 shingles — basis for MinHash in dedup.minhash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hadoop_gpu_spark.operators.fields import tokenize

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small and fixed: the heuristic must be reproducible in plain
# SQL on any engine. Order matters for deterministic argmax tie-breaks.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "de", "que", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (TokenCountMapper analog, scalar form)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(tokenize(c))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercase corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, "[a-z0-9 ]", "")
    return F.length(stripped) / F.length(c)


def mean_token_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def stopword_hits(text: Column | str, markers: list[str]) -> Column:
    """How many tokens are in the marker set (the language-ID signal)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards moderate length, low punct,
    and a sane mean token length. Deterministic; SQL-portable.

    score = min(tokens,256)/256 * (1 - punct_ratio) with mean token length
    gate [2, 12] halving the score outside the band.
    """
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    base = F.least(n, F.lit(256.0)) / F.lit(256.0) * (F.lit(1.0) - punct_ratio(c))
    mtl = mean_token_len(c)
    return F.when((mtl >= 2) & (mtl <= 12), base).otherwise(base / 2)


def lang_id(text: Column | str) -> Column:
    """Stopword-hit language ID: argmax over LANG_MARKERS hit counts,
    first-listed language wins ties, 'und' (undetermined) when no hits."""
    c = F.col(text) if isinstance(text, str) else text
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # Iterate in reverse so earlier languages win ties (> not >=).
    for lang in reversed(list(LANG_MARKERS)):
        hits = stopword_hits(c, LANG_MARKERS[lang])
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column | str, width: int = 16) -> Column:
    """Document fingerprint: md5 of the document's sorted distinct tokens —
    a canonical bag-of-words hash robust to token order (rolling-hash
    analog, engine-portable)."""
    c = F.col(text) if isinstance(text, str) else text
    canon = F.array_join(F.array_sort(F.array_distinct(tokenize(c))), " ")
    return F.substring(F.md5(F.encode(canon, "UTF-8")), 1, width)


# Explicit whitespace class shared by normalize_text and its DuckDB
# oracle twin: Java's \s includes \x0B (vertical tab), RE2's does not —
# spelling the class out keeps both engines byte-identical (the same
# engine-parity discipline as functions/pii.py).
_WS = " \\t\\n\\r\\f"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(text: Column | str) -> Column:
    """Canonicalize text for dedup keying: ASCII-lowercase (translate,
    not lower() — locale/Unicode-independent in both engines), replace
    every char outside [a-z0-9 + whitespace] with a space, collapse
    whitespace runs, trim. Output alphabet is [a-z0-9 ] only, so
    length/hash comparisons are engine-safe. Pure column expressions —
    map-only, zero shuffles, whole-stage codegen."""
    c = F.col(text) if isinstance(text, str) else text
    low = F.translate(c, _UPPER, _LOWER)
    cleaned = F.regexp_replace(low, f"[^a-z0-9{_WS}]", " ")
    return F.trim(F.regexp_replace(cleaned, f"[{_WS}]+", " "))


NORMALIZE_TEXT_SQL_TMPL = (
    "trim(regexp_replace(regexp_replace("
    "translate({col}, '" + _UPPER + "', '" + _LOWER + "'), "
    "'[^a-z0-9 \\t\\n\\r\\f]', ' ', 'g'), "
    "'[ \\t\\n\\r\\f]+', ' ', 'g'))"
)
