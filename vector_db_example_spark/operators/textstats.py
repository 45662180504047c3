"""Text-analysis operators for LLM training-data pipelines (north star):
language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions over token arrays —
at 100 TB these run as a single narrow map stage over the corpus scan
(no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, extract_tokens

#: Distinct marker words per language for the n-gram/stopword-profile
#: language heuristic. Scoring = count of distinct marker hits.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "for", "that", "this", "with", "from"),
    "es": ("el", "la", "los", "las", "que", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "les", "des", "une", "est", "dans"),
}


def _ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def lang_hits(text: Column, lang: str) -> Column:
    """Distinct marker-word hits for ``lang`` (0 when no markers match)."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(_ws_tokens(text), markers))


def lang_pred(text: Column) -> Column:
    """Argmax over language marker hits; 'und' (undetermined) when no
    language scores > 0. Ties resolved in en > es > de > fr order (the
    CASE evaluation order — identical in the SQL mirror)."""
    en, es, de, fr = (lang_hits(text, lang) for lang in ("en", "es", "de", "fr"))
    return (
        F.when((en >= F.greatest(es, de, fr)) & (en > 0), "en")
        .when((es >= F.greatest(de, fr)) & (es > 0), "es")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )


def token_counts(text: Column) -> dict[str, Column]:
    """Three token-count notions: whitespace words, regex tokens
    (the reference's keyword pattern), and a BPE-ish subword proxy
    (vowel/consonant run segmentation)."""
    return {
        "n_ws_tokens": F.size(_ws_tokens(text)),
        "n_regex_tokens": F.size(extract_tokens(text)),
        "n_subword_tokens": F.size(
            F.regexp_extract_all(text, F.lit(r"[aeiou]+|[^aeiou\s]+"), 0)
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4·distinct-token ratio + 0.3·(1 − stopword ratio) + 0.3·length factor.
    Deterministic double math (bit-identical to the SQL mirror)."""
    toks = _ws_tokens(text)
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "double"
    )
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    length_factor = F.least(n / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * (n_distinct / n)
        + F.lit(0.3) * (F.lit(1.0) - n_stop / n)
        + F.lit(0.3) * length_factor
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the whitespace-normalized token
    stream — stable under incidental whitespace differences."""
    return F.md5(F.array_join(_ws_tokens(text), " "))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set in one narrow projection."""
    t = F.col(text_col)
    out = df
    for name, col in token_counts(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("lang_pred", lang_pred(t))
        .withColumn("quality_score", quality_score(t))
        .withColumn("fingerprint", fingerprint(t))
    )
