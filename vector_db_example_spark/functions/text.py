"""Text scalar functions (SURVEY.md §2.8 F1–F6) — pure Catalyst expressions.

Mirrors the reference's preprocessing/tokenization semantics
(/root/reference/src/app.py:190-203, 319-340, 549-599) as JVM-side
expressions: ``regexp_replace`` / ``regexp_extract_all`` / ``split`` +
higher-order array functions. One row → many rows shapes (tokens, chunks)
are expression + ``explode`` — no UDTF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: F1 — characters to strip: anything outside word chars, CJK, whitespace
#: and base punctuation (reference regex at src/app.py:196).
CLEAN_PATTERN = r"[^\w一-鿿\s.,!?;:，。！？；：]"

#: F2 — token pattern: CJK runs of >=2 or latin words of >=3
#: (reference regex at src/app.py:334).
TOKEN_PATTERN = r"[一-龥]{2,}|[a-zA-Z]{3,}"

#: F3 — sentence-chunk split class: CJK + ASCII punctuation
#: (reference at src/app.py:322).
CHUNK_SPLIT_PATTERN = r"[，。！？；:,\.!?;]"

#: F6 — chapter-header pattern (reference at src/app.py:567).
CHAPTER_HEADER_PATTERN = r"第[零一二三四五六七八九十百千]+章"

#: Engine stopword list (the reference ships a small hand-rolled set at
#: src/app.py:26-31; ours is an equivalent-purpose list for the test
#: corpus's language mix — the operator is the anti-join, not the list).
STOPWORDS = (
    "the", "and", "for", "that", "this", "with", "are", "was", "were",
    "from", "have", "has", "had", "not", "but", "all", "can", "will",
)


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def clean_content(text: Column | str) -> Column:
    """F1: strip non-text chars, collapse whitespace, trim
    (reference _preprocess_content, src/app.py:190-203)."""
    t = F.coalesce(_c(text), F.lit(""))
    t = F.regexp_replace(t, CLEAN_PATTERN, "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def extract_tokens(text: Column | str) -> Column:
    """F2: token array (CJK>=2 / latin>=3 runs) — reference
    extract_keywords regex (src/app.py:334). Returns array<string>."""
    return F.regexp_extract_all(_c(text), F.lit(TOKEN_PATTERN), 0)


def split_sentences(text: Column | str) -> Column:
    """F3: split on sentence punctuation → array<string> (untrimmed;
    callers explode + trim + length-filter, reference src/app.py:319-330)."""
    return F.split(_c(text), CHUNK_SPLIT_PATTERN)


def token_windows(text: Column | str, window: int = 16) -> Column:
    """Fixed-size token-window chunking (array<string> of space-joined
    windows) — the LLM-pipeline chunker for punctuation-free corpora.
    Pure higher-order expressions: split → sequence → slice. The token
    array is bound through a one-element outer transform so the
    per-window lambda indexes a lambda VARIABLE, not the split subtree —
    lambdas don't CSE outer expressions, and the naive form re-splits
    the text once per window (see operators/dedup.shingles and
    SCALING.md for the measured rule)."""

    def per_toks(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.sequence(
            F.lit(0), F.greatest((n - 1) / window, F.lit(0)).cast("int")
        )
        return F.transform(
            starts,
            lambda i: F.array_join(F.slice(toks, i * window + 1, window), " "),
        )

    return F.element_at(
        F.transform(F.array(F.split(F.trim(_c(text)), r"\s+")), per_toks), 1
    )


def prefix_key(text: Column | str, n: int = 50) -> Column:
    """F5: the reference's dedup key — first ``n`` chars of content
    (src/app.py:296)."""
    return F.substring(_c(text), 1, n)


def is_chapter_header(line: Column | str) -> Column:
    """F6: chapter-header detection (src/app.py:567)."""
    t = F.trim(_c(line))
    return t.rlike(CHAPTER_HEADER_PATTERN) | t.contains("章节")


def score_expr(distance: Column | str) -> Column:
    """F4: score = 1 - distance (src/app.py:258)."""
    return F.lit(1.0) - _c(distance)
