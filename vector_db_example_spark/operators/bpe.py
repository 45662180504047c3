"""Byte-pair-encoding vocabulary training over a Spark corpus.

Extension beyond the reference surface (north-star text analysis): the
engine's token counting (`operators/textstats.py`) uses whitespace and
regex tokenizers; real LLM pipelines train a subword vocabulary. This
module implements classic BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") with the standard
two-tier architecture every production tokenizer trainer uses:

* corpus tier (Spark) — ONE tokenize + groupBy pass reduces the corpus
  to a word-frequency table. This is the only part whose cost scales
  with the data; at 100 TB it is one shuffle on the word key and the
  result is vocabulary-sized (≤ a few million rows), not corpus-sized.
* trainer tier (driver) — the sequential merge loop runs over that
  frequency dict in plain Python. BPE merges are inherently ordered
  (merge i+1 counts pairs that only exist after merge i), so this stage
  is NOT a Spark job anywhere, including real trainers
  (HuggingFace/SentencePiece train from a word-count file the same way).

Determinism: ties in pair frequency break lexicographically, so the
merge table is a pure function of the corpus — reproducible across
runs, partitionings and engines (pytest pins the paper's classic
example; the registry entry is rows-only because a sequential merge
loop has no SQL encoding).

Encoding (applying a trained merge table to text) is corpus-tier again:
an Arrow-batched pandas UDF with the merge ranks in its closure — the
greedy lowest-rank-first merge application, identical to the trainer's
segmentation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import extract_tokens

#: Marks the end of a word so merges never cross word boundaries and the
#: encoder can restore spacing exactly (the paper's `</w>`).
END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale pass of BPE
    training. One explode + one groupBy shuffle; map-side partial
    counts make the shuffle vocabulary-sized."""
    return (
        docs.select(F.explode(extract_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(
    vocab: dict[tuple[str, ...], int],
) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_freqs: Iterable[tuple[str, int]],
    num_merges: int = 100,
) -> list[tuple[str, str]]:
    """Train ``num_merges`` BPE merges from a (word, freq) iterable —
    e.g. ``word_frequencies(docs).collect()``. Deterministic: the best
    pair is max frequency, ties broken by lexicographic pair order.
    Stops early when no pair occurs twice."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        symbols = tuple(word) + (END_OF_WORD,)
        vocab[symbols] = vocab.get(symbols, 0) + int(freq)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        if top < 2:
            break
        merges.append(best_pair)
        vocab = {
            _merge_word(symbols, best_pair): freq
            for symbols, freq in vocab.items()
        }
    return merges


def bpe_segment_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy lowest-rank-first merge application — exactly how training
    segmented the word, so encode(train corpus) uses only vocab tokens."""
    symbols: list[str] = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encoder(merges: Sequence[tuple[str, str]]) -> Callable:
    """Arrow-batched encoder UDF: text → array of BPE tokens. The merge
    ranks ride the closure (vocabulary-sized, like the IVF centroid
    matrix); per-word segmentations are memoized per worker since
    natural corpora repeat words heavily.

    Words are extracted with the SAME ``TOKEN_PATTERN`` regex that
    ``word_frequencies`` trains from (CJK>=2 / latin>=3 runs) — so
    encode(train corpus) sees exactly the trained word population and
    never silently falls back to character-level segmentation on
    punctuation/digit-attached words the trainer never counted."""
    import re

    from pyspark.sql.functions import pandas_udf

    from ..functions.text import TOKEN_PATTERN

    word_re = re.compile(TOKEN_PATTERN)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    memo: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks: list[str] = []
            for w in word_re.findall(str(text or "")):
                seg = memo.get(w)
                if seg is None:
                    seg = bpe_segment_word(w, ranks)
                    if len(memo) < 1_000_000:
                        memo[w] = seg
                toks.append(seg)
            out.append([s for seg in toks for s in seg])
        return pd.Series(out)

    return encode
