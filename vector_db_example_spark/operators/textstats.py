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


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-style quality scoring with a corpus-trained bigram LM
    (the KenLM-shaped filter of CCNet/Gopher-era pipelines, closed-form):
    add-one-smoothed bigram probabilities P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V)
    trained on the WHOLE corpus in one pass, then each document scored by
    its average token-transition log-probability. Low scores flag
    improbable token streams (boilerplate, garbled extraction, wrong-
    language residue).

    Returns (id_col, n_bigrams, avg_logp) for every doc with ≥2 tokens;
    ``avg_logp`` is UNROUNDED (callers round at the edge).

    Determinism: counts and V are integer-exact; each doc's per-position
    log terms are summed in POSITION order via a sorted-struct fold
    (collect_list order is nondeterministic under shuffle — sorting by
    position pins the float fold so the oracle hash-matches); `ln`
    bit-parity with DuckDB is already proven by every BM25 oracle.

    Scale shape: one tokenize pass; the bigram/context count tables are
    vocabulary-sized (tiny vs corpus) and BROADCAST back — the corpus is
    never shuffled; per-doc reassembly shuffles one (pos, logp) row per
    token, the same cost class as any tokenize-explode aggregation.
    """
    # materialize the token array ONCE per row: the lambda below indexes
    # it ~2 positions per element, and a bare extract_tokens subtree
    # inside the lambda re-runs the regex per element_at — O(tokens)
    # regex evaluations per doc (measured 10x slower)
    toks = F.col("__toks")
    tokenized = docs.select(
        F.col(id_col), extract_tokens(F.col(text_col)).alias("__toks")
    )
    bigram_structs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    rows = (
        tokenized.filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(bigram_structs).alias("bg"))
        .select(
            id_col,
            F.col("bg.pos").alias("pos"),
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )
    )
    bg_counts = rows.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c_bg")
    )
    ctx_counts = rows.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c_ctx")
    )
    vocab = docs.select(
        F.explode(extract_tokens(F.col(text_col))).alias("t")
    ).agg(F.count_distinct("t").cast("double").alias("v"))

    scored = (
        rows.join(F.broadcast(bg_counts), ["w1", "w2"])
        .join(F.broadcast(ctx_counts), ["w1"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.col("c_bg") + F.lit(1.0)) / (F.col("c_ctx") + F.col("v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("sum_logp"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        (F.col("sum_logp") / F.col("n_bigrams").cast("double")).alias("avg_logp"),
    )


def naive_bayes_lang_predictions(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial naive-Bayes language classifier, trained AND applied
    on the corpus in one DAG — the supervised counterpart of the
    marker-word ``lang_pred`` heuristic (a fastText-shaped linear
    classifier, closed-form: NB training is just counting, which is why
    it distributes perfectly).

    Training = three count aggregates (per-(label, token), per-label
    totals, label priors) plus the vocab size; all are label×vocab-sized
    and broadcast. Inference joins each token position against the count
    tables for every candidate label and folds per-(doc, candidate)
    log-probabilities in POSITION order (sorted-struct fold — the
    bigram-LM discipline that keeps the doubles bit-identical to the SQL
    oracle). The argmax is ``min(struct(-score, lang))``: score desc,
    lexicographic label on exact float ties — deterministic under any
    partitioning.

    Returns (id_col, label_col, pred_lang). Scale: one tokenize pass,
    count tables broadcast, candidate fan-out = #labels (bounded), no
    shuffle wider than rows × labels."""
    toks = F.col("__toks")
    tokenized = docs.select(
        F.col(id_col), F.col(label_col), extract_tokens(F.col(text_col)).alias("__toks")
    )
    pos_structs = F.transform(
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.struct(i.alias("pos"), F.element_at(toks, i).alias("t")),
    )
    rows = (
        tokenized.filter(F.size(toks) >= 1)
        .select(id_col, label_col, F.explode(pos_structs).alias("s"))
        .select(id_col, label_col, F.col("s.pos").alias("pos"), F.col("s.t").alias("t"))
    )
    ct = rows.groupBy(F.col(label_col).alias("cand_lang"), "t").agg(
        F.count(F.lit(1)).cast("double").alias("c_lt")
    )
    tot = rows.groupBy(F.col(label_col).alias("cand_lang")).agg(
        F.count(F.lit(1)).cast("double").alias("c_l")
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_total"))
    priors = (
        docs.groupBy(F.col(label_col).alias("cand_lang"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_lang"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "cand_lang", F.log(F.col("n_lang") / F.col("n_total")).alias("lp")
        )
    )
    vocab = rows.agg(F.count_distinct("t").cast("double").alias("v"))
    langs = docs.select(F.col(label_col).alias("cand_lang")).distinct()

    scored_rows = (
        rows.crossJoin(F.broadcast(langs))
        .join(F.broadcast(ct), ["cand_lang", "t"], "left")
        .join(F.broadcast(tot), "cand_lang")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c_lt"), F.lit(0.0)) + F.lit(1.0))
                / (F.col("c_l") + F.col("v"))
            ),
        )
    )
    per_cand = (
        scored_rows.groupBy(id_col, label_col, "cand_lang")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "logp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["logp"],
            ).alias("sum_logp")
        )
        .join(F.broadcast(priors), "cand_lang")
        .withColumn("score", F.col("lp") + F.col("sum_logp"))
    )
    return (
        per_cand.groupBy(id_col, label_col)
        .agg(
            F.min(
                F.struct((-F.col("score")).alias("neg"), F.col("cand_lang").alias("lang"))
            ).alias("__w")
        )
        .select(id_col, label_col, F.col("__w.lang").alias("pred_lang"))
    )
