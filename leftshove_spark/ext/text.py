"""Text-analysis operators for training-data pipelines.

All pure built-in expressions (JVM codegen, zero Python in the data
path): tokenization, per-document quality statistics, a stopword-list
language-ID heuristic, whitespace + BPE-ish token counting, and
document fingerprinting. Each has an exact ANSI twin so the driver's
DuckDB oracle verifies values bit-for-bit.

Scale: every operator here is a narrow per-row projection — no shuffle,
no UDF, embarrassingly parallel at any table size. The natural 100 TB
plan is scan → project → write, one stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash60

# Latin-script stopword shortlists for the language heuristic. Real
# pipelines extend these (and add CJK/Unicode-range character detection
# for zh/ja/ko); the operator structure is identical.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "los", "las", "una", "es", "que", "por", "con"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# GPT2-style pre-tokenizer approximation: letter runs, single digits,
# punctuation singles. ASCII classes only so RE2 (DuckDB) and Java
# (Spark) regex agree exactly.
BPE_ISH_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def tokenize(text: Column | str) -> Column:
    """Lowercased alphanumeric tokens.
    SQL twin: list_filter(string_split_regex(lower(t), '[^a-z0-9]+'), x -> x != '')"""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def _hits(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics: token counts, uniqueness and
    stopword ratios, mean token length, and a blended quality score —
    the filter signals of a pretraining-data quality gate (length,
    repetition, stopword density).

    Ratios are int/int divisions in IEEE double; the score is a fixed
    arithmetic blend — both engines compute identical bits.
    """
    t = tokenize(text_col)
    n = F.size(t)
    uniq = F.size(F.array_distinct(t))
    stop = _hits(t, STOPWORDS["en"])
    sumlen = F.aggregate(F.transform(t, F.length), F.lit(0).cast("long"), lambda a, x: a + x)
    n_tokens = n.cast("long").alias("n_tokens")
    uniq_ratio = (uniq.cast("double") / n).alias("uniq_ratio")
    stop_ratio = (stop.cast("double") / n).alias("stop_ratio")
    avg_len = (sumlen.cast("double") / n).alias("avg_token_len")
    score = (
        (stop.cast("double") / n) * F.lit(0.4)
        + (uniq.cast("double") / n) * F.lit(0.3)
        + F.least(F.lit(1.0), n.cast("double") / F.lit(100.0)) * F.lit(0.3)
    ).alias("quality_score")
    return df.filter(n > 0).select(
        id_col, n_tokens, uniq_ratio, stop_ratio, avg_len, score
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID with a fixed priority tiebreak
    (en→de→fr→es→und). Deterministic by construction; on the synthetic
    fixture (English-vocabulary word soup regardless of the lang label)
    it predicts 'en'/'und', which the agree flag makes visible."""
    t = tokenize(text_col)
    hits = {lang: _hits(t, words) for lang, words in STOPWORDS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["es"]) & (hits["en"] > 0),
            "en",
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]) & (hits["de"] > 0), "de")
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] > 0), "fr")
        .when(hits["es"] > 0, "es")
        .otherwise("und")
    )
    out = [F.col(id_col)]
    out += [hits[lang].cast("long").alias(f"hits_{lang}") for lang in STOPWORDS]
    out += [pred.alias("pred_lang"), (pred == F.col("lang")).alias("agree")]
    return df.select(*out)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish token counts — the budget arithmetic of a
    training-data pipeline (how many tokens does this corpus hold?)."""
    col = F.col(text_col)
    return df.select(
        id_col,
        F.size(F.filter(F.split(col, " +"), lambda x: x != "")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(col, F.lit(BPE_ISH_RE)).cast("long").alias("n_bpe_tokens"),
        F.length(col).cast("long").alias("n_chars"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: a whole-document content hash over the
    normalized token stream, plus the minimum 3-gram shingle hash (the
    winnowing-style rolling-hash minimizer — a stable short signature
    robust to small edits)."""
    t = tokenize(text_col)
    norm = F.concat_ws(" ", t)
    sh = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(2)),
            lambda i: hash60(
                F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        id_col,
        hash60(norm).alias("content_fp"),
        F.array_min(sh).alias("min_shingle_fp"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 20,
    min_uniq_ratio: float = 0.5,
    min_quality: float = 0.3,
) -> DataFrame:
    """The pretraining-corpus quality GATE: keep only documents passing
    every signal threshold from :func:`text_stats` (the filter step that
    follows scoring in any training-data pipeline). Pure built-in
    expressions over one pass — at 100 TB this is scan → project →
    filter, zero shuffles, and the length predicates prune nothing at
    the parquet level only because the signals are computed; the gate
    itself stays fully pipelined."""
    s = text_stats(df, text_col=text_col, id_col=id_col)
    return s.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("uniq_ratio") >= min_uniq_ratio)
        & (F.col("quality_score") >= min_quality)
    )
