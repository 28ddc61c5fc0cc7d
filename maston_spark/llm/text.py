"""Text analysis operators over document tables.

Everything here is built-in `pyspark.sql.functions` column algebra —
no Python UDFs — so the hot path is whole-stage codegen and scales
linearly with executors. Language-ID and fingerprinting are
deliberately deterministic (hash/stopword heuristics) so they are
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic (extend freely; heuristic quality is not the point —
# determinism + distributed shape is)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "los"),
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
# non-space symbols — a cheap stand-in for GPT-style pre-tokenization.
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(col) -> Column:
    return F.split(col, TOKEN_SPLIT_RE)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: lengths, token counts, ratios."""
    t = tokens(F.col(text_col))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_tokens = F.size(t)
    return df.select(
        "*",
        F.length(text_col).alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                F.transform(t, lambda x: F.length(x)),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            )
            / n_tokens,
            6,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.filter(t, lambda x: F.array_contains(stop_en, x))) / n_tokens, 6
        ).alias("stopword_ratio"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: score = count of language stopwords
    present in the token set; argmax with deterministic tie-break on
    language code; 'und' when no stopwords hit at all."""
    t = F.array_distinct(tokens(F.col(text_col)))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(t, lambda x: F.array_contains(sw, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by (score, lang): struct comparison is lexicographic, so ties
    # on score resolve to the lexicographically greatest language code —
    # deterministic, and mirrored exactly by the SQL oracle's CASE chain.
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality pre-filter: length window + punctuation and
    stopword gates, composed into a [0,1] score. Thresholds mirror
    common training-data pipeline defaults; everything is codegen."""
    t = tokens(F.col(text_col))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_chars = F.length(text_col)
    n_tokens = F.size(t)
    stopword_ratio = F.round(
        F.size(F.filter(t, lambda x: F.array_contains(stop_en, x))) / n_tokens, 6
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9 ]", "")) / n_chars, 6
    )
    upper_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", "")) / n_chars, 6
    )
    out = df.select(
        "*",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
    )
    score = F.round(
        F.when(F.col("n_tokens").between(20, 10000), F.lit(0.4)).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.2, F.lit(0.3)).otherwise(0.0)
        + F.when(F.col("stopword_ratio") > 0.01, F.lit(0.3)).otherwise(0.0),
        6,
    )
    return out.withColumn("quality_score", score)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Cross-engine stable."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.md5(norm))
