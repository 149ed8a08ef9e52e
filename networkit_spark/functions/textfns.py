"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python in the per-row path. Each function
takes/returns DataFrames and is designed to run over a 100 TB
``documents`` table: single narrow projection per doc, no shuffles
except where aggregation is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token = runs of word chars OR single non-space punctuation (BPE-ish
# pre-tokenization: splits "don't" -> don ' t, keeps numbers whole)
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

_EN_STOP = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]
_DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"]
_FR_STOP = ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"]
_ES_STOP = ["el", "la", "los", "y", "es", "no", "una", "con", "por", "para"]


def tokens_col(text: Column) -> Column:
    """array<string> of tokens (regexp-based, deterministic, JVM-side)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(..., n_tokens) — whitespace+punct tokenization, codegen'd."""
    return df.withColumn("n_tokens", F.size(tokens_col(F.col(text_col))))


def _stop_ratio(text: Column, words: list[str]) -> Column:
    """Fraction of lowercase word matches that are in the stopword list —
    computed with one regexp_extract_all + filter, no UDF."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), 0)
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(..., lang_pred, lang_score) — stopword-profile n-gram heuristic:
    the language whose stopword hit-ratio is highest; 'und'
    (undetermined) when all ratios are 0."""
    t = F.col(text_col)
    scores = {
        "en": _stop_ratio(t, _EN_STOP),
        "de": _stop_ratio(t, _DE_STOP),
        "fr": _stop_ratio(t, _FR_STOP),
        "es": _stop_ratio(t, _ES_STOP),
    }
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic priority on ties: en > de > fr > es (first match wins)
    for lang in ("es", "fr", "de", "en"):
        pred = F.when(
            (best_score > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred).withColumn(
        "lang_score", F.round(best_score, 6)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(..., n_chars_q, alpha_ratio, punct_ratio, stop_ratio, quality).

    Classic heuristic quality features (Gopher/C4-style): length,
    alphabetic ratio, punctuation density, English stopword ratio;
    ``quality`` is a deterministic blend in [0,1].
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    stop_ratio = _stop_ratio(t, _EN_STOP)
    quality = F.round(
        (
            F.least(n_chars / F.lit(1000.0), F.lit(1.0)) * 0.25
            + alpha_ratio * 0.35
            + F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 10.0) * 0.2
            + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        ),
        6,
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", quality)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(..., fp) — order-sensitive polynomial rolling hash over tokens,
    computed JVM-side with aggregate():
    ``fp = fold(tokens, 0, (acc, t) -> (acc*31 + tokval(t)) % (2^31-1))``
    with ``tokval = len(t)*1000003 + ascii(first)*257 + ascii(last)``.
    The token value uses only functions with identical cross-engine
    semantics (length/ascii), so the DuckDB oracle reproduces it bit-for-
    bit; the modulus keeps the fold inside int64 under ANSI overflow
    checking."""
    toks = tokens_col(F.col(text_col))
    mod = F.lit(2147483647).cast("long")

    def tokval(t):
        return (
            F.length(t).cast("long") * F.lit(1000003)
            + F.ascii(t).cast("long") * F.lit(257)
            + F.ascii(F.substring(t, -1, 1)).cast("long")
        )

    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31) + tokval(t), mod),
    )
    return df.withColumn("fp", fp)
