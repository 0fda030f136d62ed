"""Text analysis operators for the documents table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (regex,
aggregate over split arrays) — no Python UDFs, per input_hint. These are
the transcript-pipeline analogs of the reference's per-signal scalar
stats (``edf_reader.py:222-237``) applied to text payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "que", "una", "con"],
}


def with_text_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-document stats: tokens, chars, punctuation count, alpha count,
    mean token length — all exact integers (division at finalize)."""
    trimmed = F.trim(F.col(text))
    tokens = F.split(trimmed, r"\s+")
    n_tokens = F.when(trimmed == "", 0).otherwise(F.size(tokens)).cast("long")
    n_chars = F.length(F.col(text)).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col(text), r"[\.,;:!\?\"'`()\[\]{}]", ""))
    ).cast("long")
    n_alpha = (
        n_chars - F.length(F.regexp_replace(F.col(text), "[A-Za-z]", ""))
    ).cast("long")
    n_upper = (
        n_chars - F.length(F.regexp_replace(F.col(text), "[A-Z]", ""))
    ).cast("long")
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_calc", n_chars)
        .withColumn("n_punct", n_punct)
        .withColumn("n_alpha", n_alpha)
        .withColumn("n_upper", n_upper)
    )


def with_quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + punctuation ratio
    band + stopword presence (Gopher/C4-style heuristics, deterministic
    double arithmetic from exact integers)."""
    d = with_text_stats(docs, text)
    stop_hits = F.size(
        F.expr(
            "regexp_extract_all(lower(text), '\\\\b("
            + "|".join(STOPWORDS["en"])
            + ")\\\\b', 0)"
        )
    ).cast("long")
    d = d.withColumn("stop_hits", stop_hits)
    len_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    punct_ratio = F.col("n_punct").cast("double") / F.greatest(
        F.col("n_chars_calc"), F.lit(1)
    ).cast("double")
    stop_ratio = F.col("stop_hits").cast("double") / F.greatest(
        F.col("n_tokens"), F.lit(1)
    ).cast("double")
    score = (
        len_ok.cast("double") * 0.4
        + (punct_ratio <= 0.2).cast("double") * 0.3
        + (stop_ratio >= 0.05).cast("double") * 0.3
    )
    return (
        d.withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def with_lang_id(docs: DataFrame, text: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: hits per language list,
    argmax with deterministic ties (smallest hit-count margin → 'und')."""
    d = docs
    for lang, words in STOPWORDS.items():
        pat = r"\\b(" + "|".join(words) + r")\\b"
        d = d.withColumn(
            f"hits_{lang}",
            F.size(F.expr(f"regexp_extract_all(lower({text}), '{pat}', 0)")).cast("long"),
        )
    pairs = F.array(
        *[F.struct(F.col(f"hits_{lg}").alias("h"), F.lit(lg).alias("lg")) for lg in STOPWORDS]
    )
    best = F.array_max(pairs)
    return d.withColumn(
        "lang_pred", F.when(best["h"] > 0, best["lg"]).otherwise(F.lit("und"))
    )


def with_fingerprint(docs: DataFrame, text: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    tokens, folded into 31 bits at each step (ANSI-overflow-safe), via
    JVM-side ``aggregate`` over the split array — the content-addressed
    id the reference's name+count manifests lack (File_Struct.py:401-435)."""
    expr = (
        "aggregate(split(trim(lower(text)), '\\\\s+'), 0L, "
        "(acc, t) -> pmod(acc * 1000003 + pmod(xxhash64(t), 2147483647), 2147483647))"
    )
    return docs.withColumn("fingerprint", F.expr(expr.replace("text", text)))
