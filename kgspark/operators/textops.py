"""Text-analysis operators (training-data pipeline).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and content fingerprinting over a documents table. Every operator is a
pure Column-expression plan (no UDFs) with a term-for-term DuckDB
mirror, so the driver's oracle can verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.operators.dedup import normalize_text_col
from kgspark.operators.fulltext import tokenize_col

# Deterministic mini stopword lists (spec'd, not linguistic truth).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta"],
}


def token_count_col(text: Column) -> Column:
    return F.size(tokenize_col(text))


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, quality_score) — length/punctuation/stopword
    heuristics; score ∈ [0,1], higher = more prose-like."""
    text = F.col(text_col)
    toks = tokenize_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    en_stop = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en_stop)))
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    score = F.round(
        0.4 * length_score + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, hits) — argmax stopword-hit count over the
    per-language lists; ties broken by language code ASC ('und' if 0)."""
    toks = tokenize_col(F.col(text_col))
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(words))).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = docs.select(F.col(id_col).alias("doc_id"), *hit_cols)
    langs = sorted(LANG_STOPWORDS)
    max_hits = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.when(max_hits == 0, F.lit("und"))
    for lg in langs:  # CASE evaluates in order → first (ASC) max wins
        pred = pred.when(F.col(f"hits_{lg}") == max_hits, F.lit(lg))
    return scored.select("doc_id", pred.alias("pred_lang"), max_hits.alias("hits"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 of whitespace-normalized lowercase text."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text_col(F.col(text_col)).cast("binary")).alias("fingerprint"),
    )
