"""Text analysis for training-data pipelines: quality scoring, token
counting, language-ID heuristic, document fingerprinting.

Not in the reference (its signal is pitch, not text); these are the
first-class training-data operators the engine adds. Everything is built-in
Column expressions — JVM codegen'd, fully expressible in ANSI SQL (hence
oracle-checkable), and scale-free (pure map-side, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lsh_spark.functions.text import tokens_col

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
)

# tiny deterministic marker lists for the language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish placeholder
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored count: word/digit runs plus each punctuation char as its
    own token — an upper-bound proxy for subword tokenizers. Pattern is
    lookaround-free so RE2 (DuckDB) and Java regex agree."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]")).cast("long")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    tl = F.length(text)
    return F.when(tl > 0, (tl - F.length(stripped)) / tl).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n > 0, stops / n).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = tokens_col(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] heuristic: length band + sane mean token length
    + moderate punctuation. The exact formula is the contract (tested and
    oracle-mirrored), not a claim about linguistic quality."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(0.4)).otherwise(
        F.when(n > 0, F.lit(0.1)).otherwise(F.lit(0.0)))
    mtl = mean_token_len(text)
    tok_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    pr = punct_ratio(text)
    punct_ok = F.when(pr <= 0.2, F.lit(0.3)).otherwise(F.lit(0.1))
    return (len_ok + tok_ok + punct_ok).cast("double")


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        out[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker-hit ratios, 'und' when all zero; ties broken by
    language code order (deterministic)."""
    scores = lang_scores(text)
    pairs = F.array(*[
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """128-bit content fingerprint of normalized text."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "))


def doc_quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
        F.round(quality_score(t), 6).alias("quality_score"),
        doc_fingerprint(t).alias("fingerprint"),
    )
