"""TF-IDF weighting over token streams.

Reference analog: G2-G5 (SURVEY.md §2.8) — per-doc TF via np.unique counts
(``scripts/song_tfidf_calculation.py:82-101``), IDF = log2(N/df) over
per-doc-distinct terms (``:104-130``), TF·IDF per (doc, token) (``:133-186``),
and the query-side max-TFIDF estimate (``scripts/query_tfidf_calculation.py:
82-132``). The reference stages TF→IDF→TFIDF through pickle files for >25k
docs (``scripts/tfidf_exec.py:108-114``); Catalyst pipelines the same three
joins in one plan with partial aggregation, so no staging is needed.

The dedup use (SURVEY.md §7.2 slice 5): drop ultra-common shingles
(boilerplate) before signatures — ``filter_common_shingles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_spark.functions.text import tokens_col


def doc_tokens(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))


def tf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) — term frequency = count/len(doc).
    Reference ``song_tfidf_calculation.py:98``."""
    toks = doc_tokens(docs)
    counts = toks.groupBy("doc_id", "token").agg(F.count("*").alias("n"))
    lens = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    return counts.join(lens, "doc_id").select(
        "doc_id", "token", (F.col("n") / F.col("len")).alias("tf"))


def idf(docs: DataFrame) -> DataFrame:
    """(token, idf) — log2(N / df), df over distinct docs containing the
    token. Reference ``song_tfidf_calculation.py:125-127``."""
    toks = doc_tokens(docs)
    n_docs = docs.select(F.countDistinct("doc_id").alias("nd"))
    df_tok = toks.distinct().groupBy("token").agg(F.count("*").alias("df"))
    return df_tok.crossJoin(F.broadcast(n_docs)).select(
        "token", F.log2(F.col("nd") / F.col("df")).alias("idf"))


def tfidf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tfidf). One shuffle per agg; the token→idf join is a
    broadcast when the vocabulary is small, sort-merge otherwise —
    Catalyst's choice, both correct."""
    return (
        tf(docs).join(idf(docs), "token")
        .select("doc_id", "token", (F.col("tf") * F.col("idf")).alias("tfidf"))
    )


def query_max_tfidf(docs: DataFrame) -> DataFrame:
    """(token, max_tfidf) — the reference's query-side TF-IDF estimate:
    max over docs, chosen to minimize the chance of dropping a token
    (reference ``query_tfidf_calculation.py:98``)."""
    return tfidf(docs).groupBy("token").agg(F.max("tfidf").alias("max_tfidf"))


def filter_tokens_by_tfidf(docs: DataFrame, min_tfidf: float) -> DataFrame:
    """P6: keep only (doc, token) occurrences whose tfidf > min_tfidf —
    the reference's TF-IDF pitch filter (``scripts/tfidf_pitch_extraction.py:
    114-181``, threshold at 131). Output: (doc_id, token, tfidf)."""
    return tfidf(docs).filter(F.col("tfidf") > min_tfidf)


def tfidf_filter_stats(docs: DataFrame, min_tfidf: float) -> DataFrame:
    """G12: per-doc remaining-token percentage + global emptied-doc share
    (reference ``tfidf_pitch_extraction.py:162-181``).
    Output: one row (avg_remaining_pct, emptied_docs_pct, n_docs)."""
    orig = doc_tokens(docs).groupBy("doc_id").agg(F.count("*").alias("n_orig"))
    # the tfidf frame is per distinct token; recount occurrences of survivors
    surviving = (doc_tokens(docs)
                 .join(filter_tokens_by_tfidf(docs, min_tfidf)
                       .select("doc_id", "token"), ["doc_id", "token"])
                 .groupBy("doc_id").agg(F.count("*").alias("n_kept")))
    per_doc = (orig.join(surviving, "doc_id", "left")
               .select("doc_id", "n_orig",
                       F.coalesce("n_kept", F.lit(0)).alias("n_kept")))
    return per_doc.agg(
        F.avg(F.col("n_kept") / F.col("n_orig") * 100).alias("avg_remaining_pct"),
        (F.avg(F.when(F.col("n_kept") == 0, 1.0).otherwise(0.0)) * 100)
         .alias("emptied_docs_pct"),
        F.count("*").alias("n_docs"))


def filter_common_shingles(doc_hashes_long: DataFrame, max_df_frac: float,
                           n_docs: int) -> DataFrame:
    """Drop shingles occurring in more than ``max_df_frac`` of docs —
    the dedup-side analog of the reference's min-tfidf pitch filter
    (``scripts/tfidf_pitch_extraction.py:114-181``): boilerplate shingles
    carry no dedup signal and create hot LSH buckets."""
    cap = int(max_df_frac * n_docs)
    common = (
        doc_hashes_long.groupBy("shingle_hash")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle_hash")
    )
    return doc_hashes_long.join(F.broadcast(common), "shingle_hash", "left_anti")
