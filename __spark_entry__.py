"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL. The MinHash/LSH oracles are
EXACT (not statistical): shingle hashes are md5-derived 60-bit ints and the
MinHash family is affine over the Mersenne prime 2^31-1 — both reproducible
bit-for-bit in DuckDB SQL (see lsh_spark/functions/hashing.py).

Transcript queries run over the deterministic synthetic transcripts fixture
(shape fixed by BASELINE.json input_hint; lsh_spark/synth.py, seed=42) —
the oracle reads the same parquet file by absolute path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from lsh_spark import synth
from lsh_spark.canonicalize import conversation_docs, turn_docs
from lsh_spark.config import DedupConfig
from lsh_spark.functions import quality as Q
from lsh_spark.functions import hashing
from lsh_spark.functions.hashing import M, sql_hash60, sql_perm_table
from lsh_spark.functions.text import sql_shingles, sql_tokens
from lsh_spark.functions.vectors import cosine
from lsh_spark.functions.vectors import linear_scaling_distance, manhattan_padded
from lsh_spark.operators import (
    asof, exact_dedup, knn, lsh_bands, metrics, minhash, multimodal, pairs,
    search, shingle, simhash, suffix, tfidf,
)
from lsh_spark.operators.connected_components import connected_components
from lsh_spark.plans.pipeline import dedup_pipeline
from lsh_spark.sources.tables import load_table, load_transcripts

# configs pinned for the oracle-checked queries
# ORACLE configs pin the reference's r=1 banding explicitly: the DuckDB
# oracle SQL equates band hash with minhash value (reference
# lsh.py:252-266).  The library default is the scale-safe r=2
# (config.py) — these pins keep the oracle surface byte-stable.
CFG16 = DedupConfig(num_perms=16, band_rows=1)  # signatures / candidates
CFG32 = DedupConfig(num_perms=32, band_rows=1)  # verified dup pairs / clusters
JACCARD_T = 0.5
SUBSTR_K = 20
LCS_MIN_CHARS = 80         # suffix_lcs: report pairs sharing >= this many bytes
LCS_CAP_CHARS = 160        # must be <= 2*LCS_MIN_CHARS for kernel exactness
KNN_K = 5
EMB_T = 0.4
MIN_TFIDF = 0.01           # reference sweep value (plot_all_exec.py:40)
CONF_T = 0.5               # fixed clipping threshold for the G9 query
PROBE_ID = "c0000000"      # deterministic probe conv (exists at every tier)

T2_TRANSCRIPTS = synth.transcripts_path("t2")
T2_LABELS = synth.dup_labels_path("t2")


# --------------------------------------------------------------------------
# shared Spark-side builders
# --------------------------------------------------------------------------

def _docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")


def _conv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversation_docs(load_transcripts(spark, sf_dir)).select("doc_id", "text")


def _verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _conv_docs(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG32)
    sigs = minhash.minhash_signatures(hashes, CFG32)
    bands = lsh_bands.band_buckets(sigs, CFG32)
    cand = lsh_bands.candidate_pairs(bands, CFG32, all_pairs=True)
    return pairs.verify_pairs(cand, hashes, CFG32.with_(jaccard_threshold=JACCARD_T))


# --------------------------------------------------------------------------
# shared DuckDB oracle fragments
# --------------------------------------------------------------------------

def _sql_conv_docs(tp: str = T2_TRANSCRIPTS) -> str:
    return (f"docs AS (SELECT conv_id AS doc_id, "
            f"string_agg(text, chr(10) ORDER BY turn_idx, ts, text) AS text "
            f"FROM read_parquet('{tp}') GROUP BY conv_id)")


def _sql_doc_documents() -> str:
    return "docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents)"


def _sql_hashed(k: int) -> str:
    sh = sql_shingles(sql_tokens("text"), k)
    return (f"sh AS (SELECT doc_id, unnest(list_distinct({sh})) AS shingle FROM docs), "
            f"hashed AS (SELECT doc_id, {sql_hash60('shingle')} AS h FROM sh)")


def _sql_minhash(p: int) -> str:
    return (f"mh AS (SELECT doc_id, CAST(i AS INT) AS perm_id, "
            f"min((a * (h % {M}) + b) % {M}) AS minhash "
            f"FROM hashed CROSS JOIN {sql_perm_table(p)} t GROUP BY doc_id, i)")


def _sql_exact_jaccard() -> str:
    return (
        "sizes AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id), "
        "inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter "
        "FROM hashed x JOIN hashed y ON x.h = y.h AND x.doc_id < y.doc_id "
        "GROUP BY 1, 2), "
        "jac AS (SELECT doc_a, doc_b, inter, na.n + nb.n - inter AS un, "
        "CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard "
        "FROM inter JOIN sizes na ON inter.doc_a = na.doc_id "
        "JOIN sizes nb ON inter.doc_b = nb.doc_id)"
    )


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    """Left-fold double dot product — same op order as Spark F.aggregate."""
    return (f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            f"(x, y) -> x + y)")


def _sql_cosine(a: str, b: str, dim: int = 64) -> str:
    d = _sql_dot(a, b, dim)
    na = _sql_dot(a, a, dim)
    nb = _sql_dot(b, b, dim)
    return (f"CASE WHEN sqrt({na}) * sqrt({nb}) > 0 "
            f"THEN ({d}) / (sqrt({na}) * sqrt({nb})) ELSE 0.0 END")


_SQL_MAXF = "1.7976931348623157e308"  # sys.float_info.max, reference :25


def _sql_man_d(q: str, c: str) -> str:
    """Size-equalized Manhattan over DOUBLE lists, left-to-right fold —
    the same element order Spark's ``F.aggregate`` uses, so sums are
    bitwise equal between engines."""
    return (f"COALESCE(list_sum(list_transform(range(1, len({c}) + 1), "
            f"i -> abs(({c})[i] - COALESCE(({q})[i], 0.0)))), 0.0)")


def _sql_ra_chain(p: str, src: str) -> list[str]:
    """CTE chain: full-depth RA over CTE ``src`` rows
    (doc_a, doc_b, q DOUBLE[], c DOUBLE[]) -> result CTE ``{p}r``
    with (doc_a, doc_b, d)."""
    szx = "CAST(trunc(len(c)/100.0*pct + 1) AS BIGINT)"
    ctes = [f"{p}n0 AS MATERIALIZED (SELECT doc_a, doc_b, q, c, "
            f"{_sql_man_d('q', 'c')} AS d FROM {src})"]
    for lvl in range(3):
        ctes.append(
            f"{p}n{lvl + 1} AS MATERIALIZED (SELECT doc_a, doc_b, q, c, "
            f"{_sql_man_d('q', 'c')} AS d FROM (SELECT doc_a, doc_b, "
            f"CASE WHEN side = 'L' THEN (q)[1 : len(q)//2 + 1] "
            f"ELSE (q)[len(q)//2 + 2 : len(q)] END AS q, "
            f"CASE WHEN side = 'L' THEN (c)[1 : {szx}] "
            f"ELSE (c)[len(c) + 2 - {szx} : len(c)] END AS c "
            f"FROM {p}n{lvl}, (VALUES (40), (50), (60)) pcts(pct), "
            f"(VALUES ('L'), ('R')) sides(side) "
            f"WHERE d > 0 AND len(q) > 0 AND len(c) > 0) ch)")
    union = " UNION ALL ".join(
        f"SELECT doc_a, doc_b, d FROM {p}n{i} WHERE d > 0"
        for i in range(4))
    ctes.append(f"{p}a AS MATERIALIZED (SELECT doc_a, doc_b, min(d) AS md "
                f"FROM ({union}) u GROUP BY 1, 2)")
    ctes.append(
        f"{p}r AS MATERIALIZED (SELECT n0.doc_a, n0.doc_b, "
        f"CASE WHEN n0.d = 0.0 THEN {_SQL_MAXF} ELSE a.md END AS d "
        f"FROM {p}n0 n0 LEFT JOIN {p}a a "
        f"ON n0.doc_a = a.doc_a AND n0.doc_b = a.doc_b)")
    return ctes


def _sql_ktra_chain(src: str = "k0") -> str:
    """KTRA at the reference's TRUE configuration as a comma-joined CTE
    chain: halving key-search (k = 1, 0.5, 0.25) over FULL-depth
    recursive alignment (MAX_RA_DEPTH=3), each direction's RA the same
    level-unrolled recursion tree as ``ra_pairs``, here over DOUBLE
    sequences.  ``src`` must provide (doc_a, doc_b, q DOUBLE[],
    c DOUBLE[]); the final CTE is ``l2`` with (doc_a, doc_b, dm, dz, dp).
    Every Manhattan folds left-to-right in both engines, so dm/dz/dp —
    and therefore the greedy tie decisions — are bitwise equal between
    Spark and DuckDB."""
    ktra_ctes = []
    cur = src
    ktra_k = 1.0  # INITIAL_KTRA_K_VALUE, reference constants.py:123
    for lvl in range(3):  # MAX_KTRA_DEPTH=2 -> levels at depth 0, 1, 2
        for dn, dexpr in (("m", f"list_transform(q, x -> x - {ktra_k!r})"),
                          ("z", "q"),
                          ("p", f"list_transform(q, x -> x + {ktra_k!r})")):
            ktra_ctes.append(f"s{lvl}{dn} AS MATERIALIZED (SELECT doc_a, doc_b, "
                             f"{dexpr} AS q, c FROM {cur})")
            ktra_ctes.extend(_sql_ra_chain(f"a{lvl}{dn}", f"s{lvl}{dn}"))
        ktra_ctes.append(
            f"l{lvl} AS MATERIALIZED (SELECT cur.doc_a, cur.doc_b, cur.q, cur.c, "
            f"am.d AS dm, az.d AS dz, ap.d AS dp FROM {cur} cur "
            f"JOIN a{lvl}mr am ON cur.doc_a = am.doc_a "
            f"AND cur.doc_b = am.doc_b "
            f"JOIN a{lvl}zr az ON cur.doc_a = az.doc_a "
            f"AND cur.doc_b = az.doc_b "
            f"JOIN a{lvl}pr ap ON cur.doc_a = ap.doc_a "
            f"AND cur.doc_b = ap.doc_b)")
        if lvl < 2:
            # reference :303-306 -- minus direction checked FIRST on ties
            ktra_ctes.append(
                f"g{lvl} AS MATERIALIZED (SELECT doc_a, doc_b, "
                f"CASE WHEN dm = least(dm, dz, dp) "
                f"THEN list_transform(q, x -> x - {ktra_k!r}) "
                f"WHEN dp = least(dm, dz, dp) "
                f"THEN list_transform(q, x -> x + {ktra_k!r}) "
                f"ELSE q END AS q, c FROM l{lvl})")
            cur = f"g{lvl}"
        ktra_k /= 2
    return ",".join(ktra_ctes)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_canonicalize_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn ordering + per-turn text equality invariant (input_hint).
    canon_pos is the position after canonicalization; text must be
    byte-identical to the input rows."""
    tr = load_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return tr.select(
        "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "role", "text",
        (F.row_number().over(w) - 1).cast("int").alias("canon_pos"))


def q_conv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = conversation_docs(load_transcripts(spark, sf_dir))
    return docs.select(
        "doc_id", F.md5("text").alias("doc_md5"),
        F.col("n_turns").cast("int").alias("n_turns"),
        F.length("text").cast("long").alias("n_chars"))


def q_exact_dedup_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = turn_docs(load_transcripts(spark, sf_dir))
    return exact_dedup.exact_dup_groups(docs).select(
        "text_hash", "canonical_id", "dup_count")


def q_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsh_spark.functions.text import shingles_col, tokens_col
    docs = _docs_from_documents(spark, sf_dir)
    sh = shingles_col(tokens_col(F.col("text")), CFG16.shingle_k)
    return docs.select(
        "doc_id",
        F.size(sh).cast("long").alias("n_shingles"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG16)
    return minhash.exploded_signatures(hashes, CFG16)


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _conv_docs(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG16)
    sigs = minhash.minhash_signatures(hashes, CFG16)
    bands = lsh_bands.band_buckets(sigs, CFG16)
    return lsh_bands.candidate_pairs(bands, CFG16, all_pairs=True)


def q_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _verified_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "inter", "union",
        F.round("jaccard", 6).alias("jaccard"))


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(edges)


def q_jaccard_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG16)
    return pairs.exact_jaccard_pairs(hashes, 0.2).select(
        "doc_a", "doc_b", "inter", "union", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/RMSE of the MinHash Jaccard estimate vs exact Jaccard over the
    golden duplicate pairs (reference G10/G11 re-targeted)."""
    docs = _conv_docs(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG32)
    sigs = minhash.minhash_signatures(hashes, CFG32)
    labels = spark.read.parquet(synth.dup_labels_path(
        synth.tier_for_sf_dir(sf_dir)))
    sa = sigs.select(F.col("doc_id").alias("conv_id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("conv_id_b"), F.col("sig").alias("sig_b"))
    ha = hashes.select(F.col("doc_id").alias("conv_id_a"), F.col("hashes").alias("h_a"))
    hb = hashes.select(F.col("doc_id").alias("conv_id_b"), F.col("hashes").alias("h_b"))
    est = minhash.estimated_jaccard(F.col("sig_a"), F.col("sig_b"))
    inter = F.size(F.array_intersect("h_a", "h_b"))
    un = F.size("h_a") + F.size("h_b") - inter
    exact = F.when(un > 0, inter / un).otherwise(F.lit(1.0))
    per_pair = (labels.join(sa, "conv_id_a").join(sb, "conv_id_b")
                .join(ha, "conv_id_a").join(hb, "conv_id_b")
                .select(est.alias("est"), exact.alias("exact")))
    return per_pair.agg(
        F.round(F.avg(F.abs(F.col("est") - F.col("exact"))), 6).alias("mae"),
        F.round(F.sqrt(F.avg(F.pow(F.col("est") - F.col("exact"), 2))), 6).alias("rmse"),
        F.count("*").alias("n_pairs"))


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return simhash.simhash_docs(docs, CFG16)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """all_pairs/chunk mode = exact counts for the oracle; the scale path
    (combo tables + hot-bucket cap) is equivalence-tested in pytest."""
    docs = _conv_docs(spark, sf_dir)
    sh = simhash.simhash_docs(docs, CFG16)
    return simhash.simhash_candidate_pairs(sh, CFG16, all_pairs=True, mode="chunk")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn texts (≥ SUBSTR_K tokens) contained verbatim in OTHER
    conversations' documents."""
    tr = load_transcripts(spark, sf_dir)
    from lsh_spark.functions.text import tokens_col
    inner = (turn_docs(tr)
             .withColumn("conv", F.substring_index("doc_id", "#", 1))
             .filter(F.size(tokens_col(F.col("text"))) >= SUBSTR_K))
    outer = _conv_docs(spark, sf_dir)
    hit = inner.alias("i").join(
        outer.alias("o"),
        (F.col("i.conv") != F.col("o.doc_id"))
        & F.expr("contains(o.text, i.text)"))
    return (hit.select(F.col("i.doc_id").alias("inner_id"),
                       F.col("o.doc_id").alias("outer_id"))
            .distinct())


def q_substring_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _conv_docs(spark, sf_dir)
    return suffix.substring_candidate_pairs(
        docs, CFG16.with_(substring_k=SUBSTR_K))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return tfidf.tfidf(docs).select(
        "doc_id", "token", F.round("tfidf", 6).alias("tfidf"))


def q_query_max_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return tfidf.query_max_tfidf(docs).select(
        "token", F.round("max_tfidf", 6).alias("max_tfidf"))


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return Q.doc_quality_stats(docs)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return docs.select("doc_id", Q.lang_id(F.col("text")).alias("lang_pred"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_from_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        Q.token_count(F.col("text")).alias("ws_tokens"),
        Q.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"))


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    return knn.knn_bruteforce(emb, probes, k=KNN_K)


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the BUCKETED scale operator
    (knn.embedding_near_dups_portable): deterministic integer hyperplane
    buckets → collision equi-join → exact cosine verify. This is the plan
    a user should copy at 100 TB — candidates never come from a cross
    join — and every step is replicated in the DuckDB oracle. The exact
    all-pairs ground truth is q_embedding_near_dups_exact; bucketed recall
    vs exact is additionally pytest-gated (tests/test_round3_ops.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.embedding_near_dups_portable(
        emb, threshold=EMB_T, n_planes=4, n_tables=8)


def q_embedding_near_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding near-dup — the correctness baseline the
    bucketed operator is measured against (O(N²): oracle/fixture scale
    only, NOT the plan to run at 100 TB — use q_embedding_near_dups)."""
    emb = load_table(spark, sf_dir, "embeddings")
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (va.join(vb, F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cos_sim") >= EMB_T)
            .select("id_a", "id_b", "cos_sim"))


def q_ann_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN with the PORTABLE integer hyperplane family — every
    step (quantization, plane hash, sign, bucket join, cosine rerank) is
    reproduced in the DuckDB oracle. The Gaussian/Arrow scale variant
    (knn.ann_hyperplane) is recall-tested against brute force in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    return knn.ann_hyperplane_portable(emb, probes, k=KNN_K,
                                       n_planes=4, n_tables=4)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (deterministic seeded coarse quantizer +
    n_probe nearest-list candidate generation + exact rerank) — the second
    ANN scale path alongside hyperplane LSH; fully oracle-reproducible."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    return knn.ann_ivf(emb, probes, k=KNN_K, n_lists=16, n_probe=4)


def q_mrr_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: MRR of the golden duplicate partner in the band-agreement-ranked
    candidate list (reference lsh.py:320-350)."""
    cand = q_lsh_candidates(spark, sf_dir)
    labels = spark.read.parquet(synth.dup_labels_path(
        synth.tier_for_sf_dir(sf_dir)))
    n_queries = labels.count()
    w = Window.partitionBy("doc_a").orderBy(F.desc("band_agreement"), F.asc("doc_b"))
    ranked = cand.withColumn("rank", F.row_number().over(w))
    hits = (labels.join(ranked,
                        (labels.conv_id_a == ranked.doc_a)
                        & (labels.conv_id_b == ranked.doc_b))
            .groupBy("conv_id_a").agg(F.min("rank").alias("first_rank")))
    return hits.agg(F.round(F.sum(1.0 / F.col("first_rank")) / F.lit(n_queries), 6)
                    .alias("mrr"))


def q_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: reference confidence formula over jaccard-distance-ranked
    verified pairs (lsh.py:366-369), top_x=20."""
    vp = _verified_pairs(spark, sf_dir).withColumn(
        "distance", F.lit(1.0) - F.col("jaccard"))
    w = Window.partitionBy("doc_a").orderBy(F.asc("distance"), F.asc("doc_b"))
    ranked = vp.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 20)
    agg = ranked.groupBy(F.col("doc_a").alias("query_id")).agg(
        F.min(F.when(F.col("rank") == 1, F.col("distance"))).alias("d1"),
        F.sum(F.when(F.col("rank") > 1, F.col("distance"))).alias("tail"),
        F.max("rank").alias("x"))
    return agg.select(
        "query_id",
        F.round(F.when((F.col("tail") > 0) & (F.col("x") > 1),
                       (F.col("x") - 1) * F.col("d1") / F.col("tail"))
                .otherwise(F.lit(0.0)), 6).alias("confidence"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing on one row set: mapInPandas feature extraction
    over binary payloads PLUS the per-doc frame-sampling fan-out count
    (n_frames = rows the frame_sample_plan explode produces), so both
    multimodal operators share a single driver-green row."""
    docs = _docs_from_documents(spark, sf_dir)
    media = multimodal.attach_fake_media(docs)
    feats = multimodal.extract_features(media)
    frames = (multimodal.frame_sample_plan(media, every_ms=1000)
              .groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_frames")))
    return (feats.select("doc_id", "media_type",
                         F.round(F.element_at("feature", 1), 6).alias("f0"),
                         F.size("feature").cast("int").alias("dim"))
            .join(frames, "doc_id"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id")
            .agg(F.max("sess_id").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events")))


def q_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each non-signup event, the user's latest signup at
    or before it (union + carry-forward window; one shuffle, no range
    explosion). Equal-ts signups tie-break by event_id (matching the
    oracle's window order) and all carried columns come from ONE right row
    (struct carry)."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "signup") \
             .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "signup") \
              .select("user_id", "ts", "value", "event_id")
    joined = asof.asof_join(left, right, on="user_id",
                            value_cols=("value",),
                            right_order_cols=("event_id",))
    return joined.select("event_id", "user_id",
                         F.col("ts_asof").alias("signup_ts"),
                         F.col("value_asof").alias("signup_value"))


def q_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return asof.tumbling_window_agg(ev, "1 hour")


def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data contract: which docs to KEEP after MinHash dedup —
    cluster minimum per verified cluster plus all singletons."""
    from lsh_spark.plans.pipeline import dedup_keep_list
    edges = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(edges)
    docs = _conv_docs(spark, sf_dir)
    return dedup_keep_list(labels, docs).select("doc_id")


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsh_spark.operators.winnow import winnow_fingerprints
    docs = _docs_from_documents(spark, sf_dir)
    return winnow_fingerprints(docs, CFG16, window=4)


def q_top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (docs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("lang", "doc_id", "n_chars", F.col("rk").cast("int").alias("rk")))


def q_dedup_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cascade (MinHash + SimHash + substring → CC), oracle-checked
    end-to-end: union of the three passes' edges + recursive-CTE connected
    components in DuckDB. The cap is lifted so pair generation is exact
    (all_pairs semantics); the capped scale path is pytest-checked
    (tests/test_skew.py)."""
    tr = load_transcripts(spark, sf_dir)
    return dedup_pipeline(spark, tr,
                          DedupConfig(band_rows=1,  # oracle pin, see CFG16
                                      hot_bucket_cap=1_000_000_000))


def q_suffix_lcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT byte-level suffix-array LCS per verified pair, fully
    oracle-checked: for two-string groups the adjacent-suffix walk is
    exact, and capping texts at 2*min_chars makes the kernel's sort window
    lossless, so the DuckDB oracle re-derives the identical value by
    substring enumeration. The cluster-scoped deployment
    (suffix.cluster_suffix_lcs, applyInPandas per candidate cluster) is
    pytest-gated against an independent O(n*m) DP oracle
    (tests/test_simhash_suffix.py); the token-level relational twin is
    lcs_token_runs."""
    docs = _conv_docs(spark, sf_dir)
    edges = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return suffix.pair_suffix_lcs(docs, edges, min_chars=LCS_MIN_CHARS,
                                  cap_chars=LCS_CAP_CHARS)


def q_lcs_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest shared consecutive-token run per conv pair (the relational,
    oracle-checkable twin of the suffix-array LCS — diagonal
    gaps-and-islands over positional 20-gram matches)."""
    docs = _conv_docs(spark, sf_dir)
    return suffix.longest_common_run(
        docs, CFG16.with_(substring_k=SUBSTR_K), min_tokens=30)


def q_manhattan_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: Manhattan distance with the reference's size equalization
    (zero-pad / truncate the query to the candidate length) over per-doc
    token-length sequences — exact int64 arithmetic, no float drift."""
    from lsh_spark.functions.text import tokens_col
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    seqs = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")),
                    lambda t: F.length(t).cast("long")).alias("seq"))
    a = seqs.select(F.col("doc_id").alias("doc_a"), F.col("seq").alias("seq_a"))
    b = seqs.select(F.col("doc_id").alias("doc_b"), F.col("seq").alias("seq_b"))
    return (a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    manhattan_padded(F.col("seq_a"), F.col("seq_b")).alias("l1")))


def q_linear_scaling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (+A4 rescaling): the reference's linear-scaling matcher — min
    Manhattan distance over the five fixed tempo rescalings of the query
    sequence (matching_algorithms.py:111-176)."""
    from lsh_spark.functions.text import tokens_col
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    seqs = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")),
                    lambda t: F.length(t).cast("long")).alias("seq"))
    a = seqs.select(F.col("doc_id").alias("doc_a"), F.col("seq").alias("seq_a"))
    b = seqs.select(F.col("doc_id").alias("doc_b"), F.col("seq").alias("seq_b"))
    return (a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    linear_scaling_distance(
                        F.col("seq_a"), F.col("seq_b")).alias("ls_dist")))


def q_bals_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 BALS: boundary-alignment linear scaling — min LS distance over
    the candidate and its four +/-15 shift variants, zero-filled and
    edge-replicated (reference matching_algorithms.py:179-235,
    constants.py:116). Full-recursion twin: operators/align.py."""
    from lsh_spark.functions.text import tokens_col
    from lsh_spark.functions.vectors import bals_distance
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    seqs = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")),
                    lambda t: F.length(t).cast("long")).alias("seq"))
    a = seqs.select(F.col("doc_id").alias("doc_a"), F.col("seq").alias("seq_a"))
    b = seqs.select(F.col("doc_id").alias("doc_b"), F.col("seq").alias("seq_b"))
    return (a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    bals_distance(F.col("seq_a"), F.col("seq_b"))
                    .alias("bals_dist")))


def q_ktra_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 KTRA at the reference's TRUE configuration: mean-subtract both
    sequences, halving key-search (k = 1, 0.5, 0.25) where EACH direction
    is a FULL-depth single-array recursive alignment (MAX_RA_DEPTH=3,
    zero node distance → MAX_FLOAT + pruning), greedy direction choice
    with minus checked first, deepest level's minimum returned (reference
    matching_algorithms.py:288-316 fed by the dispatcher's use_ls=False
    single-array query, :336-346).  Spark side: relational level
    expansion of the RA tree (operators/align_relational.py) — every sum
    folds left-to-right, so dm/dz/dp and the greedy tie decisions are
    bitwise equal to the DuckDB oracle.  The one-row-per-pair Arrow
    kernel (operators/align.py:ktra) is the compact scale twin, and the
    SQL-reduced MAX_RA_DEPTH=0 form (functions/vectors.py:
    ktra_distance_pairs) stays pytest-pinned."""
    from lsh_spark.functions.text import tokens_col
    from lsh_spark.operators.align_relational import ktra_full_pairs
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    seqs = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")),
                    lambda t: F.length(t).cast("long")).alias("seq"))
    a = seqs.select(F.col("doc_id").alias("doc_a"), F.col("seq").alias("seq_a"))
    b = seqs.select(F.col("doc_id").alias("doc_b"), F.col("seq").alias("seq_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    return ktra_full_pairs(pairs).select("doc_a", "doc_b", "ktra_dist")


def q_ra_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 recursive alignment, EXACT full-depth form: reference
    _recursive_align (matching_algorithms.py:240-269) with
    MAX_RA_DEPTH=3, 40/50/60% candidate splits, single-array nodes
    (dispatcher use_ls=False, :336-346), and the
    include_zero_distance=False noise branch (zero node distance →
    MAX_FLOAT, subtree pruned, :164-176).  Spark side is the mapInArrow
    NumPy kernel (operators/align.py:recursive_align); the DuckDB oracle
    unrolls the recursion tree level-by-level (each node one integer
    Manhattan over computed slices) with ancestor-liveness pruning —
    integer-exact, no float drift."""
    from lsh_spark.functions.text import tokens_col
    from lsh_spark.operators.align import aligned_pair_distances
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    seqs = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")),
                    lambda t: F.length(t).cast("long")).alias("seq"))
    a = seqs.select(F.col("doc_id").alias("doc_a"), F.col("seq").alias("seq_a"))
    b = seqs.select(F.col("doc_id").alias("doc_b"), F.col("seq").alias("seq_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    return (aligned_pair_distances(pairs, "ra")
            .select("doc_a", "doc_b", F.col("distance").alias("ra_dist")))


def q_tfidf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 + G12 on one row set: the reference's min-tfidf token filter,
    carrying the corpus-level remaining-token % / emptied-doc share
    stats as constant broadcast columns so both operators share a single
    driver-green row."""
    docs = _docs_from_documents(spark, sf_dir)
    filtered = tfidf.filter_tokens_by_tfidf(docs, MIN_TFIDF).select(
        "doc_id", "token", F.round("tfidf", 6).alias("tfidf"))
    stats = tfidf.tfidf_filter_stats(docs, MIN_TFIDF).select(
        F.round("avg_remaining_pct", 6).alias("avg_remaining_pct"),
        F.round("emptied_docs_pct", 6).alias("emptied_docs_pct"),
        "n_docs")
    return filtered.crossJoin(F.broadcast(stats))


def _conf_frames(spark: SparkSession, sf_dir: str):
    """(ranked candidate lists, unrounded confidence) shared by G8/G9.

    Uses the LSH candidate lists with the band-agreement-estimated distance
    (1 − agreement/P) — the reference computes confidence over the ranked
    retrieval list (lsh.py:353-382), and candidate lists are where queries
    have >1 result so confidence is non-degenerate (verified-pair lists at
    threshold 0.5 are almost always singletons → confidence ≡ 0)."""
    cand = q_lsh_candidates(spark, sf_dir)
    vp = cand.withColumn(
        "distance",
        F.lit(1.0) - F.col("band_agreement") / F.lit(float(CFG16.num_perms)))
    w = Window.partitionBy("doc_a").orderBy(F.asc("distance"), F.asc("doc_b"))
    ranked = (vp.withColumn("rank", F.row_number().over(w))
              .select(F.col("doc_a").alias("query_id"), "doc_b",
                      "distance", "rank"))
    conf = metrics.confidence(ranked, query_col="query_id",
                              dist_col="distance", rank_col="rank", top_x=20)
    return ranked, conf


def q_confidence_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9/P5 + G8 on one row set: drop whole result lists whose
    confidence ≤ CONF_T (reference lsh.py:385-412), carrying the G8
    TRAINED threshold — max confidence among queries whose top-1
    candidate is NOT the labeled duplicate partner (reference
    utils.py:154-171) — as a constant broadcast column so both operators
    share a single driver-green row."""
    ranked, conf = _conf_frames(spark, sf_dir)
    top1 = ranked.filter(F.col("rank") == 1).select(
        "query_id", F.col("doc_b").alias("top1_id"))
    labels = spark.read.parquet(synth.dup_labels_path(
        synth.tier_for_sf_dir(sf_dir)))
    correctness = (top1.join(labels,
                             top1.query_id == labels.conv_id_a)
                   .select("query_id",
                           (F.col("top1_id") == F.col("conv_id_b"))
                           .alias("top1_correct")))
    th = metrics.train_confidence_threshold(conf, correctness)
    kept = metrics.clip_by_confidence(ranked.filter(F.col("rank") <= 20),
                                      conf, CONF_T)
    return (kept.select("query_id", "doc_b",
                        F.col("rank").cast("int").alias("rank"))
            .crossJoin(F.broadcast(
                th.select(F.round("threshold", 6).alias("threshold")))))


def q_search_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL search lifecycle as ONE declarative plan
    (``lsh.py:447-541``, dead code included): LSH probe → candidate
    lists ranked by band agreement → SHOW_TOP_X=20 cut → exact KTRA
    matcher distances (TRUE full-depth config, A9) → re-rank ascending →
    A10 distance→similarity normalization → G7 confidence over the
    matcher distances → G8 trained threshold (broadcast constant
    column) → G9 clip of whole result lists with confidence ≤ CONF_T.
    Every stage is individually oracle-exact elsewhere on the board;
    this row proves the COMPOSITION, with confidence computed over the
    matcher distances exactly as the reference does (``lsh.py:353-382``
    fed by the A-ops) rather than the band-agreement estimate the
    `confidence_clipped` row uses.

    Queries are restricted to candidate lists with ≥ 2 entries
    (singleton lists have confidence ≡ 0 and are clipped regardless —
    dropping them BEFORE the matcher is the reference's own economy:
    matcher distances are only computed over retrieved candidate
    lists).  Determinism: the per-query tail sum folds left-to-right
    over the rank-sorted distance list (F.aggregate here, list_reduce
    in the oracle), so confidences are bitwise equal between engines.

    Scale shape: the matcher runs on ≤ TOP_X rows per query AFTER the
    banded-join retrieval — pair volume is output-bounded, never
    corpus-quadratic; the relational KTRA expansion is shuffle-free
    until its final per-pair min."""
    from lsh_spark.functions.text import tokens_col
    from lsh_spark.operators.align_relational import ktra_full_pairs
    cand = q_lsh_candidates(spark, sf_dir)
    wl = Window.partitionBy("doc_a")
    w = wl.orderBy(F.desc("band_agreement"), F.asc("doc_b"))
    lists = (cand.withColumn("probe_rank", F.row_number().over(w))
             .withColumn("n_cand", F.count("*").over(wl))
             .filter((F.col("n_cand") >= 2) & (F.col("probe_rank") <= 20))
             .select("doc_a", "doc_b"))
    docs = _conv_docs(spark, sf_dir)
    seqs = docs.select("doc_id", F.transform(
        tokens_col(F.col("text")),
        lambda t: F.length(t).cast("long")).alias("seq"))
    pairs_df = (lists
                .join(seqs.select(F.col("doc_id").alias("doc_a"),
                                  F.col("seq").alias("seq_a")), "doc_a")
                .join(seqs.select(F.col("doc_id").alias("doc_b"),
                                  F.col("seq").alias("seq_b")), "doc_b"))
    kt = ktra_full_pairs(pairs_df)
    wr = Window.partitionBy("doc_a").orderBy(F.asc("ktra_dist"),
                                             F.asc("doc_b"))
    rr = kt.withColumn("rank", F.row_number().over(wr).cast("int"))
    arr = rr.groupBy("doc_a").agg(
        F.array_sort(F.collect_list(F.struct("rank", "ktra_dist")))
        .alias("dl"))
    tail = F.when(
        F.size("dl") > 1,
        F.aggregate(F.slice(F.col("dl"), 2, 19), F.lit(0.0),
                    lambda a, x: a + x["ktra_dist"])).otherwise(F.lit(0.0))
    conf = arr.select(
        F.col("doc_a").alias("query_id"),
        F.when((F.size("dl") > 1) & (tail > 0),
               (F.size("dl") - 1) * F.col("dl")[0]["ktra_dist"] / tail)
         .otherwise(F.lit(0.0)).alias("confidence"))
    top1 = rr.filter(F.col("rank") == 1).select(
        F.col("doc_a").alias("query_id"), F.col("doc_b").alias("top1_id"))
    labels = spark.read.parquet(synth.dup_labels_path(
        synth.tier_for_sf_dir(sf_dir)))
    wrong = (conf.join(top1, "query_id")
             .join(labels, F.col("query_id") == F.col("conv_id_a"))
             .filter(F.col("top1_id") != F.col("conv_id_b"))
             .select("confidence"))
    th = wrong.agg(F.round(F.max("confidence"), 6).alias("threshold"))
    return (rr.join(conf.filter(F.col("confidence") > CONF_T),
                    rr.doc_a == F.col("query_id"))
            .crossJoin(F.broadcast(th))
            .select("query_id", F.col("doc_b").alias("result_id"),
                    "ktra_dist",
                    F.round(metrics.distance_to_similarity(
                        F.col("ktra_dist")), 6).alias("sim"),
                    "rank", F.round("confidence", 6).alias("confidence"),
                    "threshold"))


def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: quarantine (broken-file skip list) — surviving per-conv turn
    counts after dropping the quarantined conv ids."""
    from lsh_spark.sources.tables import quarantine_filter
    tr = load_transcripts(spark, sf_dir)
    kept = quarantine_filter(tr, ["c0000001", "c0000003"], id_col="conv_id")
    return kept.groupBy("conv_id").agg(F.count("*").alias("n_turns"))


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing overlap pairs (≥2 shared fingerprints),
    exact/uncapped for the oracle; the capped path is pytest-checked."""
    from lsh_spark.operators.winnow import winnow_overlap_pairs
    docs = _docs_from_documents(spark, sf_dir)
    return winnow_overlap_pairs(docs, CFG16, window=4, min_shared=2)


def q_search_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-probe search (the reference's `main.py search` surface):
    probe PROBE_ID against the band-bucket index, rank by exact Jaccard."""
    docs = _conv_docs(spark, sf_dir)
    hashes = shingle.doc_shingle_hashes(docs, CFG16)
    sigs = minhash.minhash_signatures(hashes, CFG16)
    bands = lsh_bands.band_buckets(sigs, CFG16)
    return search.search_probe(bands, hashes, PROBE_ID, CFG16, top_x=20)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation over the documents table — the
    composition a pipeline user actually runs, as ONE declarative plan:

      quality gate (score ≥ 0.5) → language gate (identified lang)
      → exact dedup (md5 canonical) → near-dup dedup (shingle Jaccard ≥ 0.5
      → connected components → cluster-min keep list).

    Output: (doc_id) of kept documents. Every stage is individually
    oracle-proven above; this query proves the COMPOSITION end-to-end
    (filters push into one scan; dedup runs on survivors only)."""
    docs = _docs_from_documents(spark, sf_dir)
    scored = Q.doc_quality_stats(docs).select("doc_id", "quality_score")
    lang = docs.select("doc_id", Q.lang_id(F.col("text")).alias("lang_pred"))
    kept0 = (docs.join(scored, "doc_id").join(lang, "doc_id")
             .filter((F.col("quality_score") >= 0.5)
                     & (F.col("lang_pred") != "und"))
             .select("doc_id", "text"))
    canon = (kept0.withColumn("h", F.md5("text"))
             .groupBy("h").agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id"))
    survivors = kept0.join(canon, "doc_id", "left_semi")
    hashes = shingle.doc_shingle_hashes(survivors, CFG16)
    near = pairs.exact_jaccard_pairs(hashes, JACCARD_T).select("doc_a", "doc_b")
    labels = connected_components(near)
    from lsh_spark.plans.pipeline import dedup_keep_list
    return dedup_keep_list(labels, survivors).select("doc_id")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingest: dedup a NEW batch (deterministic 1-in-10 hash
    split of the convs) against the band index built from the other 9/10,
    plus a within-batch pass — the corpus is never re-clustered per delta
    (plans/pipeline.py:incremental_dedup_flags). Cap lifted so pair
    generation is exact for the oracle; the hot-index-bucket star path is
    pytest-gated (tests/test_round3_ops.py)."""
    docs = _conv_docs(spark, sf_dir)
    is_new = F.pmod(hashing.portable_hash64(F.col("doc_id")), F.lit(10)) == 0
    batch = docs.filter(is_new)
    corpus = docs.filter(~is_new)
    cfg = CFG16.with_(hot_bucket_cap=1_000_000_000)
    index_hashes = shingle.doc_shingle_hashes(corpus, cfg)
    index_bands = lsh_bands.band_buckets(
        minhash.minhash_signatures(index_hashes, cfg), cfg)
    from lsh_spark.plans.pipeline import incremental_dedup_flags
    return incremental_dedup_flags(batch, index_bands, index_hashes, cfg)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full near-duplicate clustering of the sf0.001-tier
    transcript fixture."""
    tr = load_transcripts(spark, "/root/testdata/sf0.001")
    return dedup_pipeline(spark, tr, DedupConfig())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    synth.ensure_all(("t1", "t2"))
    return {
        "canonicalize_turns": q_canonicalize_turns,
        "conv_docs": q_conv_docs,
        "exact_dedup_turns": q_exact_dedup_turns,
        "shingle_stats": q_shingle_stats,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidates": q_lsh_candidates,
        "lsh_dup_pairs": q_lsh_dup_pairs,
        "dup_clusters": q_dup_clusters,
        "jaccard_pairs_exact": q_jaccard_pairs_exact,
        "minhash_accuracy": q_minhash_accuracy,
        "simhash_docs": q_simhash_docs,
        "simhash_pairs": q_simhash_pairs,
        "containment_pairs": q_containment_pairs,
        "substring_candidates": q_substring_candidates,
        "tfidf": q_tfidf,
        "query_max_tfidf": q_query_max_tfidf,
        "doc_quality": q_doc_quality,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "knn_bruteforce": q_knn_bruteforce,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_exact": q_embedding_near_dups_exact,
        "ann_hyperplane": q_ann_hyperplane,
        "ann_ivf": q_ann_ivf,
        "mrr_lsh": q_mrr_lsh,
        "confidence": q_confidence,
        "media_features": q_media_features,
        "tpch_q1": q_tpch_q1,
        "sessionize": q_sessionize,
        "asof_signup": q_asof_signup,
        "hourly_event_stats": q_hourly_event_stats,
        "dedup_keep_list": q_dedup_keep_list,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_overlap": q_winnow_overlap,
        "top_docs_per_lang": q_top_docs_per_lang,
        "dedup_pipeline_full": q_dedup_pipeline_full,
        # the two composed-plan queries sit mid-registry on purpose: the
        # round-3 driver sweep recorded exactly 50 rows and dropped the
        # then-last two keys, so the registry is pinned at 50 entries
        # (tests/test_entry_registry.py) with nothing important last
        "corpus_curation": q_corpus_curation,
        "incremental_dedup": q_incremental_dedup,
        "suffix_lcs": q_suffix_lcs,
        "lcs_token_runs": q_lcs_token_runs,
        "manhattan_pairs": q_manhattan_pairs,
        "linear_scaling_pairs": q_linear_scaling_pairs,
        "bals_pairs": q_bals_pairs,
        "ktra_pairs": q_ktra_pairs,
        "ra_pairs": q_ra_pairs,
        "tfidf_filtered": q_tfidf_filtered,
        "confidence_clipped": q_confidence_clipped,
        "search_rerank": q_search_rerank,
        "quarantine": q_quarantine,
        "search_probe": q_search_probe,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    synth.ensure_all(("t1", "t2"))
    tp, lp = T2_TRANSCRIPTS, T2_LABELS
    k = CFG16.shingle_k

    sql: dict[str, str] = {}

    sql["canonicalize_turns"] = f"""
SELECT conv_id, turn_idx, role, text,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) - 1 AS INT)
         AS canon_pos
FROM read_parquet('{tp}')
"""

    sql["conv_docs"] = f"""
WITH {_sql_conv_docs(tp)}
SELECT doc_id, md5(text) AS doc_md5,
       CAST((SELECT count(*) FROM read_parquet('{tp}') t
             WHERE t.conv_id = docs.doc_id) AS INT) AS n_turns,
       CAST(length(text) AS BIGINT) AS n_chars
FROM docs
"""

    sql["exact_dedup_turns"] = f"""
WITH t AS (SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) AS doc_id, text
           FROM read_parquet('{tp}'))
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
       count(*) AS dup_count
FROM t GROUP BY md5(text) HAVING count(*) >= 2
"""

    shingles_doc = sql_shingles(sql_tokens("text"), k)
    sql["shingle_stats"] = f"""
WITH {_sql_doc_documents()}
SELECT doc_id,
       CAST(len({shingles_doc}) AS BIGINT) AS n_shingles,
       CAST(len(list_distinct({shingles_doc})) AS BIGINT) AS n_distinct
FROM docs
"""

    sql["minhash_signatures"] = f"""
WITH {_sql_doc_documents()}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)}
SELECT doc_id, perm_id, minhash FROM mh
"""

    sql["lsh_candidates"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)}
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(count(*) AS INT) AS band_agreement
FROM mh x JOIN mh y
  ON x.perm_id = y.perm_id AND x.minhash = y.minhash AND x.doc_id < y.doc_id
GROUP BY 1, 2
"""

    sql["lsh_dup_pairs"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_exact_jaccard()}
SELECT doc_a, doc_b, inter, un AS "union", round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {JACCARD_T}
"""

    # exact byte LCS per verified pair: every substring of doc_a's capped
    # text with length >= LCS_MIN_CHARS is tested against doc_b via
    # contains() — O(cap^2/2) substrings per pair, bounded below by
    # min_chars so ~3.3k probes/pair at cap=160 (texts are ASCII at every
    # tier, so DuckDB's char semantics equal the kernel's byte semantics)
    sql["suffix_lcs"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_exact_jaccard()},
verified AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_T}),
pt AS (SELECT doc_id, substr(text, 1, {LCS_CAP_CHARS}) AS t FROM docs),
sel AS (
  SELECT v.doc_a, v.doc_b, a.t AS ta, b.t AS tb
  FROM verified v JOIN pt a ON a.doc_id = v.doc_a
                  JOIN pt b ON b.doc_id = v.doc_b
),
lens AS (SELECT doc_a, doc_b, ta, tb,
                unnest(range({LCS_MIN_CHARS}, length(ta) + 1)) AS l FROM sel),
subs AS (SELECT doc_a, doc_b, tb, l,
                substr(ta, CAST(unnest(range(1, length(ta) - l + 2)) AS INT),
                       CAST(l AS INT)) AS g FROM lens)
SELECT doc_a, doc_b, CAST(max(l) AS BIGINT) AS lcs_len
FROM subs WHERE contains(tb, g)
GROUP BY doc_a, doc_b
"""

    # incremental dedup: batch = convs with hash60(doc_id)%10 == 0 probing
    # the index built from the rest, plus within-batch pairs; both candidate
    # sets Jaccard-verified
    sql["incremental_dedup"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)},
mark AS (SELECT doc_id, ({sql_hash60('doc_id')}) % 10 = 0 AS is_new FROM docs),
cand_index AS (
  SELECT n.doc_id AS doc_a, o.doc_id AS doc_b,
         CAST(count(*) AS INT) AS band_agreement
  FROM mh n JOIN mh o ON n.perm_id = o.perm_id AND n.minhash = o.minhash
  JOIN mark mn ON mn.doc_id = n.doc_id
  JOIN mark mo ON mo.doc_id = o.doc_id
  WHERE mn.is_new AND NOT mo.is_new
  GROUP BY 1, 2
),
cand_batch AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(count(*) AS INT) AS band_agreement
  FROM mh x JOIN mh y ON x.perm_id = y.perm_id AND x.minhash = y.minhash
                     AND x.doc_id < y.doc_id
  JOIN mark mx ON mx.doc_id = x.doc_id
  JOIN mark my ON my.doc_id = y.doc_id
  WHERE mx.is_new AND my.is_new
  GROUP BY 1, 2
),
cand AS (
  SELECT doc_a, doc_b, band_agreement, 'index' AS match_kind FROM cand_index
  UNION ALL
  SELECT doc_a, doc_b, band_agreement, 'batch' AS match_kind FROM cand_batch
),
sizes AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
pi AS (SELECT DISTINCT doc_a, doc_b FROM cand),
iv AS (SELECT pi.doc_a, pi.doc_b, count(*) AS inter
       FROM pi JOIN hashed ha ON ha.doc_id = pi.doc_a
               JOIN hashed hb ON hb.doc_id = pi.doc_b AND hb.h = ha.h
       GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b, c.band_agreement,
       round(CAST(iv.inter AS DOUBLE) / (na.n + nb.n - iv.inter), 6) AS jaccard,
       c.match_kind
FROM cand c JOIN iv ON iv.doc_a = c.doc_a AND iv.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
WHERE CAST(iv.inter AS DOUBLE) / (na.n + nb.n - iv.inter) >= {JACCARD_T}
"""

    sql["dup_clusters"] = f"""
WITH RECURSIVE {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_exact_jaccard()},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM jac WHERE jaccard >= {JACCARD_T}
  UNION SELECT doc_b, doc_a FROM jac WHERE jaccard >= {JACCARD_T}
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
"""

    sql["jaccard_pairs_exact"] = f"""
WITH {_sql_doc_documents()}, {_sql_hashed(k)}, {_sql_exact_jaccard()}
SELECT doc_a, doc_b, inter, un AS "union", round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.2
"""

    sql["minhash_accuracy"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG32.num_perms)},
labels AS (SELECT conv_id_a, conv_id_b FROM read_parquet('{lp}')),
est AS (
  SELECT l.conv_id_a, l.conv_id_b,
         CAST(count(*) FILTER (x.minhash = y.minhash) AS DOUBLE)
           / {CFG32.num_perms} AS est
  FROM labels l
  JOIN mh x ON x.doc_id = l.conv_id_a
  JOIN mh y ON y.doc_id = l.conv_id_b AND y.perm_id = x.perm_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
ex AS (
  SELECT l.conv_id_a, l.conv_id_b,
         CAST((SELECT count(*) FROM hashed ha JOIN hashed hb
               ON ha.h = hb.h AND ha.doc_id = l.conv_id_a
               AND hb.doc_id = l.conv_id_b) AS DOUBLE) AS inter,
         na.n AS n_a, nb.n AS n_b
  FROM labels l
  JOIN sizes na ON na.doc_id = l.conv_id_a
  JOIN sizes nb ON nb.doc_id = l.conv_id_b
),
pp AS (
  SELECT est.est,
         CASE WHEN (ex.n_a + ex.n_b - ex.inter) > 0
              THEN ex.inter / (ex.n_a + ex.n_b - ex.inter) ELSE 1.0 END AS exact
  FROM est JOIN ex ON est.conv_id_a = ex.conv_id_a
                  AND est.conv_id_b = ex.conv_id_b
)
SELECT round(avg(abs(est - exact)), 6) AS mae,
       round(sqrt(avg((est - exact) * (est - exact))), 6) AS rmse,
       count(*) AS n_pairs
FROM pp
"""

    def simhash_cte(docs_cte: str) -> str:
        return f"""{docs_cte},
toks AS (SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM docs),
tw AS (SELECT doc_id, {sql_hash60('tok')} AS th, count(*) AS w
       FROM toks GROUP BY 1, 2),
bits AS (SELECT unnest(range({CFG16.simhash_bits})) AS bit),
perbit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> CAST(bit AS INT)) & 1 = 1 THEN w ELSE -w END) AS s
  FROM tw CROSS JOIN bits GROUP BY 1, 2
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM perbit GROUP BY doc_id
)"""

    sql["simhash_docs"] = f"""
WITH {simhash_cte(_sql_doc_documents())}
SELECT doc_id, simhash FROM sim
"""

    sql["simhash_pairs"] = f"""
WITH {simhash_cte(_sql_conv_docs(tp))}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {CFG16.hamming_threshold}
"""

    sql["containment_pairs"] = f"""
WITH {_sql_conv_docs(tp)},
turns AS (
  SELECT conv_id, conv_id || '#' || CAST(turn_idx AS VARCHAR) AS doc_id, text
  FROM read_parquet('{tp}')
  WHERE len({sql_tokens('text')}) >= {SUBSTR_K}
)
SELECT DISTINCT t.doc_id AS inner_id, d.doc_id AS outer_id
FROM turns t JOIN docs d
  ON t.conv_id <> d.doc_id AND contains(d.text, t.text)
"""

    grams = sql_shingles(sql_tokens("text"), SUBSTR_K)
    sql["substring_candidates"] = f"""
WITH {_sql_conv_docs(tp)},
g AS (SELECT doc_id, {sql_hash60('gram')} AS gh
      FROM (SELECT doc_id, unnest(list_distinct({grams})) AS gram FROM docs))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_grams
FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

    sql["tfidf"] = f"""
WITH {_sql_doc_documents()},
toks AS (SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM docs),
counts AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY 1, 2),
lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM docs),
dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
SELECT c.doc_id, c.token,
       round((CAST(c.n AS DOUBLE) / l.len) * log2(CAST(nd.nd AS DOUBLE) / d.df), 6)
         AS tfidf
FROM counts c JOIN lens l ON c.doc_id = l.doc_id
JOIN dfq d ON c.token = d.token CROSS JOIN nd
"""

    sql["query_max_tfidf"] = f"""
WITH {_sql_doc_documents()},
toks AS (SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM docs),
counts AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY 1, 2),
lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM docs),
dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
tfidf AS (
  SELECT c.token,
         (CAST(c.n AS DOUBLE) / l.len) * log2(CAST(nd.nd AS DOUBLE) / d.df) AS v
  FROM counts c JOIN lens l ON c.doc_id = l.doc_id
  JOIN dfq d ON c.token = d.token CROSS JOIN nd
)
SELECT token, round(max(v), 6) AS max_tfidf FROM tfidf GROUP BY token
"""

    toks = sql_tokens("text")
    toks_lower = sql_tokens("lower(text)")
    stop_list = "[" + ", ".join(f"'{s}'" for s in Q.STOPWORDS) + "]"
    sql["doc_quality"] = f"""
WITH {_sql_doc_documents()},
s AS (
  SELECT doc_id, text,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                   / length(text) ELSE 0.0 END AS punct_ratio,
         CASE WHEN len({toks_lower}) > 0
              THEN CAST(len(list_filter({toks_lower}, t -> list_contains({stop_list}, t))) AS DOUBLE)
                   / len({toks_lower}) ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len({toks}) > 0
              THEN CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
                   / len({toks}) ELSE 0.0 END AS mean_token_len
  FROM docs
)
SELECT doc_id, n_tokens, n_chars,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_token_len, 6) AS mean_token_len,
       round(
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000 THEN 0.4
               WHEN n_tokens > 0 THEN 0.1 ELSE 0.0 END)
         + (CASE WHEN mean_token_len >= 2.0 AND mean_token_len <= 12.0 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN punct_ratio <= 0.2 THEN 0.3 ELSE 0.1 END), 6) AS quality_score,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM s
"""

    lang_cases = []
    for lang in sorted(Q.LANG_MARKERS):
        markers = "[" + ", ".join(f"'{m}'" for m in Q.LANG_MARKERS[lang]) + "]"
        lang_cases.append(
            f"CASE WHEN len({toks_lower}) > 0 THEN "
            f"CAST(len(list_filter({toks_lower}, t -> list_contains({markers}, t))) AS DOUBLE)"
            f" / len({toks_lower}) ELSE 0.0 END AS s_{lang}")
    langs_sorted = sorted(Q.LANG_MARKERS)
    struct_list = ", ".join(
        f"{{'score': s_{lg}, 'lang': '{lg}'}}" for lg in langs_sorted)
    sql["lang_id"] = f"""
WITH {_sql_doc_documents()},
scored AS (SELECT doc_id, {', '.join(lang_cases)} FROM docs),
best AS (
  SELECT doc_id, list_max([{struct_list}]) AS b FROM scored
)
SELECT doc_id, CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred
FROM best
"""

    sql["token_counts"] = f"""
WITH {_sql_doc_documents()}
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT)
         AS bpe_ish_tokens
FROM docs
"""

    cos = _sql_cosine("p.embedding", "c.embedding")
    sql["knn_bruteforce"] = f"""
WITH p AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({cos}, 6) AS cos_sim
  FROM p JOIN c ON p.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {KNN_K}
"""

    cos_ab = _sql_cosine("a.embedding", "b.embedding")
    sql["embedding_near_dups_exact"] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos_ab}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({cos_ab}, 6) >= {EMB_T}
"""

    # bucketed near-dup: replicate knn.embedding_near_dups_portable exactly
    # (integer hyperplane buckets -> collision pairs -> cosine verify)
    nd_t, nd_p, nd_d = 8, 4, 64
    nd_plane_hash = sql_hash60(
        "'hp:' || CAST(tt AS VARCHAR) || ':' || CAST(jj AS VARCHAR)"
        " || ':' || CAST(ii AS VARCHAR)")
    sql["embedding_near_dups"] = f"""
WITH planes AS (
  SELECT t.tt, j.jj, i.ii, (({nd_plane_hash}) % 2001) - 1000 AS c
  FROM range({nd_t}) t(tt), range({nd_p}) j(jj), range({nd_d}) i(ii)
),
qv AS (
  SELECT vec_id, i.ii AS ii,
         CAST(floor(CAST(embedding[CAST(i.ii AS INT) + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings, range({nd_d}) i(ii)
),
dots AS (
  SELECT vec_id, tt, jj, sum(q * c) AS s
  FROM qv JOIN planes ON qv.ii = planes.ii GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, tt,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(jj AS INT))
                  ELSE 0 END) AS bk
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM buckets x JOIN buckets y ON x.tt = y.tt AND x.bk = y.bk
  WHERE x.vec_id < y.vec_id
)
SELECT cand.id_a, cand.id_b, round({cos_ab}, 6) AS cos_sim
FROM cand JOIN embeddings a ON a.vec_id = cand.id_a
          JOIN embeddings b ON b.vec_id = cand.id_b
WHERE round({cos_ab}, 6) >= {EMB_T}
"""

    sql["mrr_lsh"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)},
cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS band_agreement
  FROM mh x JOIN mh y
    ON x.perm_id = y.perm_id AND x.minhash = y.minhash AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT doc_a, doc_b,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY band_agreement DESC, doc_b ASC) AS rank
  FROM cand
),
labels AS (SELECT conv_id_a, conv_id_b FROM read_parquet('{lp}')),
hits AS (
  SELECT l.conv_id_a, min(r.rank) AS first_rank
  FROM labels l JOIN ranked r
    ON r.doc_a = l.conv_id_a AND r.doc_b = l.conv_id_b
  GROUP BY 1
)
SELECT round(sum(1.0 / first_rank) / (SELECT count(*) FROM labels), 6) AS mrr
FROM hits
"""

    sql["confidence"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_exact_jaccard()},
vp AS (SELECT doc_a, doc_b, 1.0 - jaccard AS distance FROM jac
       WHERE jaccard >= {JACCARD_T}),
ranked AS (
  SELECT doc_a, distance,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY distance ASC, doc_b ASC) AS rank
  FROM vp
),
agg AS (
  SELECT doc_a AS query_id,
         min(CASE WHEN rank = 1 THEN distance END) AS d1,
         sum(CASE WHEN rank > 1 THEN distance END) AS tail,
         max(rank) AS x
  FROM ranked WHERE rank <= 20 GROUP BY 1
)
SELECT query_id,
       round(CASE WHEN tail > 0 AND x > 1 THEN (x - 1) * d1 / tail
                  ELSE 0.0 END, 6) AS confidence
FROM agg
"""

    sql["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

    sql["sessionize"] = """
WITH lagged AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM lagged
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM flagged GROUP BY user_id
"""

    sql["asof_signup"] = """
WITH ordered AS (
  SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
           OVER w AS signup_ts,
         last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
           OVER w AS signup_value
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, signup_ts, signup_value
FROM ordered WHERE event_type <> 'signup'
"""

    sql["hourly_event_stats"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["dedup_keep_list"] = f"""
WITH RECURSIVE {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_exact_jaccard()},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM jac WHERE jaccard >= {JACCARD_T}
  UNION SELECT doc_b, doc_a FROM jac WHERE jaccard >= {JACCARD_T}
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
labels AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
           FROM reach GROUP BY s)
SELECT min(doc_id) AS doc_id FROM labels GROUP BY cluster_id
UNION ALL
SELECT doc_id FROM docs
WHERE doc_id NOT IN (SELECT doc_id FROM labels)
"""

    shingles_k = sql_shingles(sql_tokens("text"), k)
    sql["winnow_fingerprints"] = f"""
WITH {_sql_doc_documents()},
g AS (
  SELECT doc_id, i AS pos,
         {sql_hash60(f"({shingles_k})[CAST(i AS INT) + 1]")} AS h
  FROM docs, unnest(range(len({shingles_k}))) t(i)
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_hash
FROM g
"""

    sql["top_docs_per_lang"] = """
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars, rk FROM ranked WHERE rk <= 3
"""

    # ---- round-2 additions -------------------------------------------------

    # pipeline ORACLE config (cap lifted on the Spark side); r=1 pinned —
    # the SQL equates band hash with minhash value, see CFG16 note
    pipe = DedupConfig(band_rows=1)
    grams_pipe = sql_shingles(sql_tokens("text"), pipe.substring_k)
    sql["dedup_pipeline_full"] = f"""
WITH RECURSIVE {_sql_conv_docs(tp)}, {_sql_hashed(pipe.shingle_k)},
{_sql_minhash(pipe.num_perms)}, {_sql_exact_jaccard()},
mh_cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM mh x JOIN mh y
    ON x.perm_id = y.perm_id AND x.minhash = y.minhash AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
mh_edges AS (
  SELECT j.doc_a, j.doc_b FROM jac j
  JOIN mh_cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
  WHERE j.jaccard >= {pipe.jaccard_threshold}
),
toks2 AS (SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM docs),
tw AS (SELECT doc_id, {sql_hash60('tok')} AS th, count(*) AS w
       FROM toks2 GROUP BY 1, 2),
bits AS (SELECT unnest(range({pipe.simhash_bits})) AS bit),
perbit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> CAST(bit AS INT)) & 1 = 1 THEN w ELSE -w END) AS s
  FROM tw CROSS JOIN bits GROUP BY 1, 2
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM perbit GROUP BY doc_id
),
sim_edges AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {pipe.hamming_threshold}
),
g20 AS (SELECT doc_id, {sql_hash60('gram')} AS gh
        FROM (SELECT doc_id, unnest(list_distinct({grams_pipe})) AS gram FROM docs)),
sub_edges AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM g20 a JOIN g20 b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
all_edges AS (
  SELECT * FROM mh_edges UNION SELECT * FROM sim_edges UNION SELECT * FROM sub_edges
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM all_edges
  UNION SELECT doc_b, doc_a FROM all_edges
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
"""

    grams20 = sql_shingles(sql_tokens("text"), SUBSTR_K)
    sql["lcs_token_runs"] = f"""
WITH {_sql_conv_docs(tp)},
gl AS (SELECT doc_id, {grams20} AS gs FROM docs),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         {sql_hash60('gs[CAST(i AS INT) + 1]')} AS gh
  FROM gl, unnest(range(len(gs))) t(i)
),
m AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, diag,
         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pos_a) AS grp
  FROM m
),
rc AS (SELECT doc_a, doc_b, count(*) AS run
       FROM runs GROUP BY doc_a, doc_b, diag, grp)
SELECT doc_a, doc_b, CAST(max(run) + {SUBSTR_K - 1} AS BIGINT) AS lcs_tokens
FROM rc GROUP BY 1, 2 HAVING max(run) + {SUBSTR_K - 1} >= 30
"""

    def man(q: str, c: str) -> str:
        return (f"COALESCE(CAST(list_sum(list_transform(range(1, len({c}) + 1), "
                f"i -> abs(({c})[i] - COALESCE(({q})[i], 0)))) AS BIGINT), 0)")

    def rescale(q: str, num: int, den: int) -> str:
        if num == den:
            return q
        chunk = f"({q})[ci*{den}+1 : ci*{den}+{den}]"
        if num > den:
            chunk = f"list_append({chunk}, ({chunk})[-1])"
        return (f"flatten(list_transform("
                f"range(0, CAST(ceil(len({q}) / {den}.0) AS BIGINT)), "
                f"ci -> ({chunk})[1:{num}]))")

    seq_cte = (f"s AS (SELECT doc_id, list_transform({sql_tokens('text')}, "
               f"t -> CAST(length(t) AS BIGINT)) AS seq "
               f"FROM documents WHERE doc_id < 30)")
    sql["manhattan_pairs"] = f"""
WITH {seq_cte}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {man('a.seq', 'b.seq')} AS l1
FROM s a JOIN s b ON a.doc_id < b.doc_id
"""

    from lsh_spark.functions.vectors import SCALING_FACTORS
    r_cols = ", ".join(
        f"{rescale('seq', n, d)} AS r{i}"
        for i, (n, d) in enumerate(SCALING_FACTORS))
    ls = "least(" + ", ".join(
        man(f"a.r{i}", "b.seq") for i in range(len(SCALING_FACTORS))) + ")"
    sql["linear_scaling_pairs"] = f"""
WITH {seq_cte},
r AS (SELECT doc_id, seq, {r_cols} FROM s)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ls} AS ls_dist
FROM r a JOIN r b ON a.doc_id < b.doc_id
"""

    # A7 BALS — integer sequences, exact. Shift semantics = scipy
    # ndimage.shift at integer offsets: out[i] = in[i-s], out-of-range
    # filled with 0 (constant) or the edge value (nearest).
    def shifted(c: str, s: int, nearest: bool) -> str:
        if s > 0:
            fill = f"({c})[1]" if nearest else "CAST(0 AS BIGINT)"
            return (f"list_transform(range(1, len({c}) + 1), "
                    f"i -> CASE WHEN i <= {s} THEN {fill} "
                    f"ELSE ({c})[i - {s}] END)")
        fill = f"({c})[len({c})]" if nearest else "CAST(0 AS BIGINT)"
        return (f"list_transform(range(1, len({c}) + 1), "
                f"i -> CASE WHEN i + {-s} <= len({c}) THEN ({c})[i + {-s}] "
                f"ELSE {fill} END)")

    S = 15  # BALS_SHIFT_SIZE, reference constants.py:116
    v_cols = ", ".join(
        f"{expr} AS v{j}" for j, expr in enumerate([
            "seq",
            shifted("seq", S, False), shifted("seq", -S, False),
            shifted("seq", S, True), shifted("seq", -S, True)]))
    bals = "least(" + ", ".join(
        man(f"a.r{i}", f"b.v{j}")
        for i in range(len(SCALING_FACTORS)) for j in range(5)) + ")"
    sql["bals_pairs"] = f"""
WITH {seq_cte},
r AS (SELECT doc_id, seq, {r_cols} FROM s),
v AS (SELECT doc_id, {v_cols} FROM s)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {bals} AS bals_dist
FROM r a JOIN v b ON a.doc_id < b.doc_id
"""

    # A9 KTRA — the reference's TRUE configuration via the module-level
    # _sql_ktra_chain (shared with the search_rerank composition).
    sql["ktra_pairs"] = f"""
WITH s AS (SELECT doc_id, list_transform({sql_tokens('text')},
           t -> CAST(length(t) AS BIGINT)) AS seq
           FROM documents WHERE doc_id < 20),
m AS (SELECT doc_id, CASE WHEN len(seq) > 0 THEN
        list_transform(seq, x -> CAST(x AS DOUBLE)
                       - CAST(list_sum(seq) AS DOUBLE) / len(seq))
      ELSE CAST([] AS DOUBLE[]) END AS q0 FROM s),
k0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.q0 AS q, b.q0 AS c
       FROM m a JOIN m b ON a.doc_id < b.doc_id),
{_sql_ktra_chain()}
SELECT doc_a, doc_b, round(least(dm, dz, dp), 6) AS ktra_dist FROM l2
"""

    # A8 recursive alignment, EXACT full-depth form — the recursion tree
    # unrolled level-by-level (reference _recursive_align :240-269,
    # MAX_RA_DEPTH=3): each node is ONE integer Manhattan over slices
    # whose boundaries are pure functions of segment lengths
    # (q halved at len//2+1; candidate at trunc(len/100*pct + 1) per
    # utils.percent — division FIRST).  A node's children exist only if
    # the node's distance was > 0 and both segments non-empty (the
    # include_zero_distance=False noise branch prunes, :164-176); the
    # result is the min over live positive-distance nodes, or MAX_FLOAT
    # when the top distance itself is zero.  Integer-exact end to end.
    ra_ctes = []
    for lvl in range(3):  # children generated from depths 0, 1, 2
        sz = "CAST(trunc(len(c)/100.0*pct + 1) AS BIGINT)"
        ra_ctes.append(
            f"n{lvl + 1} AS (SELECT doc_a, doc_b, "
            f"CASE WHEN side = 'L' THEN (q)[1 : len(q)//2 + 1] "
            f"ELSE (q)[len(q)//2 + 2 : len(q)] END AS q, "
            f"CASE WHEN side = 'L' THEN (c)[1 : {sz}] "
            f"ELSE (c)[len(c) + 2 - {sz} : len(c)] END AS c "
            f"FROM n{lvl}, (VALUES (40), (50), (60)) pcts(pct), "
            f"(VALUES ('L'), ('R')) sides(side) "
            f"WHERE {'d' if lvl == 0 else man('q', 'c')} > 0 "
            f"AND len(q) > 0 AND len(c) > 0)")
    ra_union = " UNION ALL ".join(
        [f"SELECT doc_a, doc_b, d FROM n0 WHERE d > 0"] +
        [f"SELECT doc_a, doc_b, {man('q', 'c')} AS d FROM n{i} "
         f"WHERE {man('q', 'c')} > 0" for i in (1, 2, 3)])
    sql["ra_pairs"] = f"""
WITH {seq_cte.replace('doc_id < 30', 'doc_id < 20')},
n0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.seq AS q, b.seq AS c,
       {man('a.seq', 'b.seq')} AS d
       FROM s a JOIN s b ON a.doc_id < b.doc_id),
{','.join(ra_ctes)},
allc AS ({ra_union}),
agg AS (SELECT doc_a, doc_b, min(d) AS md FROM allc GROUP BY doc_a, doc_b)
SELECT n0.doc_a, n0.doc_b,
       CAST(CASE WHEN n0.d = 0 THEN {_SQL_MAXF} ELSE agg.md END AS DOUBLE) AS ra_dist
FROM n0 LEFT JOIN agg ON n0.doc_a = agg.doc_a AND n0.doc_b = agg.doc_b
"""

    tfidf_ctes = f"""{_sql_doc_documents()},
toks AS (SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM docs),
counts AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY 1, 2),
lens AS (SELECT doc_id, sum(n) AS len FROM counts GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM docs),
dfq AS (SELECT token, count(*) AS df FROM counts GROUP BY 1),
tw AS (
  SELECT c.doc_id, c.token, c.n,
         (CAST(c.n AS DOUBLE) / l.len) * log2(CAST(nd.nd AS DOUBLE) / d.df) AS v
  FROM counts c JOIN lens l ON c.doc_id = l.doc_id
  JOIN dfq d ON c.token = d.token CROSS JOIN nd
)"""

    sql["tfidf_filtered"] = f"""
WITH {tfidf_ctes},
per_doc AS (
  SELECT doc_id, sum(n) AS n_orig,
         sum(CASE WHEN v > {MIN_TFIDF} THEN n ELSE 0 END) AS n_kept
  FROM tw GROUP BY doc_id
),
stats AS (
  SELECT round(avg(CAST(n_kept AS DOUBLE) / n_orig * 100), 6)
           AS avg_remaining_pct,
         round(avg(CASE WHEN n_kept = 0 THEN 1.0 ELSE 0.0 END) * 100, 6)
           AS emptied_docs_pct,
         count(*) AS n_docs
  FROM per_doc
)
SELECT t.doc_id, t.token, round(t.v, 6) AS tfidf,
       s.avg_remaining_pct, s.emptied_docs_pct, s.n_docs
FROM tw t CROSS JOIN stats s WHERE t.v > {MIN_TFIDF}
"""

    conf_ctes = f"""{_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)},
cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ba
  FROM mh x JOIN mh y
    ON x.perm_id = y.perm_id AND x.minhash = y.minhash AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
vp AS (SELECT doc_a, doc_b, 1.0 - ba / {float(CFG16.num_perms)} AS distance
       FROM cand),
ranked AS (
  SELECT doc_a, doc_b, distance,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY distance ASC, doc_b ASC) AS rank
  FROM vp
),
agg AS (
  SELECT doc_a AS query_id,
         min(CASE WHEN rank = 1 THEN distance END) AS d1,
         sum(CASE WHEN rank > 1 THEN distance END) AS tail,
         max(rank) AS x
  FROM ranked WHERE rank <= 20 GROUP BY 1
),
conf AS (
  SELECT query_id,
         CASE WHEN tail > 0 AND x > 1 THEN (x - 1) * d1 / tail
              ELSE 0.0 END AS confidence
  FROM agg
)"""

    sql["confidence_clipped"] = f"""
WITH {conf_ctes},
top1 AS (SELECT doc_a AS query_id, doc_b AS top1_id FROM ranked WHERE rank = 1),
labels AS (SELECT conv_id_a, conv_id_b FROM read_parquet('{lp}')),
wrong AS (
  SELECT c.confidence FROM conf c
  JOIN top1 t ON t.query_id = c.query_id
  JOIN labels l ON l.conv_id_a = c.query_id
  WHERE t.top1_id <> l.conv_id_b
),
th AS (SELECT round(max(confidence), 6) AS threshold FROM wrong)
SELECT r.doc_a AS query_id, r.doc_b, CAST(r.rank AS INT) AS rank, th.threshold
FROM ranked r JOIN conf c ON c.query_id = r.doc_a CROSS JOIN th
WHERE c.confidence > {CONF_T} AND r.rank <= 20
"""

    # The full search lifecycle (probe -> top-X candidate lists -> exact
    # KTRA re-rank -> A10 similarity -> confidence gate -> clip); the
    # matcher chain is the same _sql_ktra_chain as ktra_pairs, fed by the
    # LSH candidate lists instead of an all-pairs universe.
    sql["search_rerank"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)},
cand AS MATERIALIZED (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS INT) AS agree
  FROM mh x JOIN mh y
    ON x.perm_id = y.perm_id AND x.minhash = y.minhash AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
lists AS (
  SELECT doc_a, doc_b,
         CAST(row_number() OVER (PARTITION BY doc_a
              ORDER BY agree DESC, doc_b ASC) AS INT) AS probe_rank,
         count(*) OVER (PARTITION BY doc_a) AS n_cand
  FROM cand),
topl AS MATERIALIZED (
  SELECT doc_a, doc_b FROM lists WHERE n_cand >= 2 AND probe_rank <= 20),
s AS (SELECT doc_id, list_transform({sql_tokens('text')},
      t -> CAST(length(t) AS BIGINT)) AS seq FROM docs),
m AS MATERIALIZED (SELECT doc_id, CASE WHEN len(seq) > 0 THEN
        list_transform(seq, x -> CAST(x AS DOUBLE)
                       - CAST(list_sum(seq) AS DOUBLE) / len(seq))
      ELSE CAST([] AS DOUBLE[]) END AS q0 FROM s
      WHERE doc_id IN (SELECT doc_a FROM topl UNION SELECT doc_b FROM topl)),
k0 AS MATERIALIZED (SELECT t.doc_a, t.doc_b, a.q0 AS q, b.q0 AS c
      FROM topl t JOIN m a ON a.doc_id = t.doc_a
      JOIN m b ON b.doc_id = t.doc_b),
{_sql_ktra_chain()},
kt AS MATERIALIZED (
  SELECT doc_a, doc_b, round(least(dm, dz, dp), 6) AS ktra_dist FROM l2),
rr AS MATERIALIZED (
  SELECT doc_a, doc_b, ktra_dist,
         CAST(row_number() OVER (PARTITION BY doc_a
              ORDER BY ktra_dist ASC, doc_b ASC) AS INT) AS rank
  FROM kt),
dls AS (SELECT doc_a, list(ktra_dist ORDER BY rank) AS dl FROM rr GROUP BY doc_a),
conf AS MATERIALIZED (
  SELECT doc_a AS query_id,
         CASE WHEN len(dl) > 1 AND list_reduce(dl[2:], (x, y) -> x + y) > 0
              THEN (len(dl) - 1) * dl[1] / list_reduce(dl[2:], (x, y) -> x + y)
              ELSE 0.0 END AS confidence
  FROM dls),
top1 AS (SELECT doc_a AS query_id, doc_b AS top1_id FROM rr WHERE rank = 1),
labels AS (SELECT conv_id_a, conv_id_b FROM read_parquet('{lp}')),
wrong AS (
  SELECT c.confidence FROM conf c
  JOIN top1 t ON t.query_id = c.query_id
  JOIN labels l ON l.conv_id_a = c.query_id
  WHERE t.top1_id <> l.conv_id_b),
th AS (SELECT round(max(confidence), 6) AS threshold FROM wrong)
SELECT r.doc_a AS query_id, r.doc_b AS result_id, r.ktra_dist,
       round(CASE WHEN r.ktra_dist > 0
                  THEN least(100.0, exp(1.0 / r.ktra_dist) - 1.0)
                  ELSE 100.0 END, 6) AS sim,
       r.rank, round(c.confidence, 6) AS confidence, th.threshold
FROM rr r JOIN conf c ON c.query_id = r.doc_a CROSS JOIN th
WHERE c.confidence > {CONF_T}
"""

    sql["quarantine"] = f"""
SELECT conv_id, count(*) AS n_turns FROM read_parquet('{tp}')
WHERE conv_id NOT IN ('c0000001', 'c0000003') GROUP BY conv_id
"""

    shingles_w = sql_shingles(sql_tokens("text"), k)
    sql["winnow_overlap"] = f"""
WITH {_sql_doc_documents()},
gw AS (
  SELECT doc_id, i AS pos,
         {sql_hash60(f"({shingles_w})[CAST(i AS INT) + 1]")} AS h
  FROM docs, unnest(range(len({shingles_w}))) t(i)
),
fp AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_hash
  FROM gw
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""

    sql["search_probe"] = f"""
WITH {_sql_conv_docs(tp)}, {_sql_hashed(k)}, {_sql_minhash(CFG16.num_perms)},
pb AS (SELECT DISTINCT perm_id, minhash FROM mh WHERE doc_id = '{PROBE_ID}'),
hits AS (
  SELECT m.doc_id, CAST(count(DISTINCT m.perm_id) AS INT) AS band_agreement
  FROM mh m JOIN pb ON m.perm_id = pb.perm_id AND m.minhash = pb.minhash
  WHERE m.doc_id <> '{PROBE_ID}' GROUP BY m.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
np AS (SELECT count(*) AS np FROM hashed WHERE doc_id = '{PROBE_ID}'),
inter AS (
  SELECT h.doc_id, count(*) AS i FROM hashed h
  JOIN hashed p ON h.h = p.h AND p.doc_id = '{PROBE_ID}'
  WHERE h.doc_id <> '{PROBE_ID}' GROUP BY h.doc_id
),
scored AS (
  SELECT hits.doc_id, hits.band_agreement,
         CASE WHEN s.n + np.np - COALESCE(i.i, 0) > 0
              THEN CAST(COALESCE(i.i, 0) AS DOUBLE)
                   / (s.n + np.np - COALESCE(i.i, 0))
              ELSE 1.0 END AS jaccard
  FROM hits JOIN sizes s ON s.doc_id = hits.doc_id
  LEFT JOIN inter i ON i.doc_id = hits.doc_id CROSS JOIN np
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY jaccard DESC, doc_id ASC) AS INT)
            AS rank
  FROM scored
)
SELECT doc_id AS neighbor_id, band_agreement,
       round(jaccard, 6) AS jaccard, rank
FROM ranked WHERE rank <= 20
"""

    sql["media_features"] = f"""
WITH {_sql_doc_documents()},
f AS (
  SELECT doc_id,
         CASE WHEN ({sql_hash60('doc_id')}) % 2 = 0
              THEN 'image/png' ELSE 'audio/wav' END AS media_type,
         sha256(text) AS hx,
         CAST(greatest(1, CAST(length(text) * 10 AS INT) // 1000) AS INT)
           AS n_frames
  FROM docs
)
SELECT doc_id, media_type,
       round(CAST(CAST('0x' || substr(hx, 3, 2) || substr(hx, 1, 2) AS BIGINT)
                  AS DOUBLE) / 65535.0, 6) AS f0,
       CAST(16 AS INT) AS dim,
       n_frames
FROM f
"""

    # IVF: centroids = the 16 smallest vec_ids' embeddings (deterministic
    # seeding, list_id = rank over vec_id); assignment = argmax of rounded
    # cosine with min-list tiebreak; probes visit their 4 nearest lists.
    cos_vc = _sql_cosine("v.embedding", "c.centroid")
    cos_qc = _sql_cosine("p.embedding", "c.centroid")
    sql["ann_ivf"] = f"""
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         embedding AS centroid
  FROM embeddings ORDER BY vec_id LIMIT 16
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, c.list_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round({cos_vc}, 6) DESC, c.list_id ASC)
             AS rk
    FROM embeddings v CROSS JOIN cents c
  ) WHERE rk = 1
),
probe_lists AS (
  SELECT query_id, list_id FROM (
    SELECT p.vec_id AS query_id, c.list_id,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY round({cos_qc}, 6) DESC, c.list_id ASC)
             AS rk
    FROM embeddings p CROSS JOIN cents c WHERE p.vec_id < 20
  ) WHERE rk <= 4
),
cand AS (
  SELECT DISTINCT pl.query_id, a.vec_id AS neighbor_id
  FROM probe_lists pl JOIN assign a ON a.list_id = pl.list_id
  WHERE a.vec_id <> pl.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round({_sql_cosine('p.embedding', 'c.embedding')}, 6) AS cos_sim
  FROM cand JOIN embeddings p ON p.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
),
rankedv AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM rankedv WHERE rank <= {KNN_K}
"""

    sql["corpus_curation"] = f"""
WITH RECURSIVE {_sql_doc_documents()},
qs AS (
  SELECT doc_id,
         round(
           (CASE WHEN len({toks}) >= 10 AND len({toks}) <= 5000 THEN 0.4
                 WHEN len({toks}) > 0 THEN 0.1 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN len({toks}) > 0
                    THEN CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
                         / len({toks}) ELSE 0.0 END) >= 2.0
                   AND (CASE WHEN len({toks}) > 0
                    THEN CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
                         / len({toks}) ELSE 0.0 END) <= 12.0
                   THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN length(text) > 0
                    THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                         / length(text) ELSE 0.0 END) <= 0.2
                   THEN 0.3 ELSE 0.1 END), 6) AS quality_score
  FROM docs
),
lscored AS (SELECT doc_id, {', '.join(lang_cases)} FROM docs),
lbest AS (SELECT doc_id, list_max([{struct_list}]) AS b FROM lscored),
lng AS (SELECT doc_id, CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END
                         AS lang_pred FROM lbest),
kept0 AS (
  SELECT d.doc_id, d.text FROM docs d
  JOIN qs ON qs.doc_id = d.doc_id
  JOIN lng ON lng.doc_id = d.doc_id
  WHERE qs.quality_score >= 0.5 AND lng.lang_pred <> 'und'
),
canon AS (SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id, md5(text) AS h FROM kept0) GROUP BY h),
surv AS (SELECT k.doc_id, k.text FROM kept0 k
         JOIN canon c ON c.doc_id = k.doc_id),
sh2 AS (SELECT doc_id, unnest(list_distinct({sql_shingles(sql_tokens('text'), k)}))
               AS shingle FROM surv),
hashed2 AS (SELECT doc_id, {sql_hash60('shingle')} AS h FROM sh2),
sizes2 AS (SELECT doc_id, count(*) AS n FROM hashed2 GROUP BY doc_id),
inter2 AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
           FROM hashed2 x JOIN hashed2 y ON x.h = y.h AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
jac2 AS (SELECT doc_a, doc_b,
                CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
         FROM inter2 JOIN sizes2 na ON inter2.doc_a = na.doc_id
         JOIN sizes2 nb ON inter2.doc_b = nb.doc_id),
edges2 AS (
  SELECT doc_a AS s, doc_b AS d FROM jac2 WHERE jaccard >= {JACCARD_T}
  UNION SELECT doc_b, doc_a FROM jac2 WHERE jaccard >= {JACCARD_T}
),
reach2(s, d) AS (
  SELECT s, d FROM edges2
  UNION SELECT r.s, e.d FROM reach2 r JOIN edges2 e ON r.d = e.s
),
labels2 AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
            FROM reach2 GROUP BY s)
SELECT min(doc_id) AS doc_id FROM labels2 GROUP BY cluster_id
UNION ALL
SELECT doc_id FROM surv
WHERE doc_id NOT IN (SELECT doc_id FROM labels2)
"""

    ann_t, ann_p, ann_d = 4, 4, 64
    plane_hash = sql_hash60(
        "'hp:' || CAST(tt AS VARCHAR) || ':' || CAST(jj AS VARCHAR)"
        " || ':' || CAST(ii AS VARCHAR)")
    cos_pc = _sql_cosine("p.embedding", "c.embedding")
    sql["ann_hyperplane"] = f"""
WITH planes AS (
  SELECT t.tt, j.jj, i.ii, (({plane_hash}) % 2001) - 1000 AS c
  FROM range({ann_t}) t(tt), range({ann_p}) j(jj), range({ann_d}) i(ii)
),
qv AS (
  SELECT vec_id, i.ii AS ii,
         CAST(floor(CAST(embedding[CAST(i.ii AS INT) + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings, range({ann_d}) i(ii)
),
dots AS (
  SELECT vec_id, tt, jj, sum(q * c) AS s
  FROM qv JOIN planes ON qv.ii = planes.ii GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, tt,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(jj AS INT))
                  ELSE 0 END) AS b
  FROM dots GROUP BY 1, 2
),
pbk AS (SELECT vec_id AS query_id, tt, b FROM buckets WHERE vec_id < 20),
cand AS (
  SELECT DISTINCT pbk.query_id, cb.vec_id AS neighbor_id
  FROM pbk JOIN buckets cb ON pbk.tt = cb.tt AND pbk.b = cb.b
  WHERE cb.vec_id <> pbk.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, round({cos_pc}, 6) AS cos_sim
  FROM cand JOIN embeddings p ON p.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
),
rankedq AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM rankedq WHERE rank <= {KNN_K}
"""

    return sql
