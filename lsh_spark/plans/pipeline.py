"""The full dedup cascade: exact → MinHash-LSH → SimHash → substring → CC.

Cascade semantics follow the reference's NLSH→PLSH two-stage filter
(reference ``lsh.py:476-570``): each pass only contributes edges the earlier
passes didn't already produce; the union of accepted edges feeds one
connected-components run. (The reference *removes* candidates rejected by
pass 1 from pass 2, ``lsh.py:466-471`` — for dedup we keep the
union-of-evidence semantics instead, which is strictly more conservative
about false negatives; the subtraction variant is `left_anti` one-liner and
noted here for parity.)

Stage boundaries are checkpointable (CheckpointStore) so a killed run
resumes from the last committed stage; each stage is also the natural
shuffle boundary, so checkpointing does not add shuffles — it only
truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lsh_spark.canonicalize import conversation_docs, turn_docs
from lsh_spark.config import DedupConfig
from lsh_spark.operators import exact_dedup, lsh_bands, minhash, pairs, simhash, suffix
from lsh_spark.operators.connected_components import connected_components
from lsh_spark.operators.shingle import doc_shingle_hashes_arrow
from lsh_spark.plans.checkpoint import CheckpointStore


def dedup_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupConfig | None = None,
    store: CheckpointStore | None = None,
    passes: tuple[str, ...] = ("minhash", "simhash", "substring"),
    cascade_mode: str = "union",
) -> DataFrame:
    """transcripts → (doc_id, cluster_id) near-duplicate clusters.

    Returns only docs that belong to a multi-member cluster; all other docs
    are singleton clusters of themselves.

    ``cascade_mode``:
      * "union" (default) — every pass contributes edges; safest against
        false negatives (a pair missed or rejected by one pass can still be
        linked by another).
      * "subtract" — reference-exact cascade semantics: candidate pairs
        REJECTED by the MinHash pass's verification are excluded from the
        later passes' outputs, mirroring how the reference removes
        candidates clipped by filter 1 from filter 2's candidate set
        (reference ``lsh.py:466-471``, C4).
    """
    cfg = cfg or DedupConfig()
    docs = (conversation_docs(transcripts) if cfg.granularity == "conv"
            else turn_docs(transcripts)).select("doc_id", "text")

    def ck(stage: str, thunk):
        if store is None:
            return thunk().localCheckpoint()
        return store.get_or_compute(spark, stage, thunk)

    if store is not None or cfg.hash_mode != "fast":
        # slow path reads ``docs`` three times (shingle/simhash/substring),
        # and a store needs the stage committed for resume. The fast path
        # with no store has exactly ONE consumer (the fused scan), so the
        # checkpoint there would only add a full extra materialization of
        # the text column plus a driver barrier.
        docs = ck("docs", lambda: docs)
    rejected_ref: dict[str, DataFrame] = {}

    def boilerplate_filter(h: DataFrame) -> DataFrame:
        # opt-in recall/precision knob (cfg.max_shingle_df_frac): drop
        # boilerplate shingles before signatures AND verification — the
        # dedup analog of the reference's min-tfidf pitch filter
        # (scripts/tfidf_pitch_extraction.py:114-181). Hot-bucket caps
        # already guarantee survival; this improves candidate precision.
        if cfg.max_shingle_df_frac is None:
            return h
        from lsh_spark.operators.tfidf import filter_common_shingles_arrays
        return ck("shingle_hashes_filtered",
                  lambda: filter_common_shingles_arrays(
                      h, cfg.max_shingle_df_frac))

    if cfg.hash_mode == "fast":
        # single-scan path: ONE Arrow pass over the text column produces
        # shingle hashes + MinHash signature + SimHash + sampled grams —
        # the corpus is shipped through Python exactly once
        from lsh_spark.operators.fused import fused_doc_features
        fused = ck("fused", lambda: fused_doc_features(docs, cfg))
        hashes = boilerplate_filter(fused.select("doc_id", "hashes"))

        def minhash_pass():
            if cfg.max_shingle_df_frac is not None:
                # fused sigs were computed pre-filter; re-derive from the
                # filtered hash arrays so signature and verification agree
                sigs = minhash.minhash_signatures(hashes, cfg)
            else:
                sigs = fused.filter(F.col("sig").isNotNull()).select("doc_id", "sig")
            bands = lsh_bands.band_buckets(sigs, cfg)
            cand = lsh_bands.candidate_pairs(bands, cfg)
            verified = pairs.verify_pairs(cand, hashes, cfg).select("doc_a", "doc_b")
            if cascade_mode == "subtract":
                rejected_ref["df"] = cand.select("doc_a", "doc_b") \
                    .exceptAll(verified).localCheckpoint()
            return verified

        def simhash_pass():
            sh = fused.select("doc_id", "simhash")
            return (simhash.simhash_candidate_pairs(sh, cfg)
                    .select("doc_a", "doc_b"))

        def substring_pass():
            g = fused.select("doc_id", F.explode("grams").alias("gram_hash"))
            return (suffix.shared_key_pairs(
                        g, "gram_hash", cfg, cfg.hot_bucket_cap,
                        count_col="shared_grams")
                    .select("doc_a", "doc_b"))
    else:
        hashes = boilerplate_filter(
            ck("shingle_hashes", lambda: doc_shingle_hashes_arrow(docs, cfg)))

        def minhash_pass():
            sigs = minhash.minhash_signatures(hashes, cfg)
            bands = lsh_bands.band_buckets(sigs, cfg)
            cand = lsh_bands.candidate_pairs(bands, cfg)
            verified = pairs.verify_pairs(cand, hashes, cfg).select("doc_a", "doc_b")
            if cascade_mode == "subtract":
                rejected_ref["df"] = cand.select("doc_a", "doc_b") \
                    .exceptAll(verified).localCheckpoint()
            return verified

        def simhash_pass():
            sh = simhash.simhash_docs_arrow(docs, cfg)
            return (simhash.simhash_candidate_pairs(sh, cfg)
                    .select("doc_a", "doc_b"))

        def substring_pass():
            return (suffix.substring_candidate_pairs(
                        docs, cfg, sample_mod=cfg.substring_sample_mod,
                        hot_gram_cap=cfg.hot_bucket_cap)
                    .select("doc_a", "doc_b"))

    thunks = {"minhash": minhash_pass, "simhash": simhash_pass,
              "substring": substring_pass}
    wanted = [(name, thunks[name]) for name in passes if name in thunks]
    # passes run sequentially: each is internally fully parallel, and
    # measured A/B showed concurrent submission thrashes Python workers /
    # shuffle I/O in local mode (98s sequential vs 160s threaded at 16
    # cores on the scale tier) — on a real cluster the scheduler pools
    # would make concurrency a wash too
    edge_frames = []
    for name, fn in wanted:
        ef = ck(f"edges_{name}", fn)
        if (cascade_mode == "subtract" and name != "minhash"
                and rejected_ref.get("df") is not None):
            # reference C4: pairs clipped by the earlier filter do not
            # re-enter via later passes (lsh.py:466-471)
            ef = ef.join(rejected_ref["df"], ["doc_a", "doc_b"], "left_anti")
        edge_frames.append(ef)

    edges = edge_frames[0]
    for ef in edge_frames[1:]:
        edges = edges.unionByName(ef)
    # no .distinct() here: both CC variants symmetrize + distinct their
    # edge input themselves, so the pre-distinct was a redundant extra
    # full shuffle of the edge set (guide §2.4 — remove shuffles outright)

    # with a store, the CC loop also commits per-iteration label state
    # (cc_iter{n} stages) — a killed run resumes label propagation itself.
    # cfg.cc_algorithm="star" swaps in the O(log diameter) alternating
    # star rewrites for graphs with long containment chains
    if cfg.cc_algorithm == "star":
        from lsh_spark.operators.connected_components import \
            connected_components_star
        labels = connected_components_star(edges, store=store)
    else:
        labels = connected_components(edges, store=store)
    if store is not None:
        labels = store.write(labels, "clusters")
    return labels


def dedup_keep_list(labels: DataFrame, docs: DataFrame) -> DataFrame:
    """Docs to KEEP after dedup: cluster minimum per cluster + all
    singletons (training-data pipeline contract)."""
    keep_clustered = labels.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    singletons = docs.select("doc_id").join(labels.select("doc_id"), "doc_id", "left_anti")
    return keep_clustered.select("doc_id").unionByName(singletons)


def incremental_dedup_flags(new_docs: DataFrame, index_bands: DataFrame,
                            index_hashes: DataFrame,
                            cfg: DedupConfig,
                            new_hashes: DataFrame | None = None,
                            new_bands: DataFrame | None = None) -> DataFrame:
    """Dedup a NEW batch against an existing band index — the steady-state
    ingest operation at 10^12 turns: the corpus is NEVER re-clustered per
    delta; new docs probe the checkpointed ``(band_id, band_hash, doc_id)``
    table (plans/checkpoint.py — store it bucketed on the band key and the
    big side never reshuffles), plus a within-batch pass so dups arriving
    in the same delta are caught too.

    Skew: an index bucket holding k ≫ cap members (boilerplate) would emit
    k rows per colliding new doc; buckets above ``cfg.hot_bucket_cap`` are
    collapsed to their min-doc representative (census via the shared
    skew module) — the flag still fires against a genuine key-sharer and
    the verifier still checks it exactly.

    Output: (doc_a = new doc, doc_b = matched doc, band_agreement,
    jaccard, match_kind 'index'|'batch'), Jaccard-verified ≥ threshold.
    """
    from lsh_spark.operators.shingle import doc_shingle_hashes_arrow
    from lsh_spark.operators.skew import bucket_census

    if new_hashes is None:
        # two consumers below (signatures + the verify hash union): without
        # the checkpoint the Arrow tokenize+hash kernel runs once per
        # consumer. Callers that already materialized the delta's hashes
        # (incremental_dedup's fold-in) pass them in instead.
        new_hashes = doc_shingle_hashes_arrow(new_docs, cfg).localCheckpoint()
    if new_bands is None:
        new_bands = lsh_bands.band_buckets(
            minhash.minhash_signatures(new_hashes, cfg), cfg)

    # hot-key set materialized once (tiny by design): it is broadcast into
    # BOTH the reps semi-join and the cold anti-join — without the
    # checkpoint each broadcast build re-runs the full index census
    hot_keys = (bucket_census(index_bands, ["band_id", "band_hash"], cfg)
                .filter(F.col("bucket_size") > cfg.hot_bucket_cap)
                .select("band_id", "band_hash")
                .localCheckpoint())
    reps = (index_bands
            .join(F.broadcast(hot_keys), ["band_id", "band_hash"],
                  "left_semi")
            .groupBy("band_id", "band_hash")
            .agg(F.min("doc_id").alias("doc_id")))
    cold = (index_bands
            .join(F.broadcast(hot_keys), ["band_id", "band_hash"],
                  "left_anti"))
    probe_side = cold.unionByName(reps).withColumnRenamed("doc_id", "doc_b")

    vs_index = (
        new_bands.join(probe_side, ["band_id", "band_hash"])
        .filter(F.col("doc_id") != F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b", "band_id").distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("band_agreement"))
        .withColumn("match_kind", F.lit("index")))
    vs_batch = (lsh_bands.candidate_pairs(new_bands, cfg)
                .withColumn("match_kind", F.lit("batch")))
    cand = vs_index.unionByName(vs_batch)

    all_hashes = index_hashes.unionByName(new_hashes)
    # match_kind rides through the verifier (extra_cols) — round 5
    # re-joined the candidate frame afterwards just to recover it, which
    # re-ran candidate generation a second time
    verified = pairs.verify_pairs(
        cand.select("doc_a", "doc_b", "band_agreement", "match_kind"),
        all_hashes, cfg, extra_cols=("match_kind",))
    return verified.select(
        "doc_a", "doc_b", "band_agreement",
        F.round("jaccard", 6).alias("jaccard"), "match_kind")


def incremental_dedup(spark: SparkSession, new_docs: DataFrame,
                      store: CheckpointStore, cfg: DedupConfig | None = None,
                      bands_stage: str = "bands",
                      hashes_stage: str = "shingle_hashes",
                      update_index: bool = True,
                      bucketed: bool | None = None,
                      n_buckets: int = 16) -> DataFrame:
    """Store-aware wrapper: probe the checkpointed index, then fold the new
    batch's bands + shingle hashes back into the store so the next delta
    sees this one.

    ``bucketed`` (default: auto-detect from the store) is the 100 TB
    shape: the index stages live as BUCKETED tables (bands on band_hash,
    hashes on doc_id), so the probe join and verify semi-join never
    reshuffle the corpus side, and the fold-in is an O(delta)
    ``append_bucketed`` — never an O(corpus) union-rewrite.  Build such
    an index with ``store.write_bucketed(..., ("band_hash",)/("doc_id",),
    n_buckets)``; a plain ``store.write`` index keeps the original
    read/union/rewrite path.

    Crash-ordering invariant (ADVICE r3): the HASHES stage is written
    BEFORE the bands stage.  A crash between the two writes then leaves
    extra hashes with no matching band rows — harmless, the banded probe
    never surfaces them — whereas the reverse order would leave band rows
    whose shingle hashes are missing, and verify_pairs' inner join on
    hashes would silently drop those candidates on the next delta."""
    cfg = cfg or DedupConfig()
    from lsh_spark.operators.shingle import doc_shingle_hashes_arrow
    # ADVICE r4: a probe whose banding geometry differs from the index's
    # (e.g. r=2 session defaults against an r=1-era index) joins disjoint
    # band keys and silently reports zero vs-index dups — fail loudly
    store.validate_geometry(cfg)
    if bucketed is None:
        bucketed = store.exists_bucketed(bands_stage, spark)
    if bucketed:
        index_bands = store.read_bucketed(spark, bands_stage)
        index_hashes = store.read_bucketed(spark, hashes_stage)
    else:
        index_bands = store.read(spark, bands_stage)
        index_hashes = store.read(spark, hashes_stage)
    # the delta's hashes/bands are needed TWICE (probe flags + index
    # fold-in): compute them once, checkpointed — round 5 re-ran the
    # Arrow tokenize+hash kernel and the signature kernel per use
    new_hashes = doc_shingle_hashes_arrow(new_docs, cfg).localCheckpoint()
    new_bands = lsh_bands.band_buckets(
        minhash.minhash_signatures(new_hashes, cfg), cfg).localCheckpoint()
    flags = incremental_dedup_flags(new_docs, index_bands, index_hashes, cfg,
                                    new_hashes=new_hashes,
                                    new_bands=new_bands)
    if update_index:
        flags = flags.localCheckpoint()  # materialize before index mutation
        if bucketed:
            store.append_bucketed(new_hashes, hashes_stage,
                                  ("doc_id",), n_buckets)
            store.append_bucketed(new_bands, bands_stage,
                                  ("band_hash",), n_buckets)
        else:
            # O(delta) fold-in for the plain store too: append the batch's
            # part files next to the committed stage instead of reading and
            # rewriting the whole index per delta (round 5 unioned + rewrote
            # — an O(corpus) write inside every steady-state ingest). Stage
            # contents are identical (old ∪ new rows); the hashes-before-
            # bands crash ordering is preserved.
            store.append(new_hashes, hashes_stage)
            store.append(new_bands, bands_stage)
    return flags


def exact_pass(docs: DataFrame) -> DataFrame:
    """Exact-dup edges (doc → group canonical) for the cascade's pass 0."""
    groups = exact_dedup.exact_dup_groups(docs)
    with_hash = docs.select("doc_id", F.md5("text").alias("text_hash"))
    return (
        with_hash.join(groups, "text_hash")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select(F.least("doc_id", "canonical_id").alias("doc_a"),
                F.greatest("doc_id", "canonical_id").alias("doc_b"))
    )
