"""LSH banding: signature → band buckets → candidate pairs, skew-aware.

Reference analog: the inverted index with one bucket row per (permutation,
selection-fn) pair — i.e. banding with r=1 row per band, b = 2·P bands
(reference ``lsh.py:222-269``; row addressing ``lsh.py:124-128``) — and
probe-time collision counting (``lsh.py:272-317``), where a doc is a
candidate if ANY band collides (OR over bands, ``lsh.py:459-463``) and the
score is the number of agreeing bands (duplicate hits in one bucket count
once, ``lsh.py:307-308`` — SURVEY.md Q5).

Scale design (north_rule: "band hashes grouped via salted groupBy to defuse
hot-bucket skew"):
 * bucket sizes are computed with one partially-aggregated groupBy —
   map-side combine bounds a pathological band hash's (boilerplate text)
   reduce fan-in by the map-task count, which is the same bound the
   round-5 explicit salt phase provided at the cost of a second full
   aggregation (operators/skew.py, bucket_census docstring);
 * buckets larger than ``hot_bucket_cap`` are NOT expanded into O(k²) pairs;
   each member is linked to the bucket's minimum doc_id instead (a star).
   For clustering this is lossless — the star connects exactly the same
   component — while the pair count drops from k(k-1)/2 to k-1. Verification
   of star edges still uses exact Jaccard, so false merges are not
   introduced beyond what per-pair verification allows. band_agreement
   counts are exact in all_pairs mode and a lower bound when the cap
   triggers (see candidate_pairs docstring).
 * AQE skew-join handling stays on as a backstop (session.py).

The census + star-link machinery is factored into operators/skew.py and
shared with the SimHash chunk join, the substring gram join and the winnow
overlap join — every keyed self-join in the engine gets the same defusal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.operators.skew import all_pair_rows, bucket_census, capped_pair_rows


def band_buckets(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, sig) → (band_id int, band_hash long, doc_id).

    r = cfg.band_rows signature rows per band; for r=1 the band hash IS the
    signature value (oracle-reproducible); for r>1 rows are combined with
    xxhash64 over the slice.
    """
    r, b = cfg.band_rows, cfg.num_bands
    if r == 1:
        return sigs.select(
            F.posexplode("sig").alias("band_id", "band_hash"), "doc_id"
        ).select(F.col("band_id").cast("int"), "band_hash", "doc_id")
    # r>1 (scale mode only — every oracle config pins r=1, where the band
    # hash IS the signature value): hash the r-slice DIRECTLY with the
    # multi-column xxhash64 instead of round 5's
    # xxhash64(array_join(slice(sig,...), ",")) — same collision
    # structure (two docs share a band key iff their r values are equal,
    # modulo ~2^-64 hash collisions either way), but no per-band string
    # materialization: the band table is re-derived per census/membership
    # consumer, so the string build+hash was paid 3× per pass
    # (guide §1.2 step 2 — per-task work).
    bands = F.array(*[
        F.xxhash64(*[F.element_at("sig", i * r + j + 1) for j in range(r)])
        for i in range(b)
    ])
    # stage the bands array in its own Project: exploding a plain column
    # attribute keeps Generate inside whole-stage codegen, while exploding
    # the higher-order expression inline does not (verified via .explain)
    return (
        sigs.select("doc_id", bands.alias("_bands"))
        .select("doc_id", F.posexplode("_bands").alias("band_id", "band_hash"))
        .select(F.col("band_id").cast("int"), "band_hash", "doc_id")
    )


def bucket_sizes_salted(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Bucket-size census (see operators/skew.py — shared by all passes)."""
    return bucket_census(bands, ["band_id", "band_hash"], cfg)


def candidate_pairs(bands: DataFrame, cfg: DedupConfig,
                    all_pairs: bool = False) -> DataFrame:
    """Distinct candidate doc pairs (doc_a < doc_b) + band agreement count.

    ``all_pairs=True`` expands every bucket fully — reference-exact pair
    semantics AND exact agreement counts; use for oracle checks / corpora
    with known-bounded buckets.

    Default: buckets above ``hot_bucket_cap`` are star-linked to the bucket
    minimum (component-preserving skew defusal, operators/skew.py).
    Agreement counts are then a LOWER BOUND for pairs that also co-occur in
    a hot bucket: the hot bucket contributes only its star edges, so a
    non-star pair loses that band's agreement unit. Downstream Jaccard
    verification is unaffected (it recomputes exact similarity per pair).
    """
    key = ["band_id", "band_hash"]
    if all_pairs:
        pair_rows = all_pair_rows(bands, key)
    else:
        # materialize the band table once: the capped path consumes it for
        # the census AND the membership splits, and each re-derivation
        # decodes the full signature arrays + re-hashes every band slice
        # (measured at turn granularity: ~4 s per derivation at 7.3M band
        # rows — the narrow (band_id, band_hash, doc_id) rows are far
        # cheaper to rescan than to rebuild)
        bands = bands.localCheckpoint()
        pair_rows = capped_pair_rows(bands, key, cfg)
    # one agreement unit per band: (band_id, doc_a, doc_b) rows are unique
    # by construction — a doc sits in exactly ONE bucket per band (one sig
    # row per doc), and a bucket is either expanded or star-linked, never
    # both — so count(*) ≡ countDistinct(band_id). countDistinct planned as
    # TWO exchanges (partial dedup on (a,b,band) + final count on (a,b));
    # the plain count partial-aggregates map-side into ONE exchange.
    return (
        pair_rows.select("doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("band_agreement"))
    )
