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
 * bucket sizes are computed with a two-phase salted aggregation — partial
   counts on (band_id, band_hash, salt), then merged — so one pathological
   band hash (boilerplate text) cannot pin a single reducer;
 * buckets larger than ``hot_bucket_cap`` are NOT expanded into O(k²) pairs;
   each member is linked to the bucket's minimum doc_id instead (a star).
   For clustering this is lossless — the star connects exactly the same
   component — while the pair count drops from k(k-1)/2 to k-1. Verification
   of star edges still uses exact Jaccard, so false merges are not
   introduced beyond what per-pair verification allows.
 * AQE skew-join handling stays on as a backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig


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
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(F.col("sig"), i * r + 1, r), ",")),
    )
    return (
        sigs.select("doc_id", F.posexplode(bands).alias("band_id", "band_hash"))
        .select(F.col("band_id").cast("int"), "band_hash", "doc_id")
    )


def bucket_sizes_salted(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Bucket-size census via explicit two-phase salted groupBy.

    Spark's hash aggregate already does map-side partial aggregation; the
    explicit salt additionally randomizes the *reduce-side* key so a single
    mega-bucket's partials spread over ``salt_buckets`` reducers before the
    final merge — the north_rule-mandated pattern, and the one you want at
    1000 executors where one hot (band_id, band_hash) would otherwise
    serialize on one task.
    """
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets)).alias("salt")
    partial = (
        bands.select("band_id", "band_hash", salt)
        .groupBy("band_id", "band_hash", "salt")
        .agg(F.count("*").alias("c"))
    )
    return (
        partial.groupBy("band_id", "band_hash")
        .agg(F.sum("c").cast("long").alias("bucket_size"))
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig,
                    all_pairs: bool = False) -> DataFrame:
    """Distinct candidate doc pairs (doc_a < doc_b) + band agreement count.

    ``all_pairs=True`` expands every bucket fully (reference-exact pair
    semantics, usable when buckets are known small / oracle checks).
    Default: buckets above ``hot_bucket_cap`` are star-linked to the bucket
    minimum (component-preserving skew defusal); agreement counts for star
    edges remain exact because counting happens after pair generation,
    over all bands.
    """
    if all_pairs:
        eligible = bands
        star = None
    else:
        sizes = bucket_sizes_salted(bands, cfg)
        with_size = bands.join(sizes, ["band_id", "band_hash"])
        eligible = with_size.filter(F.col("bucket_size") <= cfg.hot_bucket_cap) \
                            .select("band_id", "band_hash", "doc_id")
        hot = with_size.filter(F.col("bucket_size") > cfg.hot_bucket_cap) \
                       .select("band_id", "band_hash", "doc_id")
        hot_min = hot.groupBy("band_id", "band_hash").agg(F.min("doc_id").alias("doc_a"))
        star = (
            hot.join(hot_min, ["band_id", "band_hash"])
            .filter(F.col("doc_id") != F.col("doc_a"))
            .select("band_id", F.col("doc_a"), F.col("doc_id").alias("doc_b"))
        )

    left = eligible.select("band_id", "band_hash", F.col("doc_id").alias("doc_a"))
    right = eligible.select("band_id", "band_hash", F.col("doc_id").alias("doc_b"))
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("band_id", "doc_a", "doc_b")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    # one agreement unit per band even if several buckets of the same band
    # matched (cannot happen for exact hashes, but keeps Q5 semantics)
    return (
        pairs.distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("band_agreement"))
    )
