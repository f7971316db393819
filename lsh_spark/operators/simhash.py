"""SimHash pass: 60-bit sign-of-weighted-bit-sums fingerprints + Hamming
banding.

The reference's second filter pass is a second LSH index type (NLSH→PLSH
cascade, reference ``lsh.py:476-570``); the dedup engine's second pass is
SimHash per BASELINE.json north_star ("plus SimHash and suffix-array
exact-substring passes").

SimHash(doc) bit j = 1 iff Σ_tokens w(t) · (±1 from bit j of hash(t)) > 0,
with w = token frequency. Near-duplicates differ in few bits; candidate
pairs = docs agreeing on at least one of 4 15-bit chunks (pigeonhole: any
pair within Hamming distance ≤ 3 shares a chunk), verified by exact
popcount.

Two implementations:
 * ``simhash_docs`` — relational form (explode tokens × bit positions →
   conditional sum → bit-OR assemble). Fully expressible in ANSI SQL =
   oracle-checkable; JVM/codegen end-to-end.
 * ``simhash_docs_arrow`` — mapInArrow NumPy kernel (bit-unpack token hashes
   into a (n,60) matrix, weighted column sums) — the scale path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.functions.hashing import hash64, np_hash60
from lsh_spark.functions.text import py_tokens, tokens_col

N_CHUNKS = 4  # hamming_threshold 3 → 4 chunks by pigeonhole


def token_weights(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, token_hash, weight=count) long format."""
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    return (
        toks.select("doc_id", hash64(F.col("token"), cfg.hash_mode).alias("token_hash"))
        .groupBy("doc_id", "token_hash")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def simhash_docs(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, simhash long) — relational/codegen form.

    bits table = sequence(0, B-1) cross joined via explode; per (doc, bit):
    s = Σ weight * (bit set ? +1 : -1); simhash = Σ_{bits with s>0} 2^bit.
    """
    b = cfg.simhash_bits
    tw = token_weights(docs, cfg)
    # static (bit, 2^bit) pairs — bit shifts by a Column aren't supported,
    # and pow() doubles lose precision at 2^60, so carry exact longs.
    bit_structs = F.array(*[
        F.struct(F.lit(i).alias("bit"), F.lit(1 << i).cast("long").alias("p2"))
        for i in range(b)
    ])
    per_bit = (
        tw.select("doc_id", "token_hash", "weight",
                  F.explode(bit_structs).alias("bp"))
        .select("doc_id", "weight", F.col("bp.bit").alias("bit"),
                F.col("bp.p2").alias("p2"),
                F.expr("token_hash div bp.p2").alias("shifted"))
        .withColumn("contrib",
                    F.when(F.col("shifted") % 2 == 1, F.col("weight"))
                     .otherwise(-F.col("weight")))
        .groupBy("doc_id", "bit", "p2")
        .agg(F.sum("contrib").alias("s"))
    )
    return (
        per_bit.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("s") > 0, F.col("p2")).otherwise(F.lit(0)))
             .cast("long").alias("simhash"))
    )


def simhash_docs_arrow(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Same contract via a NumPy kernel with the two per-doc hot costs
    hoisted to batch level:

     * tokens are interned ONCE per batch (dict intern), so the md5
       token hash runs once per batch-global UNIQUE token instead of
       once per (doc, unique-token) — tokens repeat massively across
       docs (measured 234× fewer hash calls on sf0.1-shaped batches),
       and the per-doc ``np.unique`` sort disappears with it;
     * the per-doc sign sum runs over token INSTANCES via the shared
       sign table (Σ_instances sign ≡ Σ_uniq count·sign — identical
       integer math, bitwise-unchanged outputs) with a cache-sized
       (doc_tokens × B) temp per doc. A batch-wide ``np.add.reduceat``
       over all instances was tried and reverted: its
       (total_tokens × B) temp made 32 concurrent Python workers
       aggregate-memory-bandwidth bound.
    """
    bits = cfg.simhash_bits

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pandas as pd
        shifts = np.arange(bits, dtype=np.int64)
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            n = len(texts)
            toks = [py_tokens(t) for t in texts]
            lengths = np.fromiter((len(t) for t in toks), np.int64, n)
            out = np.zeros(n, dtype=np.int64)
            if int(lengths.sum()):
                # batch-global interning via pandas factorize (C-speed;
                # replaces the round-5 per-token dict.setdefault generator
                # — same first-appearance code order, so hash inputs and
                # outputs are bitwise-unchanged; measured ~25% faster on
                # sf0.1-shaped batches)
                flat = [tok for ts in toks for tok in ts]
                codes, uniques = pd.factorize(
                    np.asarray(flat, dtype=object))
                h_uniq = np_hash60(list(uniques))
                # int8 signs: the per-doc gather temp is (doc_tokens × B)
                # — int8 instead of int64 moves 8× fewer bytes through
                # cache/DRAM, the binding resource under 32 concurrent
                # workers; the sum accumulates in int64 so values are
                # unchanged.
                signs_uniq = ((((h_uniq[:, None] >> shifts[None, :]) & 1)
                               << 1) - 1).astype(np.int8)  # (n_uniq, B)
                offs = np.concatenate(([0], np.cumsum(lengths)))
                # per-doc summation stays — the (doc_tokens × B) temp fits
                # in cache; a batch-wide reduceat over (total_tokens × B)
                # was measurably SLOWER under 32 concurrent Python workers
                # (aggregate memory-bandwidth bound). Σ_instances sign ≡
                # Σ_uniq count·sign, so values are unchanged.
                for i in range(n):
                    if lengths[i]:
                        s = signs_uniq[codes[offs[i]:offs[i + 1]]].sum(
                            axis=0, dtype=np.int64)
                        out[i] = int(((s > 0).astype(np.int64)
                                      << shifts).sum())
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()), pa.array(out, pa.int64())],
                names=["doc_id", "simhash"],
            )

    return docs.select("doc_id", "text").mapInArrow(kernel, "doc_id string, simhash bigint")


def _chunk_keys(cfg: DedupConfig) -> "F.Column":
    """4 × 15-bit chunk keys (pigeonhole over hamming_threshold=3)."""
    chunk_bits = cfg.simhash_bits // N_CHUNKS
    mask = (1 << chunk_bits) - 1
    return F.array(*[
        F.shiftright(F.col("simhash"), i * chunk_bits).bitwiseAND(F.lit(mask))
        for i in range(N_CHUNKS)
    ])


def _combo_keys(cfg: DedupConfig) -> "F.Column":
    """Manku-style block-combination keys (Manku, Jain & Sarma, WWW'07 §3):
    split the B bits into m blocks, key on every combination of c = m − t
    blocks. Any pair within Hamming ≤ t dirties ≤ t blocks, leaving ≥ c
    clean ones, so some combination is clean for both docs — completeness
    is the same pigeonhole as chunk mode, but the key carries c·(B/m) bits
    instead of B/4: for B=60, t=3 → m=6 blocks of 10 bits, C(6,3)=20 tables
    of 30-bit keys. Expected bucket size drops from N/2^15 to N/2^30 — the
    difference between quadratic blowup and near-uniqueness at 10^9+ docs,
    at the cost of 20 key rows per doc instead of 4.
    """
    from itertools import combinations
    t = cfg.hamming_threshold
    bits = cfg.simhash_bits
    m = t + 3 if bits % (t + 3) == 0 else N_CHUNKS  # 60,3 → 6 blocks
    c = m - t
    block_bits = bits // m
    mask = (1 << block_bits) - 1
    blocks = [
        F.shiftright(F.col("simhash"), i * block_bits).bitwiseAND(F.lit(mask))
        for i in range(m)
    ]
    keys = []
    for combo in combinations(range(m), c):
        key = F.lit(0).cast("long")
        for j, bi in enumerate(combo):
            key = key + F.shiftleft(blocks[bi], j * block_bits)
        keys.append(key)
    return F.array(*keys)


def simhash_candidate_pairs(sh: DataFrame, cfg: DedupConfig,
                            all_pairs: bool = False,
                            mode: str = "combo") -> DataFrame:
    """Pairs within Hamming ≤ threshold via LSH-table banding + popcount
    verify. Output: (doc_a, doc_b, hamming int).

    Both key modes are COMPLETE (pigeonhole) and exact after verification:
     * ``mode="chunk"`` — 4 × 15-bit chunks. Keyspace 2^15: at N docs each
       bucket holds ~N/32k docs and the join output grows as N²/2^15 —
       fine to ~10^6 docs, catastrophic at web scale.
     * ``mode="combo"`` (default) — 20 × 30-bit block combinations (see
       ``_combo_keys``): the 100 TB path.

    Hot buckets (identical simhash regions shared by huge boilerplate
    groups) are star-linked via operators/skew.py unless ``all_pairs=True``;
    star edges pass through the same popcount verification, so no false
    positives — a star member whose Hamming distance to the bucket minimum
    exceeds the threshold is dropped (recall in hot buckets is then
    bounded by the star topology; the MinHash pass covers those pairs).
    """
    from lsh_spark.operators.skew import all_pair_rows, capped_pair_rows
    # materialize the (doc_id, simhash) frame once: the plan below consumes
    # it up to 8 times (census, small/hot membership, star min, both verify
    # legs) and when ``sh`` is the Arrow kernel the whole tokenize+hash
    # pass re-executes per consumer (measured: 8 MapInArrow nodes in the
    # bench simhash_pass plan). Two narrow columns per doc — tiny.
    sh = sh.localCheckpoint()
    keys = _chunk_keys(cfg) if mode == "chunk" else _combo_keys(cfg)
    # stage the key array in its own Project before exploding — same
    # shape as operators/lsh_bands.py band_buckets, where exploding the
    # inline higher-order expression measurably dropped Generate out of
    # whole-stage codegen (here both forms codegen today; the staged form
    # is kept so the generator input stays a plain attribute)
    keyed = (sh.select("doc_id", keys.alias("_keys"))
             .select("doc_id",
                     F.posexplode("_keys").alias("chunk_id", "chunk_val")))
    key_cols = ["chunk_id", "chunk_val"]
    if not all_pairs:
        # materialize the exploded key table once, mirroring the MinHash
        # band path (lsh_bands.candidate_pairs): the capped path scans it
        # for the census AND both membership splits, and each re-derivation
        # re-runs the 20-key combo build + the 20× posexplode fan-out
        # (measured at turn granularity: three 9.2M-row Generate nodes in
        # one pair query, ~1-1.5 s each — the narrow (chunk_id, chunk_val,
        # doc_id) rows are far cheaper to rescan than to rebuild). The
        # oracle-exact all_pairs branch keeps its original two-scan plan.
        keyed = keyed.localCheckpoint()
    rows = (all_pair_rows(keyed, key_cols) if all_pairs
            else capped_pair_rows(keyed, key_cols, cfg))
    cand = rows.select("doc_a", "doc_b").distinct()
    va = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(va, "doc_a").join(vb, "doc_b")
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= cfg.hamming_threshold)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )
