"""Optimization-round measurement harness (bench.py stays frozen).

Times each bench query in isolation with the SAME config as bench.py,
optionally via the noop sink (guide §1.4), captures
``.explain("formatted")`` plans, and prints per-query walls as JSON.

Usage:
  python bench_extra.py                       # all queries, 1 rep
  python bench_extra.py simhash_pass          # one query
  python bench_extra.py --plans plans/r06 --tag before   # dump plans only
  LSH_EXTRA_REPS=3 python bench_extra.py      # more reps

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lsh_spark import synth  # noqa: E402
from lsh_spark.canonicalize import conversation_docs, turn_docs  # noqa: E402
from lsh_spark.config import DedupConfig  # noqa: E402
from lsh_spark.operators import exact_dedup, knn, lsh_bands, minhash, pairs, simhash, suffix, tfidf  # noqa: E402
from lsh_spark.operators.shingle import doc_shingle_hashes_arrow  # noqa: E402
from lsh_spark.session import get_spark  # noqa: E402
from lsh_spark.sources.tables import load_table, load_transcripts  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CFG = DedupConfig(hash_mode="fast", substring_sample_mod=8, band_rows=2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class Queries:
    """Same query set as bench.run_queries, but each query returns the
    DataFrame (for noop/explain) instead of counting inline."""

    def __init__(self, spark):
        self.spark = spark
        self.tr = load_transcripts(spark, SF_DIR).localCheckpoint()
        self.docs = (conversation_docs(self.tr)
                     .select("doc_id", "text").localCheckpoint())
        self._hashes = None
        self._sigs = None

    @property
    def hashes(self):
        if self._hashes is None:
            self._hashes = doc_shingle_hashes_arrow(
                self.docs, CFG).localCheckpoint()
        return self._hashes

    @property
    def sigs(self):
        if self._sigs is None:
            self._sigs = minhash.minhash_signatures(
                self.hashes, CFG).localCheckpoint()
        return self._sigs

    def q_shingle_hashes(self):
        return doc_shingle_hashes_arrow(self.docs, CFG)

    def q_minhash_signatures(self):
        return minhash.minhash_signatures(self.hashes, CFG)

    def q_lsh_candidates_verify(self):
        bands = lsh_bands.band_buckets(self.sigs, CFG)
        cand = lsh_bands.candidate_pairs(bands, CFG)
        return pairs.verify_pairs(cand, self.hashes, CFG)

    def q_exact_dedup_turns(self):
        return exact_dedup.exact_dup_groups(turn_docs(self.tr))

    def q_simhash_pass(self):
        return simhash.simhash_candidate_pairs(
            simhash.simhash_docs_arrow(self.docs, CFG), CFG)

    def q_simhash_docs_only(self):
        return simhash.simhash_docs_arrow(self.docs, CFG)

    def q_substring_pass(self):
        return suffix.substring_candidate_pairs(
            self.docs, CFG, sample_mod=CFG.substring_sample_mod)

    def q_tfidf_docs(self):
        sample = self.docs.filter(
            F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
        return tfidf.tfidf(sample)

    def q_knn_bruteforce(self):
        emb = load_table(self.spark, SF_DIR, "embeddings")
        return knn.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 50), k=10)

    def q_ann_hyperplane(self):
        emb = load_table(self.spark, SF_DIR, "embeddings")
        return knn.ann_hyperplane(emb, emb.filter(F.col("vec_id") < 50), k=10)


ALL = ["shingle_hashes", "minhash_signatures", "lsh_candidates_verify",
       "exact_dedup_turns", "simhash_pass", "substring_pass", "tfidf_docs",
       "knn_bruteforce", "ann_hyperplane"]


def main():
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    tag = "before"
    use_noop = os.environ.get("LSH_EXTRA_NOOP", "1") == "1"
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    names = args or ALL
    reps = int(os.environ.get("LSH_EXTRA_REPS", "1"))

    tier = synth.tier_for_sf_dir(SF_DIR)
    synth.generate_tier(tier)

    out = {}
    for rep in range(reps):
        spark = get_spark("bench_extra", cores=CORES)
        q = Queries(spark)
        # force checkpoints outside the timed region (mirrors bench.py,
        # where hashes/sigs are checkpointed by earlier timed queries)
        q.hashes.count(), q.sigs.count()
        for name in names:
            fn = getattr(q, f"q_{name}")
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            # time construction + execution together (operators may do
            # eager work at construction, e.g. localCheckpoint), mirroring
            # how bench.py wraps the whole lambda in _timed
            t0 = time.time()
            df = fn()
            if use_noop:
                noop(df)
            else:
                df.count()
            dt = round(time.time() - t0, 3)
            if plans_dir is not None and rep == 0:
                os.makedirs(plans_dir, exist_ok=True)
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
            out.setdefault(name, []).append(dt)
            spark.sparkContext.setJobDescription(None)
        spark.stop()
    summary = {k: {"raw": v, "min": min(v)} for k, v in out.items()}
    print(json.dumps({"sf_dir": SF_DIR, "cores": CORES, "tag": tag,
                      "noop": use_noop, "queries": summary}))


if __name__ == "__main__":
    main()
