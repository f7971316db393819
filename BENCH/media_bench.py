"""Ad-hoc r6 measurement for the multimodal declared query (bench.py frozen).

Times __spark_entry__.q_media_features with the noop sink (guide §1.4) and
dumps .explain("formatted"). Usage:
  python BENCH/media_bench.py [--plan plans/r06/media_features_before.txt]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("LSH_EXTRA_REPS", "3"))


def main() -> None:
    plan_path = None
    if "--plan" in sys.argv:
        plan_path = sys.argv[sys.argv.index("--plan") + 1]

    import __spark_entry__ as entry
    from lsh_spark.session import get_spark
    spark = get_spark("media-bench")
    spark.sparkContext.setJobDescription("r6 media_features bench")

    df = entry.q_media_features(spark, SF_DIR)
    if plan_path:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(plan_path, "w") as f:
            f.write(buf.getvalue())
    walls = []
    for _ in range(REPS):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"query": "media_features", "sf_dir": SF_DIR,
                      "walls": walls, "min": min(walls)}))
    spark.stop()


if __name__ == "__main__":
    main()
