"""Band-geometry experiment for the MinHash-LSH near-dup pipeline.

near_dup_pairs carries the steepest SCALING ratio on the board (4.8x on
10x data in round 5), attributed to verify-side fan-in. This measures,
per banding geometry of the same 16-hash signature, the quantities that
drive that cost:

- rep-level candidate pairs (what LSH emits -> what verify must score),
- verified rep pairs (candidates that survive exact Jaccard >= 0.7),
- expanded output pairs (after group expansion),
- wall time of the candidates+verify phase (groups/buckets prebuilt and
  persisted, mirroring bench.py's shared-stage accounting).

Geometry math (P[candidate] = 1-(1-s^r)^b at Jaccard s):
  2 bands x 8 rows: s=0.7 -> 0.11   (misses ~9/10 true near-dups)
  4 bands x 4 rows: s=0.7 -> 0.67, s=0.3 -> 0.03
  8 bands x 2 rows: s=0.7 -> 0.995, s=0.3 -> 0.53  (half of all weakly
                    similar pairs become candidates)

Usage: python tools/band_geometry.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cati_database_feeder_spark.catalog import load_table
from cati_database_feeder_spark.operators import dedup
from cati_database_feeder_spark.session import get_session

GEOMETRIES = [(2, 8), (4, 4), (8, 2)]  # (bands, rows) of 16 hashes
THRESHOLD = 0.7


def run(spark, sf_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    memb = dedup.tokset_groups(docs).persist()
    memb.count()
    print(f"\n== {sf_dir}: {docs.count()} docs, "
          f"{memb.filter(F.col('id') == F.col('gid')).count()} reps ==")
    for bands, rows in GEOMETRIES:
        buckets = dedup.rep_band_buckets(memb, 16, bands).persist()
        buckets.count()
        t0 = time.time()
        cands = dedup.minhash_lsh_candidates(
            docs, groups=memb, bands=bands, expand=False)
        n_cands = cands.count()
        out = dedup.near_dup_pairs(docs, threshold=THRESHOLD, bands=bands,
                                   groups=memb, rep_candidates=cands)
        n_out = out.count()
        dt = time.time() - t0
        n_rep_verified = out.filter(F.col("jaccard") < 1.0).count()
        buckets.unpersist()
        print(f"{bands}x{rows}: rep_cands={n_cands:>8}  "
              f"expanded_out={n_out:>8}  (cross={n_rep_verified:>7})  "
              f"cands+verify={dt:6.2f}s")
    memb.unpersist()


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_session("band_geometry")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        run(spark, d)
