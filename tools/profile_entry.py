"""Decompose a registered query's wall time into plan-build /
optimize+codegen / execution (guide §1: measure first, §7.3: planning
is driver-side, single-threaded).

For each named query (or stage builder), in ONE warm session:
  build    — time to call the registry fn (DataFrame construction;
             driver-side Python + analysis)
  optimize — time to force queryExecution().executedPlan() on a FRESH
             plan (Catalyst analyze+optimize+physical planning)
  exec1    — first noop write of a fresh plan (includes codegen/JIT)
  exec_min — min of 3 further noop writes of fresh plans (the bench's
             warm-plan cost class: every bench run rebuilds the plan)

Usage: python tools/profile_entry.py [sf_dir] name1 name2 ...
       python tools/profile_entry.py [sf_dir] --top N   # N most
           expensive non-stage/boot entries from BENCH_FULL.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from cati_database_feeder_spark.session import get_session  # noqa: E402
from cati_database_feeder_spark import queryset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def profile(spark, sf_dir: str, name: str) -> dict:
    fn = queryset.QUERIES[name]
    out = {"name": name}
    t0 = time.time()
    df = fn(spark, sf_dir)
    out["build"] = round(time.time() - t0, 3)
    t0 = time.time()
    df._jdf.queryExecution().executedPlan()
    out["optimize"] = round(time.time() - t0, 3)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    out["exec1"] = round(time.time() - t0, 3)
    runs = []
    for _ in range(3):
        t0 = time.time()
        d2 = fn(spark, sf_dir)
        d2.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out["exec_min"] = min(runs)
    out["exec_runs"] = runs
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 15
        board = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
        names = [k for k, _ in sorted(board["queries"].items(),
                                      key=lambda kv: -kv[1])
                 if k in queryset.QUERIES][:n]
    else:
        names = args
    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm IO like bench.py does
    from cati_database_feeder_spark.catalog import TABLES
    for t in TABLES:
        spark.read.parquet(f"{sf_dir.rstrip('/')}/{t}.parquet").limit(1).collect()
    for name in names:
        r = profile(spark, sf_dir, name)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
