"""Round-6 measurement harness (guide §1): per-query noop-sink timing plus
``explain("formatted")`` capture, WITHOUT touching the frozen bench.py.

Usage:
  python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--plans-dir plans/r06]
                        [--suffix before|after] [--repeats N] [--no-plans]

Prints one JSON line per query: {"query": name, "warm": s, "times": [...]}
and a final summary line. Plans are written to <plans-dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = (
    "pricing_summary",
    "exact_dedup",
    "minhash_lsh",
    "simhash",
    "token_counts",
    "quality_keep",
    "scrub_documents",
    "pii_scrub_person",
    "ann_lsh",
    "embedding_neardup",
    "media_features",
    "frame_sampling",
    "repetition_metrics",
    "dedup_clusters",
    "extract_file_texts",
    "lang_fluency_planted",
    "nb_quality",
    "minhash_delta",
    "image_features",
    "wav_features",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None)
    ap.add_argument("--plans-dir", default="plans/r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else list(DEFAULT_QUERIES)
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench as benchmod
    import __spark_entry__ as entrymod

    spark = benchmod.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(args.plans_dir, exist_ok=True)

    totals = {}
    for name in names:
        df = qs[name](spark, args.sf_dir)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        times = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        totals[name] = min(times)
        print(json.dumps(
            {"query": name, "warm": round(warm, 3), "times": times}
        ), flush=True)
    print(json.dumps(
        {"sf_dir": args.sf_dir, "total_min": round(sum(totals.values()), 3),
         "queries_min": totals}
    ), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
