"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the full quality-filter + PII-scrub pipeline (read → extract →
quality → langid → keep/drop → gated scrub → docs/findings/lineage/metrics
sinks) over a deterministic synthetic web_pages corpus sized by SF, plus the
headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

CLI (used by BENCH/scaling.py):
  --pipeline-only     skip operator queries, print pipeline JSON only
  --cpus N            override SPARK_GRAFT_CPUS
  --docs N            override corpus size
  --runs N            timed pipeline runs (median reported; default 3)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# corpus on disk; run outputs on tmpfs — on a cluster the sink is
# distributed storage that scales with executors, so a single local disk's
# constant write cost must not pollute the N-vs-4N scaling measurement
CORPUS_CACHE = "/tmp/spark_graft_bench"
OUT_CACHE = "/dev/shm/spark_graft_bench"
# ≥ 4 partitions per core at 32 cores (BASELINE.md protocol): 250-row groups
ROW_GROUP = 250

HEADLINE_QUERIES = (
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
    "extract_file_texts",  # r5: consolidated pdf/office/csv/legacy entry
    "lang_fluency_planted",  # r5: langid + word-trigram perplexity union
    "nb_quality",          # r5: trained Naive-Bayes quality classifier
    "minhash_delta",   # r4: incremental dedup parity path
    "image_features",  # r4/r5: real PNG + GIF decode through the seam
    "wav_features",    # r4: real WAV (PCM) decode through the same seam
)


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(n_docs: int) -> str:
    os.makedirs(CORPUS_CACHE, exist_ok=True)
    path = os.path.join(CORPUS_CACHE, f"web_pages_{n_docs}_rg{ROW_GROUP}.parquet")
    if not os.path.exists(path):
        from pii_detector_spark.sources.datagen import write_web_pages

        write_web_pages(path, n_docs, seed=42, row_group_size=ROW_GROUP)
    return path


def build(cpus: int):
    from pii_detector_spark.session import build_session

    return build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            # one task per ~250-row row group so both parallelism levels
            # schedule the same ≥128-partition input
            "spark.sql.files.maxPartitionBytes": "393216",
            "spark.sql.files.openCostInBytes": "65536",
        },
    )


def bench_pipeline(spark, corpus: str, runs: int) -> dict:
    from pii_detector_spark.plans.pipeline import run_pipeline

    os.makedirs(OUT_CACHE, exist_ok=True)
    out_base = os.path.join(OUT_CACHE, f"out_{os.getpid()}")
    times = []
    n_docs = 0
    for i in range(runs + 1):  # run 0 = warmup (JIT/codegen)
        out = f"{out_base}_{i}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        res = run_pipeline(
            spark, corpus, out, run_id=f"bench-{i}", resume=False
        )
        dt = time.time() - t0
        n_docs = res.docs_written
        if i > 0:
            times.append(dt)
        shutil.rmtree(out, ignore_errors=True)
    med = statistics.median(times)
    return {
        "pipeline_sec": round(med, 3),
        "pipeline_docs": n_docs,
        "pipeline_docs_per_sec": round(n_docs / med, 1),
        "pipeline_runs_sec": [round(t, 3) for t in times],
    }


def bench_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE_QUERIES:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # codegen/JIT warmup
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_docs = args.docs or max(2_000, int(400_000 * sf))

    corpus = corpus_path(n_docs)
    spark = build(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    result = bench_pipeline(spark, corpus, args.runs)
    queries = {f"pipeline_{n_docs}_docs": result["pipeline_sec"]}
    if not args.pipeline_only:
        queries.update(bench_queries(spark, sf_dir))
    spark.stop()

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "n_docs": n_docs,
                "pipeline_docs_per_sec": result["pipeline_docs_per_sec"],
                "pipeline_runs_sec": result["pipeline_runs_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
