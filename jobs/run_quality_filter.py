"""spark-submit entry point for the quality-filter + PII-scrub pipeline.

Cluster:
    python scripts/make_pyfiles.py                    # → dist/pii_detector_spark.zip
    spark-submit --py-files dist/pii_detector_spark.zip \
        jobs/run_quality_filter.py \
        --input  s3://bucket/web_pages/ \
        --output s3://bucket/filtered/ \
        --run-id 2026-08-16

Local smoke:
    spark-submit --master 'local[8]' --py-files dist/pii_detector_spark.zip \
        jobs/run_quality_filter.py --input /tmp/web_pages.parquet --output /tmp/out

Re-running with the same --output resumes: urls already SCANNED at the
current pattern version are anti-joined away (checkpoint lineage table), so
a killed job picks up where it left off and a completed job is a no-op.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="web_pages parquet path")
    ap.add_argument("--output", required=True, help="output dir (docs/findings/lineage/metrics)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-html", action="store_true",
                    help="input has text only; skip HTML extraction")
    ap.add_argument("--gc-deleted", action="store_true",
                    help="after the run, MERGE-delete rows for urls no "
                         "longer present at the source (F7 GC)")
    ap.add_argument("--dedup-near", action="store_true",
                    help="after the run, keep-one near-dup pass over the "
                         "docs table -> additive neardup + docs_deduped "
                         "tables")
    ap.add_argument("--dedup-max-iter", type=int, default=50,
                    help="connected-components round budget for dedup "
                         "(needs >= longest near-dup chain + 1; the loop "
                         "raises rather than return split clusters)")
    ap.add_argument("--dedup-delta", action="store_true",
                    help="incremental near-dup: shingle/minhash only THIS "
                         "run's docs and band-join against the persisted "
                         "signatures table (new x all); same outputs as "
                         "--dedup-near, ~delta-sized work on reruns")
    args = ap.parse_args()

    # session comes from spark-submit conf; only engine-required settings here
    spark = (
        SparkSession.builder.appName("pii-quality-filter")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from pii_detector_spark.plans.pipeline import run_pipeline

    res = run_pipeline(
        spark,
        args.input,
        args.output,
        run_id=args.run_id,
        resume=not args.no_resume,
        extract_html=not args.no_html,
        gc_deleted=args.gc_deleted,
        dedup_near=args.dedup_near,
        dedup_delta=args.dedup_delta,
        dedup_max_iter=args.dedup_max_iter,
    )
    print(
        f"docs={res.docs_written} docs_path={res.docs_path} "
        f"findings={res.findings_path} lineage={res.lineage_path} "
        f"metrics={res.metrics_path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
