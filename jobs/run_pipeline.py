#!/usr/bin/env python
"""spark-submit entry point for the quality pipeline.

Cluster deployment (north rule):

    scripts/package.sh   # builds dist/sequali_spark.zip
    spark-submit \\
      --py-files dist/sequali_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.files.maxPartitionBytes=16m \\
      jobs/run_pipeline.py \\
      --input  <pages parquet dir or iceberg table ref> \\
      --output <labels dir/ref> --lineage <lineage dir> \\
      --mode resumable

Modes:
  batch      one-shot: labels + corpus report, no checkpointing
  resumable  per-warc_ts-day units with lineage (kill-safe, idempotent)
  stream     continuous: treat --input as a parquet drop directory
  report     re-render the JSON report from a SAVED labels table, no
             recompute (the reference's `sequali-report saved.json`
             path, K4): --input is a labels parquet dir, --report the
             destination; aggregates soft-degrade to whatever metric
             columns the table carries

Everything model-side (langid weights, LM counts, scrub patterns) is
derived deterministically at import or shipped inside the zip — no
network access on executors.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--mode", choices=["batch", "resumable", "stream", "report"], default="batch"
    )
    ap.add_argument("--report", default=None, help="write the corpus JSON report here")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from sequali_spark.session import get_spark

    spark = get_spark(app_name=f"sequali_pipeline_{args.mode}")

    if args.mode == "stream":
        from sequali_spark.streaming.stream import run_stream_once

        run_stream_once(
            spark, args.input, args.output, args.checkpoint or args.output + "_ckpt"
        )
        return

    if args.mode == "report":
        if not args.report:
            raise SystemExit("--mode report requires --report <dest.json>")
        from sequali_spark.operators import aggregates as agg

        labels = spark.read.parquet(args.input)
        cols = set(labels.columns)
        counter_aggs = [F.count("*").alias("docs_seen")]
        if "keep" in cols:
            counter_aggs.append(F.sum(F.col("keep").cast("long")).alias("docs_kept"))
        report: dict = {"counters": labels.agg(*counter_aggs).first().asDict()}
        if "drop_reasons" in cols:
            report["rule_hits"] = {
                r["rule"]: r["hits"] for r in agg.rule_hit_counts(labels).collect()
            }
        if "lang_pred" in cols:
            report["lang_hist"] = {
                r["lang"]: r["docs"] for r in agg.lang_histogram(labels).collect()
            }
        if "fingerprint" in cols:
            report["duplication"] = [
                r.asDict() for r in agg.duplication_histogram(labels).collect()
            ]
        with open(args.report, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
        print(json.dumps({"re_rendered": True, "blocks": sorted(report)}))
        return

    from sequali_spark.pipeline import quality_pipeline, read_pages

    pages = read_pages(spark, args.input)

    if args.mode == "resumable":
        from sequali_spark.runtime.lineage import lineage_report, run_resumable

        done = run_resumable(
            spark, pages, args.output, args.lineage or args.output + "_lineage"
        )
        print(json.dumps({"processed_units": done}))
        lineage_report(spark, args.lineage or args.output + "_lineage").show()
        return

    metrics = quality_pipeline(spark, pages, num_partitions=args.partitions).persist()
    metrics.write.mode("overwrite").parquet(args.output)

    if args.report:
        from sequali_spark.operators import aggregates as agg

        report = {
            "counters": metrics.agg(
                F.count("*").alias("docs_seen"),
                F.sum(F.col("keep").cast("long")).alias("docs_kept"),
            ).first().asDict(),
            "rule_hits": {r["rule"]: r["hits"] for r in agg.rule_hit_counts(metrics).collect()},
            "lang_hist": {r["lang"]: r["docs"] for r in agg.lang_histogram(metrics).collect()},
            "duplication": [r.asDict() for r in agg.duplication_histogram(metrics).collect()],
            "overrepresented": [
                r.asDict() for r in agg.overrepresented_shingles(metrics).collect()
            ],
            # length statistics block — the reference report's
            # SequenceLengthDistribution analogue (exact N50/N90 by
            # cumulative walk, report_modules.py:574-636)
            "length_stats": agg.n50_analogue(metrics).first().asDict(),
            "per_host": [
                r.asDict() for r in agg.per_host_report(metrics).limit(20).collect()
            ],
        }
        with open(args.report, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
    metrics.unpersist()


if __name__ == "__main__":
    main()
