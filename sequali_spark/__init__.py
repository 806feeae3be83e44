"""sequali_spark — a PySpark-native web-corpus quality pipeline.

A brand-new engine with the *capabilities* of rhpvorderman/sequali
(per-record QC, adapter/overrepresented-fragment detection, duplication
estimation) transplanted onto Common-Crawl-style web pages, per
BASELINE.json's north rule.  Architecture is Spark-first: one columnar
scan -> one Arrow-vectorized metric stage (mapInPandas) -> relational
aggregates (groupBy / window) for every corpus-level report.

Layout:
  functions/  vectorized per-document kernels (shared by the Spark
              pipeline and the single-process oracle -> exact parity)
  operators/  corpus-level aggregates, dedup family, similarity search
  sources/    table IO seam (parquet now, Iceberg behind the same API)
  plans/      plan-shape assertions (single Python stage, pushdown)
  streaming/  Structured Streaming variant of the metric stage
  runtime/    per-partition lineage/checkpoint + resume
"""

__version__ = "0.1.0"
