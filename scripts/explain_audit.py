#!/usr/bin/env python
"""Dump formatted physical plans of the headline queries to PLANS.md.

The per-plan audit the build discipline requires: after a query is
correct, its plan must be the plan you'd want at 100 TB.  This script
regenerates the evidence; the AUDIT notes at the top of PLANS.md are
maintained by hand.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AUDITED = [
    "pages_quality_labels",
    "doc_overrep_shingles",
    "dedup_minhash_pairs",
    "dedup_fingerprint_histogram",
    "events_asof_join",
    "emb_brute_force_topk",
    "rel_top_unshipped",
    "winnow_overlap_pairs",
    "doc_paragraph_dedup",
    "doc_gopher_line_stats",
    "doc_dup_line_chars",
    "doc_top_bigram_mass",
    "doc_dup_ngram_mass",
]

HEADER = """# PLANS — physical-plan audit of the headline queries

Regenerate with `python scripts/explain_audit.py` (sf0.01).
What to look for, per query:

- **pages_quality_labels** — exactly one `MapInPandas` (the whole metric
  battery), no shuffle before it; the only exchange is the explicit
  small-input repartition.
- **doc_overrep_shingles** — shingle explode stays inside one projection;
  `HashAggregate` partial/final pair around a single exchange on the
  shingle; `PushedFilters`/`ReadSchema` show only `text` leaves storage.
- **dedup_minhash_pairs** — one Python stage for signatures; exact-rep
  collapse is a map-side-combining `HashAggregate` on the digest (r4:
  was a window); the candidate stage is ONE exchange (r6): buckets are
  gathered by an `ObjectHashAggregate` collect_list on the band key and
  pairs expand inside whole-stage codegen (`Generate` over higher-order
  functions) — the former window-rank + anchor-broadcast + bucket
  self-join plan is gone; signatures re-attached via two broadcast
  joins against the pinned sketch.  At thresholds > 0.765 a pigeonhole
  band prefilter (r6) screens candidates on the 16-long band arrays
  before the 512B signature attach — bit-identical output, inactive at
  this query's t=0.7.  (The keepers/clustering path uses ring edges —
  linear volume; see SCALE.md 2b.)
- **dedup_fingerprint_histogram** — two HashAggregate levels on
  shrinking data (fingerprint -> count, count -> n), pure JVM.
- **events_asof_join** — single exchange on user_id, one sort, one
  window: the sort-merge-join cost shape with no join node at all.
- **emb_brute_force_topk** — `BroadcastNestedLoopJoin` with the query
  side broadcast (corpus side streams); window top-k after.
- **rel_top_unshipped** — customer dimension broadcast
  (`BroadcastHashJoin`), fact-side filters pushed into the parquet scan.
- **winnow_overlap_pairs** (operator, r7) — the stop-fingerprint skew
  guard is a map-side-combining `HashAggregate` on fp + a
  `BroadcastHashJoin` LeftAnti against the tiny over-cap key set; NO
  `Window` node anywhere (the r6 count-over-window materialized each
  fingerprint's full posting list on one task — the exact hot-key
  concentration the cap exists to prevent); the pair count is again a
  partial/final `HashAggregate` around one exchange on (doc_a, doc_b).
  The Python winnow scan executes ONCE per run: every consumer (hot
  count, anti-join probe, both self-join legs) hangs off one explicit
  repartition(fp) exchange that AQE's stage cache reuses — verified via
  the status API (exactly one stage with inputRecords > 0); the
  compile-time tree prints 4 MapInPandas nodes, runtime runs 1.
- **doc_paragraph_dedup** (r8) — split() appears ONLY in standalone
  `Project [... AS words]` nodes (one per DAG fork), never inlined
  beside slice() in the transform lambda or inside a Filter (the two
  measured optimizer traps, 18x: lambda-invariant re-evaluation and
  InferFiltersFromGenerate pushing the segmentation below the
  projection — hence the OUTER posexplode); the first-occurrence
  election is a partial/final `HashAggregate` pair on the paragraph
  text over min(decimal(38) key = doc_id*10^10 + pid) — trap 3:
  min(struct) compiles to a SortAggregate that sorts the paragraph
  corpus on both sides of the exchange, so NO SortAggregate, NO Sort
  feeding an aggregate, NO join back to the exploded frame and NO
  Window node; reconstruction is an `ObjectHashAggregate` over
  survivors keyed by doc_id, and the driver entry's trailing global
  Sort is absent from the bare operator (job consumers are
  order-insensitive; the sort would range-exchange the full
  reconstructed text).
- **doc_gopher_line_stats** (r8) — the whole Gopher structure battery
  is ONE codegen `Project` over the filtered scan (higher-order array
  filters, startswith/endswith/rlike inside the lambdas); the only
  exchange is the driver-contract orderBy.  Linear at any corpus size.
- **doc_dup_line_chars** (r8) — explode(lines) -> partial/final
  `HashAggregate` on (doc_id, line) -> partial/final `HashAggregate`
  on doc_id.  Both aggregates map-side combine; a doc whose lines all
  repeat still spreads across tasks by line hash before the per-doc
  rollup.  No Window, no UDF.
- **doc_top_bigram_mass** (r8) — bigrams built in the `Generate`'s
  transform+slice lambda (paragraph_dedup's windowing idiom), then the
  same two-level aggregate shape keyed (doc_id, gram) -> doc_id; the
  per-doc report is max(count*len) so no ordering or tie-break ever
  enters the plan.
- **doc_dup_ngram_mass** (r8) — the long-range repetition twin
  (duplicated 5-gram char mass): identical two-level aggregate shape;
  the c>1 conditional mass is a plain SUM(CASE) inside the final
  HashAggregate.
"""


def main() -> None:
    from sequali_spark.session import get_spark
    import __spark_entry__ as entry

    from sequali_spark.operators import dedup

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    queries = entry.queries()
    # operators audited directly (not a queries() entry)
    queries["winnow_overlap_pairs"] = dedup.winnow_overlap_pairs
    out = [HEADER]
    for name in AUDITED:
        df = queries[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    (REPO / "PLANS.md").write_text("".join(out))
    print(f"wrote {REPO / 'PLANS.md'}")
    spark.stop()


if __name__ == "__main__":
    main()
