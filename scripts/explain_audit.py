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
  was a window); the band self-join exchanges ids+band hashes only (no
  signature arrays); signatures re-attached via two joins against the
  cached frame.  (The keepers/clustering path uses ring edges instead
  of the head self-join — linear volume; see SCALE.md 2b.)
- **dedup_fingerprint_histogram** — two HashAggregate levels on
  shrinking data (fingerprint -> count, count -> n), pure JVM.
- **events_asof_join** — single exchange on user_id, one sort, one
  window: the sort-merge-join cost shape with no join node at all.
- **emb_brute_force_topk** — `BroadcastNestedLoopJoin` with the query
  side broadcast (corpus side streams); window top-k after.
- **rel_top_unshipped** — customer dimension broadcast
  (`BroadcastHashJoin`), fact-side filters pushed into the parquet scan.
"""


def main() -> None:
    from sequali_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    queries = entry.queries()
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
