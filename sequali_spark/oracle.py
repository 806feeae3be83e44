"""Single-process pandas oracle — the golden-label reference implementation.

Plays the role sequali's scripts/fingerprinter.py plays for
DedupEstimator (an independent reimplementation used to cross-check the
engine, reference: scripts/fingerprinter.py): the Spark pipeline must
reproduce this oracle's labels exactly (F1 = 1.0) and its scrubbed text
byte-identically.  Per-doc metrics share code with the pipeline
(sequali_spark.functions.metrics); the corpus-level aggregates here are
*independent* plain-pandas reimplementations of the Spark groupBys in
sequali_spark.operators.aggregates, so aggregate parity is a real check.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from sequali_spark.functions.metrics import compute_metrics


def oracle_metrics(pages: pd.DataFrame) -> pd.DataFrame:
    """Golden per-document metric/label frame for a pages table."""
    return compute_metrics(pages[["url", "warc_ts", "html", "text", "lang"]])


def oracle_report(metrics: pd.DataFrame, overrep_min_count: int = 3) -> dict:
    """Corpus-level aggregate report (analogue of sequali's JSON report,
    reference: report_modules.py:2461-2477) computed with plain pandas —
    independently of the Spark operators it validates."""
    docs_seen = int(len(metrics))
    docs_kept = int(metrics["keep"].sum())
    docs_scrubbed = int(((metrics["pii_hits"] > 0) | (metrics["tox_hits"] > 0)).sum())

    rule_hits = Counter()
    for reasons in metrics["drop_reasons"]:
        rule_hits.update(reasons)

    lang_hist = metrics["lang_pred"].value_counts().to_dict()

    # duplication histogram: counter-of-counters over fingerprint counts
    # (analogue of DuplicationCounts, report_modules.py:1737-1756)
    fp_counts = metrics.groupby("fingerprint").size()
    dup_hist = fp_counts.value_counts().sort_index()
    total = int(fp_counts.sum())
    unique = int(len(fp_counts))

    # overrepresented shingles: sampled docs only, within-doc distinct
    # already applied by the kernel; global count + threshold
    shingle_counts = Counter()
    for sh in metrics["shingles"]:
        shingle_counts.update(sh)
    overrep = sorted(
        ((c, s) for s, c in shingle_counts.items() if c >= overrep_min_count),
        key=lambda t: (-t[0], t[1]),
    )

    return {
        "docs_seen": docs_seen,
        "docs_kept": docs_kept,
        "docs_scrubbed": docs_scrubbed,
        "rule_hits": dict(rule_hits),
        "lang_hist": {str(k): int(v) for k, v in lang_hist.items()},
        "duplication_hist": {int(k): int(v) for k, v in dup_hist.items()},
        "estimated_unique_fraction": (unique / total) if total else 1.0,
        "overrepresented": [
            {"shingle": s, "count": int(c)} for c, s in overrep[:100]
        ],
    }
