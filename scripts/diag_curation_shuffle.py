#!/usr/bin/env python
"""Diagnose per-stage shuffle volume of the curation decision pipeline.

Runs jobs/run_curation.py's curate() over an existing atscale docs dir
with the Spark event log enabled, then parses the log for every stage's
shuffle write/read bytes and prints the top stages with their callsites.
Usage: python scripts/diag_curation_shuffle.py --rows 1000000
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    import shutil

    evdir = f"/tmp/diag_evlog_{args.rows}"
    if args.parse_only:
        _parse(evdir, args.rows, 0.0)
        return
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from sequali_spark.session import get_spark

    spark = get_spark(
        app_name="diag_curation",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    docs_dir = f"/tmp/sequali_atscale_docs_{args.rows}"
    if not os.path.exists(os.path.join(docs_dir, "documents.parquet", "_SUCCESS")):
        from bench import ensure_pages_parquet
        from scripts.atscale import _docs_from_pages

        src = ensure_pages_parquet(args.rows)
        _docs_from_pages(spark, src).write.mode("overwrite").parquet(
            os.path.join(docs_dir, "documents.parquet")
        )

    from jobs.run_curation import curate

    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    import time

    t0 = time.time()
    curate(spark, sf_dir="", docs=docs).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    spark.stop()
    _parse(evdir, args.rows, wall)


def _read_lines(fname: str):
    with open(fname, "rb") as fh:
        magic = fh.read(4)
    if magic == b"\x28\xb5\x2f\xfd" or fname.endswith(".zstd"):
        import pyarrow as pa

        # Spark streams the log through zstd; decode it as a stream too
        with pa.input_stream(fname, compression="zstd") as st:
            raw = st.read()
    else:
        raw = open(fname, "rb").read()
    return raw.decode("utf-8", errors="replace").splitlines()


def _parse(evdir: str, rows: int, wall: float) -> None:
    stages = {}
    logfiles = []
    for root, _dirs, files in os.walk(evdir):
        logfiles += [os.path.join(root, f) for f in files if "appstatus" not in f]
    for fname in logfiles:
        for line in _read_lines(fname):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            acc = {a["Name"]: a.get("Value", 0) for a in si.get("Accumulables", [])}
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", "")[:70],
                "details": si.get("Details", "").split("\n")[0][:120],
                "tasks": si.get("Number of Tasks"),
                "sh_write_mb": round(
                    int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0))
                    / 1e6, 1),
                "sh_read_mb": round(
                    int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0))
                    / 1e6
                    + int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0))
                    / 1e6, 1),
                "spill_disk_mb": round(
                    int(acc.get("internal.metrics.diskBytesSpilled", 0)) / 1e6, 1),
                "out_rows": int(
                    acc.get("internal.metrics.shuffle.write.recordsWritten", 0)),
            }
    total_w = sum(s["sh_write_mb"] for s in stages.values())
    print(json.dumps({"rows": rows, "wall_sec": round(wall, 1),
                      "n_stages": len(stages),
                      "total_shuffle_write_mb": round(total_w, 1)}))
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["sh_write_mb"])[:12]:
        print(f"stage {sid:4d} w={s['sh_write_mb']:>9.1f}MB r={s['sh_read_mb']:>9.1f}MB "
              f"spill={s['spill_disk_mb']:>8.1f}MB rows={s['out_rows']:>12d} "
              f"tasks={s['tasks']:>4} {s['name']}")


if __name__ == "__main__":
    main()
