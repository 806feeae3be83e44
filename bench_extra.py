#!/usr/bin/env python
"""Extra (non-frozen) benchmarks: noop-sink isolation of sub-stages per
guide §1.4, used to attribute headline query time to operators during
optimization rounds.  The frozen measurement contract lives in bench.py;
this file only informs optimization decisions (numbers cited in
OPTIMIZATION_r09.md).

Usage:
  python bench_extra.py --mode minhash [--sf-dir /root/testdata/sf1.0]
  python bench_extra.py --mode queries --names doc_char_ratios,...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _timed(label: str, df, spark, n: int = 3) -> dict:
    spark.sparkContext.setJobDescription(label)
    samples = [_noop(df) for _ in range(n)]
    spark.sparkContext.setJobDescription(None)
    return {"label": label, "best": min(samples), "samples": samples}


def mode_minhash(spark, sf_dir: str) -> None:
    """Attribute dedup_minhash_pairs time to its sub-stages."""
    from pyspark.sql import functions as F

    from sequali_spark.operators import dedup
    from sequali_spark.operators.textqc import load

    docs = load(spark, sf_dir, "documents")

    # stage A: sketch (Arrow minhash kernel) alone, no collapse
    sigs_raw = dedup.minhash_signatures(docs)
    print(json.dumps(_timed("A sketch only", sigs_raw, spark)))

    # stage B: sketch + exact collapse (the groupBy(first) SortAggregate)
    sigs = dedup.collapse_exact_reps(sigs_raw)
    print(json.dumps(_timed("B sketch+collapse", sigs, spark)))

    # full query (uses the pin; replicates the headline entry)
    full = dedup.minhash_near_dup_pairs(spark, sf_dir)
    print(json.dumps(_timed("C full warm1", full, spark, n=1)))
    # now pinned: sub-stages downstream of the pin
    pinned = dedup._CACHED.get("minhash")
    if pinned is not None:
        print(json.dumps(_timed("D pinned scan", pinned, spark)))
        bands = pinned.select("doc_id", F.posexplode("bands").alias("band_idx", "band_hash"))
        print(json.dumps(_timed("E bands explode", bands, spark)))
        buckets = (
            bands.groupBy("band_idx", "band_hash")
            .agg(
                F.collect_list(
                    F.struct(
                        F.xxhash64(F.col("doc_id"), F.col("band_hash")).alias("h"),
                        F.col("doc_id").alias("id"),
                    )
                ).alias("members")
            )
            .filter(F.size("members") >= 2)
        )
        print(json.dumps(_timed("F buckets agg", buckets, spark)))
        b = buckets.select(F.expr("transform(array_sort(members), s -> s.id)").alias("ids"))
        head = "slice(ids, 1, 256)"
        pairs_head = (
            f"flatten(transform({head}, (x, i) -> "
            f"transform(slice({head}, i + 2, size({head})), y -> "
            f"struct(least(x, y) as doc_a, greatest(x, y) as doc_b))))"
        )
        star = (
            "transform(slice(ids, 257, greatest(size(ids) - 256, 0)), "
            "x -> struct(least(ids[0], x) as doc_a, greatest(ids[0], x) as doc_b))"
        )
        cand = b.select(
            F.explode(F.expr(f"concat({pairs_head}, {star})")).alias("p")
        ).select("p.doc_a", "p.doc_b")
        print(json.dumps(_timed("G cand expand", cand, spark)))
        cand_d = cand.distinct()
        print(json.dumps(_timed("H cand distinct", cand_d, spark)))
        n_cand = cand_d.count()
        print(json.dumps({"label": "n_candidates", "value": n_cand}))
        verified = dedup._verify_candidates(cand, pinned, "doc_id", 0.7)
        print(json.dumps(_timed("I verify+sort", verified, spark)))
        n_pairs = verified.count()
        print(json.dumps({"label": "n_pairs", "value": n_pairs}))
    print(json.dumps(_timed("J full warm", full, spark)))


def mode_queries(spark, sf_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        _noop(df)  # warmup (codegen)
        print(json.dumps(_timed(name, df, spark)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="queries")
    ap.add_argument("--names", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    )
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import _spark

    spark = _spark(args.cpus)
    if args.mode == "minhash":
        mode_minhash(spark, args.sf_dir)
    else:
        names = [n for n in args.names.split(",") if n]
        mode_queries(spark, args.sf_dir, names)
    spark.stop()


if __name__ == "__main__":
    main()
