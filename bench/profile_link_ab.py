"""A/B the fused link stage on a prebuilt mentions parquet.

    python bench/profile_link_ab.py --mentions /tmp/kgforge_scaling/c16/mentions \
        --cores 16 --variant bucket_prune

Variants: join (round-1 formulation), bucket, bucket_prune,
bucket_prune_r3 (rows_per_band=3), bucket_prune_mb32 (max_bucket=32).
Measures wall time of surfaces → link_surfaces-equivalent → edges
count (count() not write, so IO noise stays out of the A/B).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    "join": dict(pair_gen="join", prune=False),
    "bucket": dict(pair_gen="bucket", prune=False),
    "bucket_prune": dict(pair_gen="bucket", prune=True),
    "bucket_prune_r3": dict(pair_gen="bucket", prune=True, rows_per_band=3),
    "bucket_prune_mb32": dict(pair_gen="bucket", prune=True, max_bucket=32),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mentions", required=True)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--variant", default="bucket_prune")
    ap.add_argument("--threshold", type=float, default=0.78)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgforge.session import get_spark
    from kgforge.web.linking import candidate_pairs_minhash, score_set_cosine
    from kgforge.web.pipeline import surfaces_of

    v = dict(VARIANTS[args.variant])
    prune = v.pop("prune")
    spark = get_spark(
        app_name=f"link-ab-{args.variant}",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(args.cores * 2, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    mention_df = spark.read.parquet(args.mentions)

    t0 = time.perf_counter()
    surfaces = surfaces_of(mention_df)
    base = surfaces.select("surface").distinct()
    norm = base.withColumn("norm", F.lower(F.col("surface")))
    rep = norm.groupBy("norm").agg(F.min("surface").alias("rep"))
    with_rep = norm.join(rep, "norm")
    exact = (
        with_rep.filter(F.col("surface") != F.col("rep"))
        .select(
            F.least("surface", "rep").alias("a"),
            F.greatest("surface", "rep").alias("b"),
            F.lit(1.0).alias("score"),
        )
        .distinct()
    )
    reps = rep.select(F.col("rep").alias("surface"))
    pairs = candidate_pairs_minhash(
        reps,
        "surface",
        prune_threshold=args.threshold if prune else None,
        **v,
    )
    scored = score_set_cosine(pairs).filter(F.col("score") >= args.threshold)
    edges = exact.unionByName(scored.select("a", "b", "score"))
    n_edges = edges.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "variant": args.variant,
                "cores": args.cores,
                "wall_sec": round(wall, 2),
                "edges": n_edges,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
