"""One timed end-to-end web-KG pipeline run at a given core count.

Launched via spark-submit (cluster-shaped packaging):

    spark-submit --py-files dist/kgforge.zip bench/scaling_run.py \
        --cores 8 --pages 120000 --pages-path /tmp/web_pages.parquet \
        --out /tmp/run8.json

Corpus generation happens OUTSIDE the timed window (pages parquet is
prebuilt by bench/scaling.py). Timed: extract → mentions (+dedup) →
link → CC → rewrite → bucketed materialize, each stage materialized so
the totals are honest (no lazy-stage double counting).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, required=True)
    ap.add_argument("--pages-path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", default="/tmp/kgforge_scaling")
    ap.add_argument("--eventlog-dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgforge.lineage import materialize_triples
    from kgforge.session import get_spark
    from kgforge.web.canon import canonical_map, rewrite_triples
    from kgforge.web.extract import extract_text
    from kgforge.web.linking import link_surfaces
    from kgforge.web.mentions import extract_mention_triples
    from kgforge.web.pipeline import surfaces_of

    # IDENTICAL configs at both parallelism levels (the protocol's
    # "same job, same input, only cluster size differs"):
    #   * shuffle_partitions fixed at 32 (not cores-derived)
    #   * split size derived from the INPUT SIZE, not the core count:
    #     target ~256 scan tasks. Round 1 used fixed 1MB splits, which
    #     at 10M pages meant ~2500 scan tasks and ~2500 output files —
    #     the output-committer's serial driver-side rename of those
    #     files was a measured ~10-25s Amdahl floor per write-heavy
    #     stage. On a real 100TB table the 128MB default is right.
    input_bytes = sum(
        os.path.getsize(os.path.join(args.pages_path, f))
        for f in os.listdir(args.pages_path)
        if f.endswith(".parquet")
    )
    split = min(max(input_bytes // 256, 4 << 20), 128 << 20)
    spark = get_spark(
        app_name=f"kgforge-scaling-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": "65536",
            # per-task CPU evidence for the ladder (uncompressed so the
            # analyzers can stream it)
            **(
                {
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.dir": "file://" + args.eventlog_dir,
                }
                if args.eventlog_dir
                else {}
            ),
        },
    )

    work = f"{args.workdir}/c{args.cores}"
    shutil.rmtree(work, ignore_errors=True)

    stages: dict[str, float] = {}

    def cpu_busy() -> tuple[int, int]:
        parts = open("/proc/stat").readline().split()
        vals = list(map(int, parts[1:]))
        idle = vals[3] + vals[4]
        return sum(vals) - idle, sum(vals)

    busy0, tot0 = cpu_busy()
    t_total = time.perf_counter()

    # 1. extract (html → text), html pruned immediately after
    t0 = time.perf_counter()
    pages = spark.read.parquet(args.pages_path)
    extracted = extract_text(pages, "html", "text_extracted").select(
        "url", "warc_ts", F.col("text_extracted").alias("text"), "lang"
    )
    extracted.write.mode("overwrite").parquet(f"{work}/pages_text")
    stages["extract"] = time.perf_counter() - t0

    # 2. mention triples (+global dedup)
    t0 = time.perf_counter()
    pages_txt = spark.read.parquet(f"{work}/pages_text")
    mentions = extract_mention_triples(pages_txt, text_col="text")
    mentions.write.mode("overwrite").parquet(f"{work}/mentions")
    stages["mentions"] = time.perf_counter() - t0

    # 3. linking on distinct surfaces (persisted: consumed by the two
    # edge-endpoint joins here AND the canon stage's node list — the
    # distinct over the mention table would otherwise run 3×)
    t0 = time.perf_counter()
    mention_df = spark.read.parquet(f"{work}/mentions")
    surfaces = surfaces_of(mention_df).persist()
    edges = link_surfaces(surfaces.select("surface"))
    s1 = surfaces.select(F.col("surface").alias("a"), F.col("iri").alias("iri_a"))
    s2 = surfaces.select(F.col("surface").alias("b"), F.col("iri").alias("iri_b"))
    iri_edges = edges.join(s1, "a").join(s2, "b").select(
        F.col("iri_a").alias("a"), F.col("iri_b").alias("b")
    )
    iri_edges.write.mode("overwrite").parquet(f"{work}/edges")
    stages["link"] = time.perf_counter() - t0

    # 4. connected components + canonical map
    t0 = time.perf_counter()
    cmap = canonical_map(
        spark.read.parquet(f"{work}/edges"),
        surfaces.select(F.col("iri").alias("node")),
    )
    cmap.write.mode("overwrite").parquet(f"{work}/cmap")
    stages["canonicalize"] = time.perf_counter() - t0

    # 5. rewrite + bucketed materialize with lineage
    t0 = time.perf_counter()
    canonical = rewrite_triples(mention_df, spark.read.parquet(f"{work}/cmap"))
    metrics = materialize_triples(canonical, f"{work}/triples", n_buckets=64)
    stages["materialize"] = time.perf_counter() - t0

    wall = time.perf_counter() - t_total
    busy1, tot1 = cpu_busy()
    # whole-machine busy fraction during the run: >> cores/32 means a
    # neighbor tenant was competing for CPU mid-run (shared host)
    machine_busy_cores = round(32 * (busy1 - busy0) / max(tot1 - tot0, 1), 1)
    n_pages = pages.count()
    n_mentions = mention_df.count()
    n_triples = spark.read.parquet(f"{work}/triples").count()

    result = {
        "cores": args.cores,
        "pages": n_pages,
        "mention_triples": n_mentions,
        "canonical_triples": n_triples,
        "wall_sec": round(wall, 2),
        "pages_per_sec": round(n_pages / wall, 1),
        "triples_per_sec": round(n_mentions / wall, 1),
        "stages_sec": {k: round(v, 2) for k, v in stages.items()},
        "machine_busy_cores": machine_busy_cores,
        "materialize_metrics": metrics,
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
