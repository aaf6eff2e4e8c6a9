"""Stage-isolated measurements for the round-7 optimization pass
(guide §1.4: noop-sink isolation; §1.5: labelled jobs).

NOT part of the driver contract — bench.py stays the frozen
measurement. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]

Each stage prints `<name>: <sec>`; no args runs everything.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, sink="noop"):
    spark.sparkContext.setJobDescription(name)
    t0 = time.perf_counter()
    df = fn()
    if sink == "noop":
        _noop(df)
    else:
        df.count()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: {dt:.3f}", flush=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    which = set(sys.argv[1:])

    import __spark_entry__ as entry
    from kgforge.session import get_spark

    spark = get_spark(
        app_name="kgforge-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 4),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )

    def want(name: str) -> bool:
        return not which or any(name.startswith(w) for w in which)

    docs = entry._docs_with_clones(spark, sf_dir)

    # ---- corpus shape --------------------------------------------------
    if want("shape"):
        from kgforge.textops.dedup import word_shingles

        n = docs.count()
        stats = docs.select(
            F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("toks")
        ).agg(F.count("*"), F.avg("toks"), F.max("toks")).first()
        print(f"shape: docs={n} avg_toks={stats[1]:.1f} max_toks={stats[2]}")
        sh = docs.select(
            F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("s")
        )
        dfreq = sh.groupBy("s").count()
        agg = dfreq.agg(
            F.count("*").alias("distinct_shingles"),
            F.sum("count").alias("rows"),
            F.sum(
                F.when(F.col("count") <= 1000, F.col("count") * (F.col("count") - 1) / 2)
            ).alias("pairs_rare"),
            F.max("count").alias("max_df"),
        ).first()
        print(
            f"shape3: distinct={agg[0]} rows={agg[1]} pairs_rare={agg[2]:.3e} max_df={agg[3]}"
        )

    # ---- ngram jaccard stages ------------------------------------------
    if want("ngram"):
        from kgforge.textops.dedup import word_shingles

        def ex():
            return docs.select(
                F.col("doc_id").alias("id"),
                F.explode(
                    F.array_distinct(word_shingles(F.col("text"), 3))
                ).alias("s"),
            )

        timed(spark, "ngram/explode", ex)
        timed(spark, "ngram/sizes", lambda: ex().groupBy("id").agg(F.count(F.lit(1)).alias("n")))
        timed(
            spark,
            "ngram/buckets",
            lambda: ex()
            .groupBy("s")
            .agg(F.collect_list("id").alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000)),
        )

        def inter():
            from kgforge.textops.dedup import _in_array_pairs

            buckets = (
                ex()
                .groupBy("s")
                .agg(F.collect_list("id").alias("ids"))
                .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000))
            )
            return _in_array_pairs(buckets).groupBy("a", "b").agg(
                F.count(F.lit(1)).alias("inter")
            )

        timed(spark, "ngram/inter", inter)
        timed(spark, "ngram/full", lambda: entry.q_dedup_ngram_jaccard(spark, sf_dir))

    # ---- minhash stages ------------------------------------------------
    if want("minhash"):
        from kgforge.textops.dedup import minhash_signatures_agg

        timed(spark, "minhash/sig", lambda: minhash_signatures_agg(docs))

        def banded():
            sig = minhash_signatures_agg(docs)
            rows = 2
            return sig.select(
                "id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.concat_ws(
                                    "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                                ).alias("key"),
                            )
                            for b in range(4)
                        ]
                    )
                ).alias("bk"),
            ).select("id", "bk.band", "bk.key")

        timed(spark, "minhash/banded", banded)

        def census():
            from pyspark.sql import Window

            return banded().withColumn(
                "sz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
            ).filter(F.col("sz") >= 2)

        timed(spark, "minhash/census", census)
        timed(spark, "minhash/full", lambda: entry.q_dedup_minhash(spark, sf_dir))

    # ---- simhash stages ------------------------------------------------
    if want("simhash"):
        from kgforge.textops.dedup import simhash

        def toks():
            return docs.select(
                F.col("doc_id").alias("id"),
                F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("tok"),
            ).filter(F.col("tok") != "")

        timed(spark, "simhash/toks", toks)

        def hashed():
            h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
            return toks().select("id", h.alias("h"))

        timed(spark, "simhash/hashed", hashed)
        timed(spark, "simhash/sig", lambda: simhash(docs))
        timed(spark, "simhash/full", lambda: entry.q_dedup_simhash(spark, sf_dir))

    # ---- emb near dups stages ------------------------------------------
    if want("emb"):
        from kgforge.contract import load
        from kgforge.textops.similarity import (
            _as_double,
            buckets_udf,
            hyperplanes,
        )

        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        clone = emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
        both = emb.unionByName(clone)

        def banded_emb():
            first = both.select(F.col("embedding")).first()
            dim = len(first[0])
            ids = both.select(
                F.col("vec_id").alias("id"), _as_double(F.col("embedding")).alias("v")
            )
            udf = buckets_udf([hyperplanes(dim, 10, 42 + 1000 * t) for t in range(3)])
            return ids.select("id", F.posexplode(udf(F.col("v"))).alias("tbl", "bucket"))

        timed(spark, "emb/banded", banded_emb)
        timed(spark, "emb/full", lambda: entry.q_emb_near_dups(spark, sf_dir))

    # ---- others (full only, noop) --------------------------------------
    for name in (
        "kg_typed_literals",
        "kg_link_direction",
        "kg_melt_part",
        "web_kg_pipeline",
    ):
        if want(name):
            fn = entry.queries()[name.replace("q_", "")]
            timed(spark, f"{name}/full", lambda fn=fn: fn(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
