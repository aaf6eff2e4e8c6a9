"""Finer stage isolation for the CURRENT (post-collapse) dedup shapes.

Scratch harness for the round-7 continuation — not part of the
contract. Usage:
    SPARK_GRAFT_SF_DIR=/root/sf1.0 python bench_stages_r07c.py [stage...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn):
    spark.sparkContext.setJobDescription(name)
    t0 = time.perf_counter()
    _noop(fn())
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: {dt:.3f}", flush=True)
    return dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    which = set(sys.argv[1:])

    import __spark_entry__ as entry
    from kgforge.session import get_spark

    spark = get_spark(
        app_name="kgforge-stages-r07c",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 4),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )

    def want(name):
        return not which or any(name.startswith(w) for w in which)

    docs = entry._docs_with_clones(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def collapse(text_col="text"):
        hashed = docs.select(
            F.md5(F.col(text_col)).alias("th"),
            F.col("doc_id").alias("id"),
            F.col(text_col).alias("text"),
        )
        groups = hashed.groupBy("th").agg(
            F.min("id").alias("gid"),
            F.first("text").alias("text"),
            F.count(F.lit(1)).alias("gsize"),
        )
        mem = hashed.select("th", "id").join(
            groups.select("th", "gid"), "th"
        ).select("gid", "id")
        return groups, mem

    if want("ngram"):
        from kgforge.textops.dedup import _shingles_of_tokens

        shingle_k, threshold, max_df = 3, 0.8, 1000
        groups, mem = collapse()
        timed(spark, "ngram/groups", lambda: groups)
        timed(spark, "ngram/mem", lambda: mem)

        def ex():
            t = groups.select("gid", "gsize", "text").repartition(n_part).select(
                "gid", "gsize",
                F.split(F.trim(F.col("text")), "\\s+").alias("toks"),
            )
            return t.select(
                "gid", "gsize",
                F.explode(
                    F.array_distinct(_shingles_of_tokens(F.col("toks"), shingle_k))
                ).alias("s"),
            )

        timed(spark, "ngram/ex", ex)

        def exd():
            return ex().withColumn(
                "dft", F.sum("gsize").over(Window.partitionBy("s"))
            ).withColumn("is_common", F.col("dft") > max_df)

        timed(spark, "ngram/exd(census)", exd)

        def ranked():
            wo = Window.partitionBy("gid").orderBy("is_common", "dft", "s")
            wfull = wo.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            return (
                exd()
                .withColumn("n", F.count(F.lit(1)).over(wfull))
                .withColumn(
                    "n_rare", F.sum((~F.col("is_common")).cast("int")).over(wfull)
                )
                .withColumn("rk", F.row_number().over(wo))
            )

        timed(spark, "ngram/ranked", ranked)

        def prefix():
            c = F.greatest(
                F.lit(1), F.floor(F.lit(threshold) * F.col("n") - F.lit(1e-9))
            )
            return ranked().filter(
                (~F.col("is_common")) & (F.col("rk") <= F.col("n_rare") - c + 1)
            ).select("gid", "s", (F.col("n_rare") - F.col("rk")).alias("u"), "n")

        timed(spark, "ngram/prefix", prefix)

        def rsets():
            return ranked().groupBy("gid").agg(
                F.collect_list(F.when(~F.col("is_common"), F.col("s"))).alias("ss"),
                F.first("n").alias("n"),
                F.first("n_rare").alias("n_rare"),
            )

        timed(spark, "ngram/rsets", rsets)

        def cand():
            p = prefix()
            buckets = (
                p.groupBy("s")
                .agg(F.collect_list(F.struct("gid", "u", "n")).alias("es"))
                .filter(F.size("es") >= 2)
            ).repartition(n_part)
            es = F.array_sort(F.col("es"))
            pair_structs = F.flatten(
                F.transform(
                    es,
                    lambda x, i: F.transform(
                        F.slice(es, i + F.lit(2), F.size(es)),
                        lambda y: F.struct(
                            x["gid"].alias("a"), y["gid"].alias("b"),
                            x["u"].alias("ua"), y["u"].alias("ub"),
                            x["n"].alias("na"), y["n"].alias("nb"),
                        ),
                    ),
                )
            )
            t_f = float(threshold)
            cpair = (
                F.lit(t_f) / (1.0 + t_f) * (F.col("na") + F.col("nb"))
                - F.lit(1e-9)
            )
            pos_ok = (1 + F.least(F.col("ua"), F.col("ub"))) >= cpair
            occ = (
                buckets.select(F.explode(pair_structs).alias("p"))
                .select("p.*")
                .filter(pos_ok)
            )
            c2 = occ.groupBy("a", "b").agg(
                F.max("ua").alias("ua"), F.max("ub").alias("ub"),
                F.first("na").alias("na"), F.first("nb").alias("nb"),
            )
            return c2.filter(pos_ok).select("a", "b", "na", "nb")

        timed(spark, "ngram/cand", cand)
        timed(spark, "ngram/full", lambda: entry.q_dedup_ngram_jaccard(spark, sf_dir))

    if want("simhash"):
        from kgforge.textops.dedup import simhash

        groups, mem = collapse()
        timed(
            spark,
            "simhash/gsig",
            lambda: simhash(
                groups.select(F.col("gid").alias("doc_id"), "text"),
                "doc_id", "text",
            ),
        )
        timed(spark, "simhash/full", lambda: entry.q_dedup_simhash(spark, sf_dir))

    if want("minhash"):
        from kgforge.textops.dedup import minhash_signatures_agg

        groups, mem = collapse()
        timed(
            spark,
            "minhash/gsig",
            lambda: minhash_signatures_agg(
                groups.select(F.col("gid").alias("doc_id"), "text"),
                "doc_id", "text", 8,
            ),
        )
        timed(spark, "minhash/full", lambda: entry.q_dedup_minhash(spark, sf_dir))

    if want("emb"):
        from kgforge.contract import load
        from kgforge.textops.similarity import _as_double, buckets_udf, hyperplanes

        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        clone = emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
        both = emb.unionByName(clone)
        base = both.select(
            F.col("vec_id").alias("id"), _as_double(F.col("embedding")).alias("v")
        )
        hashed = base.select(F.md5(F.col("v").cast("string")).alias("th"), "id", "v")
        groups = hashed.groupBy("th").agg(
            F.min("id").alias("gid"),
            F.first("v").alias("v"),
            F.count(F.lit(1)).alias("gsize"),
        )
        timed(spark, "emb/groups", lambda: groups)
        dim = 64
        udf = buckets_udf([hyperplanes(dim, 10, 42 + 1000 * t) for t in range(3)])
        banded = groups.select(
            "gid", "gsize", F.posexplode(udf(F.col("v"))).alias("tbl", "bucket")
        )
        timed(spark, "emb/banded", lambda: banded)

        def cand():
            from kgforge.textops.dedup import _in_array_pairs

            tagged = banded.withColumn(
                "sz", F.sum("gsize").over(Window.partitionBy("tbl", "bucket"))
            ).filter(F.col("sz") >= 2)
            small = (
                tagged.filter(F.col("sz") <= 1024)
                .groupBy("tbl", "bucket")
                .agg(F.collect_list("gid").alias("ids"))
            )
            return _in_array_pairs(small).distinct()

        timed(spark, "emb/cand", cand)

        def verify():
            from kgforge.textops.similarity import cosine_expr

            c = cand()
            va = groups.select(F.col("gid").alias("a"), F.col("v").alias("va"))
            vb = groups.select(F.col("gid").alias("b"), F.col("v").alias("vb"))
            return (
                c.join(va, "a")
                .join(vb, "b")
                .select(
                    "a", "b",
                    F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("score"),
                )
                .filter(F.col("score") >= 0.999)
            )

        timed(spark, "emb/verify", verify)
        timed(spark, "emb/full", lambda: entry.q_emb_near_dups(spark, sf_dir))


if __name__ == "__main__":
    main()
