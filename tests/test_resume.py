"""Resumable materialization: idempotence, partition-level resume,
torn-bucket repair, lineage audit (BASELINE.md §2 resumability gate)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import pytest

from kgforge.io.catalog import ParquetLedgerSink
from kgforge.lineage import (
    completed_buckets,
    materialize_triples,
    read_lineage,
    verify_lineage,
)


@pytest.fixture(params=["parquet", "sink"])
def catalog_of(request, spark):
    """Parametrizes every resume test over the sink protocol: the
    catalog= string flag AND an injected TripleSink instance must
    behave identically."""

    def make(path, n_buckets=8):
        if request.param == "sink":
            return ParquetLedgerSink(spark, path, n_buckets)
        return "parquet"

    return make


def _triples(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("urn:s"), (F.col("id") % 97).cast("string")).alias("subj"),
        F.lit("urn:p").alias("pred"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("obj"),
        F.lit(None).cast("string").alias("obj_dt"),
    )


def test_materialize_and_audit(spark, tmp_path, catalog_of):
    path = str(tmp_path / "t1")
    m = materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    assert m["buckets_written"] == 8 and m["rows_written"] == 500
    assert verify_lineage(spark, path)
    assert spark.read.parquet(path).count() == 500


def test_resume_is_noop_when_complete(spark, tmp_path, catalog_of):
    path = str(tmp_path / "t2")
    materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    m2 = materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    assert m2["buckets_written"] == 0 and m2["buckets_skipped"] == 8
    assert spark.read.parquet(path).count() == 500
    assert verify_lineage(spark, path)


def test_resume_repairs_torn_bucket(spark, tmp_path, catalog_of):
    path = str(tmp_path / "t3")
    materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    full = spark.read.parquet(path).count()

    # simulate a crash: bucket 3 written but its lineage row lost —
    # rewrite the ledger without bucket 3 (torn state)
    lin = read_lineage(spark, path).filter(F.col("bucket") != 3).collect()
    shutil.rmtree(os.path.join(path, "_lineage"))
    spark.createDataFrame(
        lin,
        "stage string, bucket int, row_count long, checksum long, run_id string",
    ).write.parquet(os.path.join(path, "_lineage"))

    m = materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    assert m["buckets_repaired"] == [3]
    assert m["buckets_written"] == 1 and m["buckets_skipped"] == 7
    assert spark.read.parquet(path).count() == full  # no dupes, no loss
    assert verify_lineage(spark, path)
    assert completed_buckets(spark, path, "materialize") == set(range(8))


def test_missing_buckets_resume(spark, tmp_path, catalog_of):
    """Kill both files and ledger rows for two buckets → resume rewrites
    exactly those."""
    path = str(tmp_path / "t4")
    materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    full = spark.read.parquet(path).count()
    for b in (1, 5):
        shutil.rmtree(os.path.join(path, f"subj_bucket={b}"))
    lin = read_lineage(spark, path).filter(~F.col("bucket").isin(1, 5)).collect()
    shutil.rmtree(os.path.join(path, "_lineage"))
    spark.createDataFrame(
        lin,
        "stage string, bucket int, row_count long, checksum long, run_id string",
    ).write.parquet(os.path.join(path, "_lineage"))

    m = materialize_triples(_triples(spark), path, n_buckets=8, catalog=catalog_of(path))
    assert m["buckets_written"] == 2 and m["buckets_skipped"] == 6
    assert spark.read.parquet(path).count() == full
    assert verify_lineage(spark, path)


def test_iceberg_sink_error_path(spark, tmp_path):
    """Without the Iceberg runtime jar the iceberg catalog must refuse
    cleanly BEFORE touching storage, with an actionable message."""
    import os

    target = str(tmp_path / "ice")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        materialize_triples(_triples(spark), target, catalog="iceberg")
    assert not os.path.exists(target)  # refused before any write

    with pytest.raises(ValueError, match="unknown catalog"):
        materialize_triples(_triples(spark), str(tmp_path / "bogus"), catalog="nope")


def test_salted_write_same_table_more_hub_files(spark, tmp_path):
    """Head-entity skew: with a mega-hub subject holding ~40% of rows,
    salt_partitions must split the hot bucket across several write
    tasks (≥2 files in its dir) while producing the IDENTICAL table
    and a passing audit."""
    from pyspark.sql import functions as F2

    hub = spark.range(2000).select(
        F2.lit("urn:hub").alias("subj"),
        F2.lit("urn:partner_of").alias("pred"),
        F2.concat(F2.lit("urn:o"), F2.col("id").cast("string")).alias("obj"),
        F2.lit(None).cast("string").alias("obj_dt"),
        F2.concat(F2.lit("https://ex/p"), F2.col("id").cast("string")).alias("prov_url"),
    )
    tail = spark.range(3000).select(
        F2.concat(F2.lit("urn:s"), (F2.col("id") % 500).cast("string")).alias("subj"),
        F2.lit("urn:p").alias("pred"),
        F2.concat(F2.lit("urn:v"), F2.col("id").cast("string")).alias("obj"),
        F2.lit(None).cast("string").alias("obj_dt"),
        F2.concat(F2.lit("https://ex/q"), F2.col("id").cast("string")).alias("prov_url"),
    )
    triples = hub.unionByName(tail)

    plain, salted = str(tmp_path / "plain"), str(tmp_path / "salted")
    # high max_records_per_file so file count reflects TASKS, not size
    materialize_triples(triples, plain, n_buckets=16, max_records_per_file=10**7)
    m = materialize_triples(
        triples, salted, n_buckets=16, max_records_per_file=10**7, salt_partitions=8
    )
    assert m["rows_written"] == 5000
    assert verify_lineage(spark, salted)

    a = {tuple(r) for r in spark.read.parquet(plain).drop("subj_bucket").collect()}
    b = {tuple(r) for r in spark.read.parquet(salted).drop("subj_bucket").collect()}
    assert a == b  # identical table either way

    # locate the hub's bucket dir and compare file counts
    hub_bucket = spark.read.parquet(salted).filter(
        F2.col("subj") == "urn:hub"
    ).select("subj_bucket").first()[0]

    def files_in(base):
        d = os.path.join(base, f"subj_bucket={hub_bucket}")
        return [f for f in os.listdir(d) if f.startswith("part-")]

    assert len(files_in(plain)) == 1      # one straggler task wrote it all
    assert len(files_in(salted)) >= 2     # salt split the hot bucket

    # resume semantics unchanged under salt
    m2 = materialize_triples(
        triples, salted, n_buckets=16, max_records_per_file=10**7, salt_partitions=8
    )
    assert m2["buckets_written"] == 0 and m2["buckets_skipped"] == 16
