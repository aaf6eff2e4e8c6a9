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
