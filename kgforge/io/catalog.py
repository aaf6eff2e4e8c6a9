"""Sink/catalog protocol behind resumable triple materialization.

`kgforge.lineage.materialize_triples` talks to a `TripleSink`; the
parquet+ledger sink is the local/sandbox default, and the Iceberg sink
binds the SAME protocol to snapshot-based commits on a cluster that has
the Iceberg runtime on the classpath (SURVEY.md §7.2/§7.4's
``catalog=iceberg|parquet`` switch). The protocol is deliberately
minimal — exactly the operations resume needs:

    completed(stage)    buckets already durably committed
    repair(done)        delete torn output from a crashed run
    append(df)          write new bucketed data (df carries subj_bucket)
    bucket_census()     buckets present in storage right now
    read_buckets(b)     re-read the new buckets for checksum stats
    commit(stage, rows) durably record completion (ledger append /
                        snapshot commit)

The reference realizes durability as whole-file Turtle writes
(csv2rdf/csv2rdf.py:275-290 writes one .ttl per source); at 10^12
documents durability has to be per-partition, which is what this seam
expresses.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

from kgforge.session import local_df


def _bucketed_repartition(
    df: DataFrame, salt_partitions: int | None, n_buckets: int | None = None
) -> DataFrame:
    """Exchange rows by subj_bucket, optionally salted — the
    head-entity skew guard (the north rule's "salted repartitioning"):
    a mega-hub subject puts ~all its rows in ONE subj_bucket, so
    hashing on the bucket alone makes one write task the straggler.
    Salting by a hash of the non-subject columns splits a hot bucket
    across up to `salt_partitions` tasks; partition routing still sends
    every row to the right bucket (a bucket simply receives files from
    several tasks), and within-file sort order is preserved so subj
    min/max row-group pruning keeps working."""
    from pyspark.sql import functions as F

    if salt_partitions and salt_partitions > 1:
        salt = F.pmod(
            F.xxhash64(
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                  for c in df.columns
                  if c not in ("subj_bucket", "subj")]
            ),
            F.lit(int(salt_partitions)),
        )
        keys = [F.col("subj_bucket"), salt.alias("salt")]
    else:
        keys = [F.col("subj_bucket")]
    if n_buckets is not None:
        return df.repartition(n_buckets, *keys)
    return df.repartition(*keys)


class TripleSink(ABC):
    """Minimal storage contract for resumable bucketed triple writes."""

    @abstractmethod
    def completed(self, stage: str) -> set[int]:
        """Buckets with a durable completion record for `stage`."""

    @abstractmethod
    def repair(self, done: set[int]) -> list[int]:
        """Delete bucket output present in storage but NOT in `done`
        (torn writes from a crashed run). Returns repaired buckets."""

    @abstractmethod
    def append(self, df: DataFrame, max_records_per_file: int) -> None:
        """Append `df` (already carrying subj_bucket) to the table."""

    @abstractmethod
    def bucket_census(self) -> set[int]:
        """Buckets physically present in storage."""

    @abstractmethod
    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """Read back exactly `buckets` (for checksum/lineage stats)."""

    @abstractmethod
    def commit(self, stage: str, lineage_rows: list[tuple]) -> None:
        """Durably record (stage, bucket, row_count, checksum, run_id)
        rows — the moment a bucket counts as COMPLETE."""


class ParquetLedgerSink(TripleSink):
    """Default sink: parquet partitioned by subj_bucket + a parquet
    lineage ledger under <path>/_lineage. All IO through the Hadoop
    FileSystem API (file://, hdfs://, s3a:// identical)."""

    LINEAGE_SCHEMA = (
        "stage string, bucket int, row_count long, checksum long, run_id string"
    )

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 64,
        salt_partitions: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self.salt_partitions = salt_partitions

    def completed(self, stage: str) -> set[int]:
        from kgforge import lineage

        return lineage.completed_buckets(self.spark, self.path, stage)

    def repair(self, done: set[int]) -> list[int]:
        from kgforge import lineage

        return lineage._repair_torn_buckets(self.spark, self.path, done)

    def append(self, df: DataFrame, max_records_per_file: int) -> None:
        out = _bucketed_repartition(df, self.salt_partitions, self.n_buckets)
        (
            out.sortWithinPartitions("subj_bucket", "subj", "pred", "obj")
            .write.mode("append")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("subj_bucket")
            .parquet(self.path)
        )

    def bucket_census(self) -> set[int]:
        from kgforge import lineage

        return set(lineage._bucket_dirs_on_disk(self.spark, self.path))

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        from pyspark.sql import functions as F

        return self.spark.read.parquet(self.path).filter(
            F.col("subj_bucket").isin(buckets)
        )

    def commit(self, stage: str, lineage_rows: list[tuple]) -> None:
        from kgforge import lineage

        local_df(self.spark, lineage_rows, self.LINEAGE_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(lineage._lineage_path(self.path))


def _iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the driver classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergSnapshotSink(TripleSink):
    """Iceberg binding of the sink protocol (requires the
    iceberg-spark-runtime jar + a configured catalog; NOT available in
    this sandbox — the constructor refuses cleanly rather than letting
    any method half-work).

    Protocol mapping (each commit is an Iceberg snapshot, so the ledger
    lives next to the data table as a second Iceberg table):
      append        create-if-absent PARTITIONED BY (subj_bucket) with
                    write.distribution-mode=hash, then
                    df.writeTo(table).append() — one snapshot
      commit        writeTo(table + '_lineage').append() — the lineage
                    snapshot is the durability point, same as the
                    parquet ledger append
      completed     scan of the lineage table
      bucket_census the table's `.partitions` metadata table
      repair        DELETE WHERE subj_bucket IN (torn) — or, when the
                    torn write is the latest snapshot, a rollback via
                    CALL catalog.system.rollback_to_snapshot

    Tables are auto-created on the first append, PARTITIONED BY
    subj_bucket (bucket_census/repair depend on that layout — a
    PRE-created table must use the same partition spec). The parquet
    sink's max_records_per_file knob has no Iceberg equivalent (the
    Spark-Iceberg writer rolls files by BYTES, not records): it maps
    to `target_file_size_bytes`, written as the
    write.target-file-size-bytes table property at creation.
    `salt_partitions` applies the same head-entity salting as the
    parquet sink before the write exchange.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        salt_partitions: int | None = None,
        target_file_size_bytes: int | None = None,
    ):
        if not _iceberg_runtime_available(spark):
            raise RuntimeError(
                "catalog='iceberg' requires the Iceberg Spark runtime "
                "(org.apache.iceberg.spark.SparkCatalog not on the driver "
                "classpath). Launch with e.g. spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
                "and a spark.sql.catalog.<name> configuration, or use the "
                "default catalog='parquet' sink."
            )
        self.spark = spark
        self.table = table
        self.salt_partitions = salt_partitions
        self.target_file_size_bytes = target_file_size_bytes

    @property
    def _lineage_table(self) -> str:
        return self.table + "_lineage"

    def _create_partitioned(self, df: DataFrame) -> None:
        """First write: CREATE the table from `df`, PARTITIONED BY
        subj_bucket (identity partition — census/repair address buckets
        through the partition spec), hash distribution so each bucket's
        rows land in one write task, and the size-based file-rolling
        property standing in for the parquet sink's record cap."""
        from pyspark.sql import functions as F

        writer = (
            df.writeTo(self.table)
            .partitionedBy(F.col("subj_bucket"))
            .tableProperty("write.distribution-mode", "hash")
        )
        if self.target_file_size_bytes:
            writer = writer.tableProperty(
                "write.target-file-size-bytes", str(int(self.target_file_size_bytes))
            )
        writer.create()

    def completed(self, stage: str) -> set[int]:
        from pyspark.sql import functions as F

        if not self.spark.catalog.tableExists(self._lineage_table):
            return set()
        return {
            r.bucket
            for r in self.spark.read.table(self._lineage_table)
            .filter(F.col("stage") == stage)
            .select("bucket")
            .collect()
        }

    def repair(self, done: set[int]) -> list[int]:
        torn = sorted(self.bucket_census() - done)
        if torn:
            self.spark.sql(
                f"DELETE FROM {self.table} WHERE subj_bucket IN "
                f"({','.join(str(b) for b in torn)})"
            )
        return torn

    def append(self, df: DataFrame, max_records_per_file: int) -> None:
        # max_records_per_file is a parquet-sink knob; Iceberg rolls
        # files by bytes (see class docstring / target_file_size_bytes)
        out = _bucketed_repartition(df, self.salt_partitions).sortWithinPartitions(
            "subj_bucket", "subj", "pred", "obj"
        )
        if not self.spark.catalog.tableExists(self.table):
            self._create_partitioned(out)
            return
        out.writeTo(self.table).append()

    def bucket_census(self) -> set[int]:
        if not self.spark.catalog.tableExists(self.table):
            return set()
        return {
            r.partition.subj_bucket
            for r in self.spark.read.table(self.table + ".partitions").collect()
        }

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        from pyspark.sql import functions as F

        return self.spark.read.table(self.table).filter(
            F.col("subj_bucket").isin(buckets)
        )

    def commit(self, stage: str, lineage_rows: list[tuple]) -> None:
        ldf = local_df(
            self.spark, lineage_rows, ParquetLedgerSink.LINEAGE_SCHEMA
        ).coalesce(1)
        if not self.spark.catalog.tableExists(self._lineage_table):
            ldf.writeTo(self._lineage_table).create()  # ledger: unpartitioned
            return
        ldf.writeTo(self._lineage_table).append()


def resolve_sink(
    spark: SparkSession,
    path: str,
    catalog: str | TripleSink = "parquet",
    n_buckets: int = 64,
    salt_partitions: int | None = None,
) -> TripleSink:
    """catalog= flag → sink instance; a TripleSink passes through."""
    if isinstance(catalog, TripleSink):
        return catalog
    if catalog == "parquet":
        return ParquetLedgerSink(spark, path, n_buckets, salt_partitions)
    if catalog == "iceberg":
        return IcebergSnapshotSink(spark, path, salt_partitions=salt_partitions)
    raise ValueError(f"unknown catalog {catalog!r} (expected parquet|iceberg)")
