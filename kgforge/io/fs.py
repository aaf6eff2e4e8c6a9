"""Hadoop FileSystem helpers (scheme-portable path IO).

Everything that touches the DATA path goes through the Hadoop
FileSystem API resolved from the path's scheme, so file://, hdfs://
and s3a:// behave identically — driver-local os.* silently sees an
empty directory on any remote store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path`, scheme-resolved."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def delete_path(spark: SparkSession, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.delete(jpath, True))


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file (manifests, markers) through the Hadoop
    FileSystem API — same scheme portability as the data path."""
    fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = hadoop_fs(spark, path)
    jvm = spark._jvm
    stream = fs.open(jpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    # copyBytes(close=True) closes both streams
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def collapse_to_file(spark: SparkSession, spark_out_dir: str, dest_file: str) -> None:
    """Move the single part-file of a 1-partition Spark text/csv write
    to `dest_file`, then remove the write directory. CLI convenience —
    the reference emits plain files ({source}.ttl), not directories."""
    fs, outdir = hadoop_fs(spark, spark_out_dir)
    part = None
    for status in fs.listStatus(outdir):
        name = status.getPath().getName()
        if name.startswith("part-"):
            if part is not None:
                raise ValueError(
                    f"{spark_out_dir} has multiple part files; "
                    "coalesce(1) before collapsing"
                )
            part = status.getPath()
    if part is None:
        raise FileNotFoundError(f"no part file under {spark_out_dir}")
    _, dest = hadoop_fs(spark, dest_file)
    if fs.exists(dest):
        fs.delete(dest, False)
    fs.rename(part, dest)
    fs.delete(outdir, True)
