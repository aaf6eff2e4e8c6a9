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


def write_text_atomic(spark: SparkSession, path: str, content: str) -> None:
    """Pointer-grade text write: write to `<path>.tmp`, then rename()
    over the destination — rename is atomic on HDFS and on most object
    store committers, so a crash mid-flip leaves EITHER the old pointer
    OR the new one, never a truncated/empty file (write_text's
    create(overwrite=True) truncates first — fine for manifests that
    are re-derived, wrong for a pointer readers race against).

    Filesystems whose rename refuses an existing destination (Hadoop
    RawLocalFileSystem) get delete-then-rename; the resulting
    no-pointer window is handled by the READ side treating a missing/
    empty/unparsable pointer as "no snapshot yet" and by writers
    deriving state from a directory listing, never from the pointer."""
    fs, jpath = hadoop_fs(spark, path)
    tmp = jpath.suffix(".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, jpath):
        fs.delete(jpath, False)
        if not fs.rename(tmp, jpath):
            raise OSError(f"atomic rename to {path} failed twice")


def list_dir_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory ([] if it doesn't exist) — scheme-
    portable via the Hadoop FileSystem API like everything else here."""
    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))
