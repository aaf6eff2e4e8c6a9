"""Source readers.

CSV ingestion mirrors the reference's `csv.reader(..., errors='ignore')`
behavior (header row = schema, everything string-typed). The row-index
variant exists ONLY for v1-default parity, whose subject identity is
the 1-based data-row position (csv2rdf.py:116) — an inherently
order-dependent scheme. At web scale identity must be content-derived
(url / mention), which the web pipeline uses instead; see SURVEY.md §7.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, delimiter: str = ";", header: bool = True
) -> DataFrame:
    """Permissive, string-typed CSV scan (reference S1).

    multiLine + '"' escape match Python csv.reader semantics (quoted
    cells may hold embedded newlines; doubled quotes un-double) — the
    reference parses with csv.reader, and Spark's defaults (no
    multiLine, backslash escape) silently diverge on such cells.
    multiLine makes a file non-splittable; reference-sized grammar/
    source CSVs are small, and the web-scale path reads parquet.
    """
    return (
        spark.read.option("sep", delimiter)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("inferSchema", False)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


def read_csv_with_rowindex(
    spark: SparkSession, path: str, delimiter: str = ";"
) -> DataFrame:
    """CSV scan + 1-based data-row index column `__rowindex__`.

    Implemented with zipWithIndex over the (single-file, in-order) scan;
    correct for parity fixtures. Not a scale path by design — the
    default-mode row-index identity cannot be parallelized stably and
    the web pipeline never uses it.
    """
    df = read_csv(spark, path, delimiter)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("__rowindex__", T.LongType(), False)]
    )
    rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + 1))
    return spark.createDataFrame(rdd, schema)


def dataframe_from_rows(
    spark: SparkSession, rows: list[list[str]], with_rowindex: bool = False
) -> DataFrame:
    """Build a string-typed DataFrame from in-memory CSV-shaped rows
    (first row = header). Test/fixture helper."""
    header, data = rows[0], rows[1:]
    if with_rowindex:
        schema = T.StructType(
            [T.StructField(h, T.StringType(), True) for h in header]
            + [T.StructField("__rowindex__", T.LongType(), False)]
        )
        payload = [(*r, i + 1) for i, r in enumerate(data)]
    else:
        schema = T.StructType([T.StructField(h, T.StringType(), True) for h in header])
        payload = [tuple(r) for r in data]
    return spark.createDataFrame(payload, schema)
