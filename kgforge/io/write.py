"""Triple-table sinks.

Primary sink: parquet triple table bucket-partitioned by subject hash
(pmod(xxhash64(subj), n_buckets)), matching the north-star layout
(BASELINE.json). The hash-bucket column gives:
  * co-located self-joins on subj without a shuffle when both sides are
    bucket-pruned,
  * bounded file counts at 100 TB (buckets × maxRecordsPerFile),
  * head-entity skew diffusion: dedup already shuffles on the full
    triple, and the write partitioner works on the uniform hash.

Compat sink: sorted N-Triples text (S5) — exact serialization parity is
NOT a goal (correctness is triple-set P/R, SURVEY.md §1.1); the dump is
canonical (sorted) so diffs are reproducible.

20k-triple chunking (reference S6, csv2rdf-v3.py:124-166) maps to
`maxRecordsPerFile` — a config knob, not an operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["subj", "pred", "obj", "obj_dt"]


def write_triples(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    max_records_per_file: int = 20000,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet write. `subj_bucket` is a stable uniform hash
    so downstream subject-keyed reads prune and parallelize evenly."""
    out = df.withColumn(
        "subj_bucket", F.pmod(F.xxhash64(F.col("subj")), F.lit(n_buckets))
    )
    (
        out.repartition(n_buckets, "subj_bucket")
        .sortWithinPartitions("subj", "pred", "obj")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("subj_bucket")
        .parquet(path)
    )


def to_ntriples_lines(df: DataFrame) -> DataFrame:
    """Triple DF → one-column DF of N-Triples lines (unsorted).
    Pure column expressions — stays in codegen."""
    esc = F.col("obj")
    for src, dst in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        esc = F.replace(esc, F.lit(src), F.lit(dst))
    line = F.concat(
        F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"), F.lit("> "),
        F.when(F.col("obj_dt").isNull(), F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
        .when(F.col("obj_dt") == "", F.concat(F.lit('"'), esc, F.lit('"')))
        .otherwise(
            F.concat(F.lit('"'), esc, F.lit('"^^<'), F.col("obj_dt"), F.lit(">"))
        ),
        F.lit(" ."),
    )
    return df.select(line.alias("line"))


def dump_ntriples(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Canonical (sorted) N-Triples dump — the Turtle-compat sink."""
    to_ntriples_lines(df).sort("line").coalesce(1).write.mode(mode).text(path)
