"""Incremental ingestion via Structured Streaming.

The north-rule pipeline is batch (crawl snapshots), but a crawl FEED
is incremental: new page batches land in the input directory and only
they should be processed. Structured Streaming's file source +
checkpointing gives exactly the resume contract kgforge.lineage gives
batch jobs — processed files are recorded in the checkpoint, a crashed
job resumes without reprocessing, and `Trigger.AvailableNow` drains
whatever is pending then stops (the cron-style incremental run).

Two streams:

* `stream_mention_triples` — web_pages feed → extract → mention
  triples, append sink. Stateless (extraction and mention regexes are
  per-row), so it runs identically at any cluster size; global triple
  dedup is deliberately NOT done here — dedup is a compaction concern
  (kgforge.lineage.materialize_triples / dedup_exact) because a
  streaming global distinct would keep unbounded state.
* `stream_events_hourly` — the windowed rollup (events_hourly contract
  query) as a watermarked streaming aggregation: 1-hour tumbling
  windows, late events accepted up to the watermark, append mode
  emits each window once, when it closes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgforge.web.extract import extract_text
from kgforge.web.mentions import extract_mention_triples

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def stream_mention_triples(
    spark: SparkSession,
    pages_dir: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    text_from_html: bool = True,
):
    """web_pages parquet feed → mention-triple parquet, incrementally.

    Returns the started StreamingQuery; with available_now=True the
    caller `awaitTermination()`s and the query drains pending files
    then stops. Re-running with the same checkpoint processes ONLY
    files that arrived since the last run (file-source resume)."""
    pages = spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(pages_dir)
    if text_from_html:
        extracted = extract_text(pages, "html", "text_extracted").select(
            "url", "warc_ts", F.col("text_extracted").alias("text"), "lang"
        )
    else:
        extracted = pages.select("url", "warc_ts", "text", "lang")
    mentions = extract_mention_triples(extracted, text_col="text", dedup=False)
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    out_path: str,
    checkpoint: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming tumbling-window rollup with late-data handling:
    (window_start, event_type, n, sum_value), append mode — a window
    row is emitted exactly once, when the watermark passes its end.
    The batch equivalent is the `events_hourly` contract query."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
