"""Structured-Streaming incremental ingestion: file-source resume
(only new batches processed) and watermarked windowed aggregation."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from kgforge.streaming import stream_events_hourly, stream_mention_triples
from kgforge.web.corpus import make_corpus, pages_dataframe
from kgforge.web.mentions import extract_mention_triples


def _write_pages_batch(spark, corpus, path: str) -> None:
    pages_dataframe(spark, corpus).coalesce(1).write.mode("append").parquet(path)


def _triples_multiset(df):
    return sorted(
        (r.subj, r.pred, r.obj, r.obj_dt, r.prov_url) for r in df.collect()
    )


def test_incremental_mention_stream_resumes(spark, tmp_path):
    src = str(tmp_path / "pages_feed")
    out = str(tmp_path / "triples_out")
    cp = str(tmp_path / "cp")

    c1 = make_corpus(n_pages=40, seed=1)
    c2 = make_corpus(n_pages=30, seed=2)

    # batch 1 arrives → drain
    _write_pages_batch(spark, c1, src)
    q = stream_mention_triples(spark, src, out, cp)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # batch 2 arrives → SAME checkpoint processes only the new files
    _write_pages_batch(spark, c2, src)
    q = stream_mention_triples(spark, src, out, cp)
    q.awaitTermination(120)

    got = _triples_multiset(spark.read.parquet(out))
    want = _triples_multiset(
        extract_mention_triples(
            pages_dataframe(spark, c1)
            .select("url", "warc_ts", "text", "lang")
            .unionByName(
                pages_dataframe(spark, c2).select("url", "warc_ts", "text", "lang")
            ),
            text_col="text",
            dedup=False,
        )
    )
    assert got == want  # incremental union == batch over everything

    # re-running with NOTHING new appends nothing (idempotent resume)
    q = stream_mention_triples(spark, src, out, cp)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)


def test_streaming_events_hourly_matches_batch_closed_windows(spark, tmp_path):
    src = str(tmp_path / "events_feed")
    out = str(tmp_path / "hourly_out")
    cp = str(tmp_path / "cp_events")

    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", os.path.join(src, "batch0.parquet"))
    q = stream_events_hourly(spark, src, out, cp, watermark="2 hours")
    q.awaitTermination(120)

    events = spark.read.parquet(src)
    max_ts = events.agg(F.max("ts")).first()[0]
    batch = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    got = {
        (r.hour, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no closed windows emitted"
    # append mode emits exactly the windows the watermark closed; every
    # emitted window must match the batch rollup exactly
    want = {
        (r.hour, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    for k, v in got.items():
        assert want[k] == v, k
    # and all clearly-closed windows (end ≤ max_ts − watermark) emitted
    import datetime

    closed_cutoff = max_ts - datetime.timedelta(hours=3)
    missing = [
        k for k in want if k[0] <= closed_cutoff and k not in got
    ]
    assert not missing, f"closed windows not emitted: {missing[:3]}"


def test_stream_compact_incremental_equals_one_shot_batch(spark, tmp_path):
    """The deferred-global-dedup contract end-to-end: stream batch 1 →
    compact → stream batch 2 → compact must equal ONE batch run over
    all pages (extract_mention_triples(dedup=True)), with each
    snapshot lineage-audited and the pointer flipping atomically."""
    from kgforge.lineage import verify_lineage
    from kgforge.streaming import compact_mentions, read_compacted

    src = str(tmp_path / "pages_feed")
    raw = str(tmp_path / "raw_triples")
    cp = str(tmp_path / "cp")
    root = str(tmp_path / "table")

    c1 = make_corpus(n_pages=40, seed=1)
    c2 = make_corpus(n_pages=30, seed=2)

    def batch_truth(*corpora):
        pages = None
        for c in corpora:
            p = pages_dataframe(spark, c).select("url", "warc_ts", "text", "lang")
            pages = p if pages is None else pages.unionByName(p)
        return sorted(
            (r.subj, r.pred, r.obj, r.obj_dt, r.prov_url)
            for r in extract_mention_triples(pages, text_col="text", dedup=True)
            .select("subj", "pred", "obj", "obj_dt", "prov_url")
            .collect()
        )

    assert read_compacted(spark, root) is None  # nothing compacted yet

    # batch 1: stream → compact
    _write_pages_batch(spark, c1, src)
    stream_mention_triples(spark, src, raw, cp, text_from_html=False).awaitTermination(120)
    snap1, m1 = compact_mentions(spark, raw, root)
    assert m1["rows_written"] > 0
    got1 = sorted(
        (r.subj, r.pred, r.obj, r.obj_dt, r.prov_url)
        for r in read_compacted(spark, root)
        .select("subj", "pred", "obj", "obj_dt", "prov_url")
        .collect()
    )
    assert got1 == batch_truth(c1)
    assert verify_lineage(spark, snap1, stage="compact")

    # batch 2 arrives: same checkpoint streams only the new files,
    # the next compaction folds everything
    _write_pages_batch(spark, c2, src)
    stream_mention_triples(spark, src, raw, cp, text_from_html=False).awaitTermination(120)
    snap2, m2 = compact_mentions(spark, raw, root)
    assert snap2 != snap1  # copy-on-write: a NEW snapshot
    got2 = sorted(
        (r.subj, r.pred, r.obj, r.obj_dt, r.prov_url)
        for r in read_compacted(spark, root)
        .select("subj", "pred", "obj", "obj_dt", "prov_url")
        .collect()
    )
    assert got2 == batch_truth(c1, c2)
    assert verify_lineage(spark, snap2, stage="compact")


def test_compaction_crash_before_flip_keeps_old_snapshot(spark, tmp_path, monkeypatch):
    """Failure injection for the copy-on-write pointer protocol
    (round-4 verdict item 7): kill the run between snapshot
    materialize and the `_current` flip. Readers must keep serving the
    OLD snapshot; a re-run must open a FRESH snapshot (k from the dir
    listing, never from the pointer — re-entering the orphan would hit
    its done-markers and flip to stale data) and converge. A torn/empty
    pointer must read as None, not as 'read the table root'."""
    import kgforge.streaming as streaming_mod
    from kgforge.io.fs import read_text, write_text
    from kgforge.streaming import compact_mentions, read_compacted

    raw = str(tmp_path / "raw")
    root = str(tmp_path / "table")

    pages1 = pages_dataframe(spark, make_corpus(n_pages=25, seed=1)).select(
        "url", "warc_ts", "text", "lang"
    )
    extract_mention_triples(pages1, text_col="text", dedup=False).write.mode(
        "append"
    ).parquet(raw)
    snap1, _ = compact_mentions(spark, raw, root)
    baseline = _triples_multiset(
        read_compacted(spark, root).select("subj", "pred", "obj", "obj_dt", "prov_url")
    )

    # more raw data lands; the next compaction CRASHES before the flip
    pages2 = pages_dataframe(spark, make_corpus(n_pages=20, seed=2)).select(
        "url", "warc_ts", "text", "lang"
    )
    extract_mention_triples(pages2, text_col="text", dedup=False).write.mode(
        "append"
    ).parquet(raw)

    def boom(spark_, path, content):
        raise RuntimeError("injected crash between materialize and flip")

    monkeypatch.setattr("kgforge.io.fs.write_text_atomic", boom)
    # compact_mentions imports the symbol inside the function body, so
    # patching the fs module intercepts the flip itself
    try:
        compact_mentions(spark, raw, root)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.undo()

    # pointer untouched → readers still serve snapshot 1
    assert read_text(spark, root + "/_current").strip() == "snap_1" or read_text(
        spark, root + "/_current"
    ).strip() == "snap_0"
    assert (
        _triples_multiset(
            read_compacted(spark, root).select(
                "subj", "pred", "obj", "obj_dt", "prov_url"
            )
        )
        == baseline
    )

    # re-run: fresh snapshot index (orphan skipped), full feed folded
    snap3, _ = compact_mentions(spark, raw, root)
    assert snap3 not in (snap1,)
    merged = _triples_multiset(
        read_compacted(spark, root).select("subj", "pred", "obj", "obj_dt", "prov_url")
    )
    assert len(merged) > len(baseline)
    # the re-run's snapshot index is strictly beyond the orphaned one
    k_orphan = int(snap3.rsplit("_", 1)[1])
    assert k_orphan >= 2

    # torn-pointer hardening: an EMPTY pointer reads as None
    write_text(spark, root + "/_current", "")
    assert read_compacted(spark, root) is None


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dedup_within: duplicate mentions inside the horizon collapse in
    the STREAM (bounded state); compaction semantics are unchanged —
    the compacted table equals the batch-dedup truth either way."""
    from kgforge.streaming import compact_mentions, read_compacted

    src = str(tmp_path / "pages_feed")
    raw = str(tmp_path / "raw_triples")
    cp = str(tmp_path / "cp")
    root = str(tmp_path / "table")

    c = make_corpus(n_pages=40, seed=5)
    _write_pages_batch(spark, c, src)
    stream_mention_triples(
        spark, src, raw, cp, text_from_html=False, dedup_within="1 hour"
    ).awaitTermination(120)

    raw_df = spark.read.parquet(raw)
    occurrences = extract_mention_triples(
        pages_dataframe(spark, c).select("url", "warc_ts", "text", "lang"),
        text_col="text",
        dedup=False,
    )
    n_raw, n_occ = raw_df.count(), occurrences.count()
    n_distinct = occurrences.select("subj", "pred", "obj", "obj_dt").distinct().count()
    # the stream emitted fewer rows than mention occurrences (dups
    # within the horizon collapsed) but no fewer than the distinct set
    assert n_distinct <= n_raw < n_occ, (n_distinct, n_raw, n_occ)

    # compaction contract unchanged: still the batch-dedup triple SET
    compact_mentions(spark, raw, root)
    got = sorted(
        (r.subj, r.pred, r.obj, r.obj_dt)
        for r in read_compacted(spark, root)
        .select("subj", "pred", "obj", "obj_dt")
        .collect()
    )
    want = sorted(
        (r.subj, r.pred, r.obj, r.obj_dt)
        for r in occurrences.select("subj", "pred", "obj", "obj_dt")
        .distinct()
        .collect()
    )
    assert got == want
