"""Headline benchmark for the driver (one JSON line to stdout).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Times are
end-to-end per query (plan + execute + materialize counts).

Jitter control (round 6, same protocol as bench/ladder.py): the timed
section waits for a quiet window (1-min loadavg under threshold,
recorded in the output), and every query runs $SPARK_GRAFT_REPEATS
times (default 2) taking the per-query MINIMUM — so round-over-round
deltas are attributable to code, not ambient host load. The reported
total is the sum of per-query minima.

    python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # non-Linux fallback: no gate
        return 0.0


def _wait_for_quiet(threshold: float = 2.0, timeout: float = 300.0) -> float:
    """Block until the 1-min loadavg drops under `threshold` (or the
    timeout passes — the bench then runs anyway and RECORDS the load,
    so a noisy window is visible in the output rather than silently
    polluting the numbers)."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        la = _loadavg()
        if la < threshold:
            return la
        time.sleep(5)
    return _loadavg()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))

    import __spark_entry__ as entrymod
    from kgforge.session import get_spark

    spark = get_spark(
        app_name="kgforge-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 4),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # local small-file profile: the sf0.1 tables are 1-2 HDFS
            # blocks, so default 128m splits leave explode-heavy scans
            # on 2 tasks; 8m splits restore parallelism. At cluster
            # scale the 128m default is correct - this knob belongs to
            # the bench environment, not the library.
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )

    qs = entrymod.queries()
    # warm the JVM/IO once with the cheapest query so q1 isn't charged
    # with session spin-up
    next(iter(qs.values()))(spark, sf_dir).count()

    la_start = _wait_for_quiet()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    la_end = _loadavg()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "loadavg_start": la_start,
                "loadavg_end": la_end,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
