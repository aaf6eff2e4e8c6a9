"""Per-stage profiler for entry queries (no Spark UI in the sandbox).

Runs each named query once warm + once timed with the event log on,
then parses the log into a per-stage table: wall, summed task CPU /
run time, task count, shuffle bytes/records in and out, and the RDD
scope names (Exchange / Window / Generate / ArrowEvalPython ...) that
map the stage back to plan operators — the guide §7.1 empirical loop
driven from the event log instead of the UI. This is the instrument
behind the round-7 Part III stage numbers (e.g. the 62.5 s-CPU ngram
verify stage, the 3x window+aggregate re-executions, the 2-task melt
scan).

    SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python tools/profile_stages.py \
        dedup_ngram_jaccard dedup_minhash

Not part of the driver contract; bench.py stays the frozen
measurement."""
from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    qnames = sys.argv[1:] or ["dedup_ngram_jaccard"]
    logdir = "/tmp/sparkevents_profile"
    os.makedirs(logdir, exist_ok=True)

    import __spark_entry__ as entry
    from kgforge.session import get_spark

    spark = get_spark(
        app_name="kgforge-profile-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 4),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = entry.queries()
    # warm
    next(iter(qs.values()))(spark, sf_dir).count()
    for qn in qnames:
        spark.sparkContext.setJobDescription(f"warm:{qn}")
        qs[qn](spark, sf_dir).count()
    marks = {}
    for qn in qnames:
        spark.sparkContext.setJobDescription(qn)
        t0 = time.perf_counter()
        qs[qn](spark, sf_dir).count()
        marks[qn] = time.perf_counter() - t0
        print(f"{qn}: {marks[qn]:.3f}", flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse (Spark 4 rolling layout: eventlog_v2_<app>/events_*)
    path = os.path.join(logdir, app_id)
    if not os.path.exists(path):
        d = os.path.join(logdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events")
        )
    else:
        parts = [path]
    stages = {}
    stage_to_desc = {}
    job_desc = {}
    sql_by_stage = {}
    def lines():
        for p in parts:
            with open(p) as f:
                yield from f

    for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si["Submission Time"]
                comp = si["Completion Time"]
                s = stages.setdefault(sid, defaultdict(float))
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except Exception:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                s["name"] = ",".join(scopes[:6])[:110]
                s["wall"] = (comp - sub) / 1000.0
                s["tasks"] = si["Number of Tasks"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages.setdefault(sid, defaultdict(float))
                s["cpu"] = s.get("cpu", 0) + tm.get("Executor CPU Time", 0) / 1e9
                s["runtime"] = s.get("runtime", 0) + tm.get("Executor Run Time", 0) / 1e3
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                s["srb"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                s["srr"] += sr.get("Total Records Read", 0)
                s["fetchwait"] = s.get("fetchwait", 0) + sr.get("Fetch Wait Time", 0) / 1e3
                s["swb"] += sw.get("Shuffle Bytes Written", 0)
                s["swr"] += sw.get("Shuffle Records Written", 0)

    for qn in qnames:
        print(f"\n=== {qn} (wall {marks[qn]:.3f}s) — timed (non-warm) stages ===")
        rows = [
            (sid, s) for sid, s in sorted(stages.items())
            if stage_to_desc.get(sid, "") == qn
        ]
        tot = sum(s["wall"] for _, s in rows)
        print(f"{'sid':>4} {'wall':>7} {'cpu':>8} {'run':>8} {'tasks':>5} "
              f"{'sw_MB':>8} {'sw_rec':>10} {'sr_MB':>8} {'sr_rec':>10}  name")
        for sid, s in rows:
            print(
                f"{sid:>4} {s['wall']:>7.2f} {s['cpu']:>8.2f} {s['runtime']:>8.2f} "
                f"{s['tasks']:>5} {s['swb']/1e6:>8.1f} {s['swr']:>10} "
                f"{s['srb']/1e6:>8.1f} {s['srr']:>10}  {s['name']}"
            )
        print(f"sum stage wall = {tot:.2f}s over {len(rows)} stages")


if __name__ == "__main__":
    main()
