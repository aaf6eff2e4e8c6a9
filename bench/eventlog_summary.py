"""Summarize a Spark event log: per-stage wall span vs summed task time.

    python bench/eventlog_summary.py /tmp/kgforge_eventlog/<app-id> [cores]

For each stage: wall span (submit→complete), sum of task run times,
effective parallelism (task_time / wall), and the idle fraction at the
given core count. Sorted by wall span — shows exactly where cores sit
idle (scheduling gaps, stragglers, undersized stages).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    stages: dict[tuple, dict] = {}
    app_start = app_end = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif kind == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, {"task_ms": 0.0, "tasks": 0})
                st["name"] = si["Stage Name"].split("\n")[0][:70]
                st["submit"] = si.get("Submission Time")
                st["complete"] = si.get("Completion Time")
                st["n_tasks"] = si.get("Number of Tasks")
            elif kind == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.setdefault(key, {"task_ms": 0.0, "tasks": 0})
                ti = ev.get("Task Info", {})
                st["task_ms"] += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["tasks"] += 1

    rows = []
    total_wall = total_task = 0.0
    for (sid, att), st in stages.items():
        if st.get("submit") is None or st.get("complete") is None:
            continue
        wall = (st["complete"] - st["submit"]) / 1000.0
        task = st["task_ms"] / 1000.0
        rows.append((wall, task, sid, st.get("n_tasks"), st.get("name", "?")))
        total_wall += wall
        total_task += task
    rows.sort(reverse=True)
    app_span = (app_end - app_start) / 1000.0 if app_start and app_end else None
    print(f"app span: {app_span}s  sum(stage walls): {total_wall:.1f}s  "
          f"sum(task time): {total_task:.1f}s")
    if app_span:
        print(f"overall effective parallelism: {total_task/app_span:.2f} of {cores} cores")
        gaps = app_span - total_wall
        print(f"time outside any stage (driver/planning/gaps, overlaps ignored): {gaps:.1f}s")
    print(f"{'wall_s':>8} {'task_s':>9} {'par':>5} {'idle%':>6} {'ntask':>6}  stage")
    for wall, task, sid, n, name in rows[:25]:
        par = task / wall if wall > 0 else 0
        idle = 100 * (1 - par / cores)
        print(f"{wall:8.1f} {task:9.1f} {par:5.1f} {idle:6.1f} {n:6}  [{sid}] {name}")


if __name__ == "__main__":
    main()
