"""Scaling-evidence orchestrator (BASELINE.md §3 protocol).

Same job, same input, two parallelism levels (the sandbox stand-in for
N vs 4N executors):

    python bench/scaling.py [--pages 120000] [--small 8] [--large 32]

1. builds dist/kgforge.zip (the --py-files artifact),
2. pre-generates the web_pages parquet (outside the timed window),
3. runs bench/scaling_run.py via spark-submit at local[small] and
   local[large],
4. computes scaling efficiency E = (T_small / T_large) / (large/small)
   and appends the results table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(
    cores: int,
    pages_path: str,
    pages: int,
    zip_path: str,
    eventlog_dir: str | None = None,
    out_suffix: str = "",
) -> dict:
    out = f"/tmp/kgforge_scaling/run{cores}{out_suffix}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        # spark.driver.memory set inside the session is ignored under
        # spark-submit (the JVM is already up, 1g default) — pass it
        # on the command line; 32 concurrent tasks × Arrow html
        # batches OOM at 1g
        "--driver-memory", os.environ.get("KGFORGE_DRIVER_MEM", "24g"),
        "--py-files", zip_path,
        os.path.join(ROOT, "bench", "scaling_run.py"),
        "--cores", str(cores),
        "--pages", str(pages),
        "--pages-path", pages_path,
        "--out", out,
    ]
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        cmd += ["--eventlog-dir", eventlog_dir]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # prove the zip is sufficient
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=120000)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from kgforge.web.corpus import corpus_to_parquet
    from tools.package import build

    zip_path = build()
    pages_path = f"/tmp/kgforge_scaling/web_pages_{args.pages}_{args.seed}.parquet"
    if not os.path.exists(pages_path):
        os.makedirs(os.path.dirname(pages_path), exist_ok=True)
        print(f"generating corpus: {args.pages} pages → {pages_path}", file=sys.stderr)
        corpus_to_parquet(pages_path, n_pages=args.pages, seed=args.seed)

    # the host is shared: external load skews any single timing. Run
    # alternating repeats and keep the best (min-wall) run per core
    # count — min is the noise-robust estimator for capacity. Loadavg
    # is recorded so a reviewer can judge interference.
    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    def wait_for_quiet(threshold: float = 2.0, timeout: float = 420.0) -> float:
        """Neighbors on this shared host run multi-minute CPU bursts;
        timing a run inside one is meaningless. Wait for a quiet
        window (1-min loadavg below threshold), bounded by timeout."""
        import time as _t

        t0 = _t.time()
        while _t.time() - t0 < timeout:
            la = loadavg()
            if la < threshold:
                return la
            _t.sleep(10)
        return loadavg()

    small = large = None
    for _ in range(args.repeats):
        for cores in (args.small, args.large):
            la = wait_for_quiet()
            r = run_one(cores, pages_path, args.pages, zip_path)
            r["loadavg_before"] = la
            if cores == args.small and (small is None or r["wall_sec"] < small["wall_sec"]):
                small = r
            if cores == args.large and (large is None or r["wall_sec"] < large["wall_sec"]):
                large = r

    ratio = args.large / args.small
    eff = (small["wall_sec"] / large["wall_sec"]) / ratio
    summary = {
        "pages": args.pages,
        "small": small,
        "large": large,
        "speedup": round(small["wall_sec"] / large["wall_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "gate": "PASS" if eff >= 0.8 else "FAIL",
    }
    print(json.dumps(summary))

    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured results",
        "",
        "## Scaling evidence (N vs 4N protocol, BASELINE.md §3)",
        "",
        f"Same job (full web-KG pipeline: extract → mentions → link → CC →",
        f"rewrite → bucketed materialize), same input ({args.pages} pages,",
        f"seed={args.seed}), spark-submit --py-files dist/kgforge.zip,",
        "identical configs except parallelism.",
        "",
        "| run | cores | wall (s) | pages/s | mention triples/s | extract | mentions | link | canon | materialize |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in (small, large):
        s = r["stages_sec"]
        lines.append(
            f"| local[{r['cores']}] | {r['cores']} | {r['wall_sec']} | "
            f"{r['pages_per_sec']} | {r['triples_per_sec']} | "
            f"{s['extract']} | {s['mentions']} | {s['link']} | "
            f"{s['canonicalize']} | {s['materialize']} |"
        )
    lines += [
        "",
        f"- mention triples: {small['mention_triples']}, canonical triples: {small['canonical_triples']}",
        f"- speedup {args.small}→{args.large} cores: **{summary['speedup']}×**",
        f"- scaling efficiency E = (T_{args.small} / T_{args.large}) / {ratio:g} = **{summary['scaling_efficiency']}** (gate ≥ 0.8: {summary['gate']})",
        "",
    ]
    lines += [
        f"- loadavg before runs (shared host, recorded for honesty): "
        f"small={small.get('loadavg_before', '?')}, large={large.get('loadavg_before', '?')}; "
        f"best-of-{args.repeats} alternating repeats (min wall) per level",
        "",
    ]
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote → {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
