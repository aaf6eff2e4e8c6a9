"""Instance-scale property-path benchmark (round-4 verdict item 8).

`<pred>+` compiles through kgforge.rdfs.transitive_closure; its
iterative-doubling fallback had only ever run on grammar-sized edge
sets. This bench runs the SPARQL path end-to-end (triple-table parquet
scan → path compile → closure → count) on million-edge instance
predicates, one fresh JVM per leg with the event log on (the
bench/hot_bucket.py protocol), and reports wall seconds, output pair
count, doubling-round count, and per-task skew of the heaviest stage.

Topology legs (closure OUTPUT must stay bounded — a single deep chain
of n nodes closes to C(n,2) pairs, so "1M-edge deep chain" is not a
runnable fixture; depth and width are separated instead):

* chains_1m — 20,000 disjoint chains × depth 50 = 1M edges; closure
  25.5M pairs in ~log2(50) rounds. The throughput leg.
* wide_fan  — 1,000 roots × 1,000 children = 1M edges, depth 1;
  closure = the edge set, converges after one no-growth round. The
  join-fan-out leg (every root is a 1000-way hot key in the doubling
  self-join).
* deep_2k   — ONE chain of depth 2048 (2k edges, 2.1M closure pairs),
  forced onto the distributed doubling path (max_driver_edges=0):
  evidences the O(log d) round count (11 rounds) on a
  diameter-dominated graph.
* chains_1m_seed / chains_1m_seed_obj / wide_fan_seed (round 6) — the
  SAME parquet with a CONSTANT endpoint (`<seed> p+ ?b` / `?a p+
  <seed>`): the seeded-BFS pushdown must answer from the reachable
  region (≤50 pairs of one chain / 1,000 children of one fan root)
  without materializing the 25.5M-pair closure — wall seconds and the
  heavy-stage record counts are the evidence.

    python bench/path_closure.py --cores 32 --workdir /tmp/kgforge_pathbench
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRED = "https://kg.example.org/web#next"

_GEN = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from kgforge.session import get_spark

spark = get_spark(app_name="pathbench-gen", master="local[{cores}]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
PRED = {pred!r}

def triple(src, dst):
    return (src.alias("subj"), F.lit(PRED).alias("pred"),
            dst.alias("obj"), F.lit(None).cast("string").alias("obj_dt"))

# chains_1m: node id = chain*64 + pos (pos < depth); edge pos -> pos+1
chains = spark.range({n_chains} * {depth}).select(
    (F.col("id") / {depth}).cast("long").alias("c"),
    F.pmod(F.col("id"), {depth}).alias("p"))
chains.select(*triple(
    F.format_string("n%d", F.col("c") * 1024 + F.col("p")),
    F.format_string("n%d", F.col("c") * 1024 + F.col("p") + 1),
)).write.mode("overwrite").parquet({work!r} + "/chains_1m")

# wide_fan: root r -> child r*100000 + i
fan = spark.range({n_roots} * {n_children}).select(
    (F.col("id") / {n_children}).cast("long").alias("r"),
    F.pmod(F.col("id"), {n_children}).alias("i"))
fan.select(*triple(
    F.format_string("r%d", F.col("r")),
    F.format_string("c%d_%d", F.col("r"), F.col("i")),
)).write.mode("overwrite").parquet({work!r} + "/wide_fan")

# deep_2k: one chain, depth 2048
deep = spark.range(2048)
deep.select(*triple(
    F.format_string("d%d", F.col("id")),
    F.format_string("d%d", F.col("id") + 1),
)).write.mode("overwrite").parquet({work!r} + "/deep_2k")
print("GEN_OK")
spark.stop()
"""

_LEG = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from kgforge.session import get_spark

spark = get_spark(app_name="pathbench-{name}", master="local[{cores}]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.dir": {elog!r}}})
triples = spark.read.parquet({work!r} + "/{data}")
t0 = time.perf_counter()
{body}
print("LEG_SEC", round(time.perf_counter() - t0, 1), "PAIRS", n)
spark.stop()
"""

_SPARQL_BODY = """
from kgforge.sparql import sparql
n = sparql(triples, 'SELECT ?a ?b WHERE {{ ?a <{pred}>+ ?b }}').count()
"""

# round-6: constant-endpoint pushdown legs — the seeded BFS must touch
# the reachable region (one chain / one fan root), not the 25.5M-pair
# closure. seed on chain 17 (node id = chain*1024 + pos).
_SEED_SUBJ_BODY = """
from kgforge.sparql import sparql
n = sparql(triples, 'SELECT ?b WHERE {{ <{seed}> <{pred}>+ ?b }}').count()
"""

_SEED_OBJ_BODY = """
from kgforge.sparql import sparql
n = sparql(triples, 'SELECT ?a WHERE {{ ?a <{pred}>+ <{seed}> }}').count()
"""

_DEEP_BODY = """
# force the distributed iterative-doubling path (driver fast path off)
from kgforge.rdfs import transitive_closure
edges = triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
n = transitive_closure(edges, max_driver_edges=0,
                       reflexive_on_cycle=True).count()
"""


def _run(script: str, tag: str) -> tuple[float, str]:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, cwd=REPO
    )
    wall = round(time.perf_counter() - t0, 1)
    out = "\n".join(
        ln for ln in (proc.stdout + proc.stderr).splitlines()
        if ln.startswith(("GEN_OK", "LEG_SEC", "Traceback")) or "Error" in ln
    )
    print(f"[{tag}] rc={proc.returncode} {wall}s :: {out[:300]}")
    if proc.returncode != 0:
        print(proc.stderr[-3000:])
        raise SystemExit(1)
    return wall, proc.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n-chains", type=int, default=20_000)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--n-roots", type=int, default=1_000)
    ap.add_argument("--n-children", type=int, default=1_000)
    ap.add_argument("--workdir", default="/tmp/kgforge_pathbench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    work = args.workdir
    os.makedirs(work, exist_ok=True)

    _run(
        _GEN.format(repo=REPO, cores=args.cores, work=work, pred=PRED,
                    n_chains=args.n_chains, depth=args.depth,
                    n_roots=args.n_roots, n_children=args.n_children),
        "gen",
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from task_skew import stage_skew

    results = {}
    legs = [
        ("chains_1m", "chains_1m", _SPARQL_BODY.format(pred=PRED)),
        ("chains_1m_seed", "chains_1m",
         _SEED_SUBJ_BODY.format(pred=PRED, seed="n17408")),
        ("chains_1m_seed_obj", "chains_1m",
         _SEED_OBJ_BODY.format(pred=PRED, seed=f"n{17 * 1024 + args.depth}")),
        ("wide_fan", "wide_fan", _SPARQL_BODY.format(pred=PRED)),
        ("wide_fan_seed", "wide_fan",
         _SEED_SUBJ_BODY.format(pred=PRED, seed="r17")),
        ("deep_2k", "deep_2k", _DEEP_BODY),
    ]
    for name, data, body in legs:
        elog = os.path.join(work, f"elog_{name}")
        shutil.rmtree(elog, ignore_errors=True)
        os.makedirs(elog)
        wall, stdout = _run(
            _LEG.format(repo=REPO, name=name, data=data, cores=args.cores,
                        work=work, elog=elog, body=body),
            name,
        )
        line = next(ln for ln in stdout.splitlines() if ln.startswith("LEG_SEC"))
        _, sec, _, pairs = line.split()
        files = [f for f in os.listdir(elog) if not f.startswith(".")]
        skew = stage_skew(os.path.join(elog, files[0])) if len(files) == 1 else []
        heavy = sorted(skew, key=lambda s: -s.get("records_total", 0))[:3]
        results[name] = {
            "wall_sec": float(sec),
            "pairs": int(pairs),
            "heavy_stages": heavy,
        }

    out_path = args.out or os.path.join(REPO, "BENCH", "path_closure_r6.json")
    with open(out_path, "w") as f:
        json.dump({"cores": args.cores, "legs": results}, f, indent=1, default=str)
    print("WROTE", out_path)
    for name, r in results.items():
        print(f"{name}: {r['wall_sec']}s pairs={r['pairs']}")


if __name__ == "__main__":
    main()
