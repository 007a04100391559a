"""North-rule scaling evidence: the same PageRank job at two
parallelism levels (the sandbox stand-in for N vs 4N executors — see
BASELINE.md), reporting throughput at both plus scaling efficiency
``(thr_hi / thr_lo) / (hi / lo)``.

Each level runs in a fresh subprocess (fresh JVM — no shared executor
state between the two measurements).

Usage: python scripts/scaling_bench.py [n_files] [supersteps]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
cpus, n_files, supersteps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
from neo4j_graph_algorithms_spark.session import build_session
from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.sources.link_extract import synthetic_link_edges
spark = build_session(app_name=f"nga-scale-{cpus}", master=f"local[{cpus}]")
edges = synthetic_link_edges(spark, n_files)
g = Graph.from_edges(edges, weight="weight").cache()
n_edges = g.edge_count()
pagerank(g, max_iterations=3, fuse=2)  # warmup
t0 = time.time()
_r, stats = pagerank(g, max_iterations=supersteps, fuse=supersteps)
dt = time.time() - t0
step_secs = sorted(h["secs"] for h in stats["history"])
median = step_secs[len(step_secs) // 2]
print(json.dumps({"cpus": cpus, "n_edges": n_edges,
                  "supersteps": stats["iterations"], "seconds": round(dt, 2),
                  "edges_per_sec_per_superstep": int(n_edges * stats["iterations"] / dt),
                  "edges_per_sec_per_superstep_median": int(n_edges / median),
                  "step_seconds": [h["secs"] for h in stats["history"]]}))
"""


def run_level(cpus: int, n_files: int, supersteps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n_files), str(supersteps)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    lo = run_level(cpus_lo, n_files, supersteps)
    print(json.dumps(lo), flush=True)
    hi = run_level(cpus_hi, n_files, supersteps)
    print(json.dumps(hi), flush=True)
    eff = (hi["edges_per_sec_per_superstep_median"] / lo["edges_per_sec_per_superstep_median"]) / (cpus_hi / cpus_lo)
    print(json.dumps({
        "n_files": n_files,
        f"throughput_local{cpus_lo}": lo["edges_per_sec_per_superstep_median"],
        f"throughput_local{cpus_hi}": hi["edges_per_sec_per_superstep_median"],
        f"scaling_efficiency_{cpus_lo}_to_{cpus_hi}": round(eff, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
