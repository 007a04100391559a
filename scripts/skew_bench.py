"""Skew demonstration: PageRank over a hub-heavy (power-law-ish) graph,
plain two-phase hash agg vs explicit salted aggregation.

The synthetic link graph already embeds hubs (1/97th of nodes receive
~n/97 in-edges each); this script cranks the skew to one EXTREME hub
(every node links to node 0) and reports per-superstep times for
salt_buckets ∈ {1, 16}. Catalyst's map-side partial aggregation already
absorbs most in-degree skew (each map partition pre-combines its
contributions to the hub before the exchange), so the expected result
is parity at local scale — the salted path exists for the cluster case
where a single reducer's final combine of P partials becomes the
straggler.

Usage: python scripts/skew_bench.py [n_files] [supersteps]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from neo4j_graph_algorithms_spark.graph import Graph
    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
    from neo4j_graph_algorithms_spark.session import build_session

    spark = build_session(app_name="skew-bench")
    base = spark.range(n)
    # extreme skew: every node -> hub 0, plus a ring edge for connectivity
    edges = base.select(F.col("id").alias("src"), F.lit(0).alias("dst")).unionByName(
        base.select(F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst"))
    ).filter(F.col("src") != F.col("dst")).withColumn("weight", F.lit(1.0))
    g = Graph.from_edges(edges, weight="weight").cache()
    e_count = g.edge_count()

    results = {}
    for salt in (1, 16):
        pagerank(g, max_iterations=2, salt_buckets=salt)  # warmup
        _r, stats = pagerank(g, max_iterations=steps, salt_buckets=salt, fuse=steps)
        secs = [h["secs"] for h in stats["history"]]
        med = sorted(secs)[len(secs) // 2]
        results[f"salt_{salt}"] = {
            "median_step_secs": med,
            "edges_per_sec_per_superstep": int(e_count / med),
            "steps": secs,
        }
    print(json.dumps({"n_edges": e_count, **results}))


if __name__ == "__main__":
    main()
