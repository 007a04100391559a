"""Procedure registry + run harness — the `algo.*` surface.

Mirrors the reference's procedure plane (SURVEY.md §2.c): `algo.list`
(`algo/.../ListProc.java:32-59`) becomes `list_procedures()`, every
`algo.X` / `algo.X.stream` pair becomes `run(name, graph, mode=...)`
returning the result DataFrame plus the stats row the write-back
variants report (`algo/.../results/*.java` DTOs: loadMillis,
computeMillis, writeMillis, nodes, iterations, …).

`mode="stream"` returns the DataFrame (the caller consumes it —
`readme.adoc:96-121`); `mode="write"` additionally writes it to
`write_path` as parquet (the Spark analogue of the node-property
write-back exporter, `core/.../core/write/Exporter.java:47-51` — a
distributed write instead of 10k-row transactions).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .graph import Graph


@dataclass(frozen=True)
class Procedure:
    name: str
    description: str
    fn: Callable  # (graph, **config) -> (DataFrame, stats) or DataFrame


def _wrap_df(fn):
    def inner(graph: Graph, **config):
        return fn(graph, **config), {}
    return inner


def _registry() -> dict[str, Procedure]:
    from .operators.betweenness import betweenness
    from .operators.kcore import core_decomposition
    from .operators.label_propagation import label_propagation
    from .operators.louvain import louvain, louvain_multilevel
    from .operators.msbfs import all_shortest_paths, closeness, harmonic
    from .operators.mst import mst
    from .operators.neighborhood import neighborhood_function
    from .operators.node_similarity import node_similarity
    from .operators.pagerank import pagerank
    from .operators.random_walk import random_walks
    from .operators.scc import scc
    from .operators.shortest_path import (
        all_shortest_paths_weighted,
        delta_stepping,
        shortest_paths,
    )
    from .operators.triangles import triangle_count, triangle_stream
    from .operators.wcc import wcc

    procs = [
        Procedure("algo.pageRank", "delta-push PageRank (PageRankProc.java:67-134)", pagerank),
        Procedure(
            "algo.pageRank.personalized",
            "personalized PageRank: teleport seeded at source_nodes only (extension beyond the reference)",
            lambda graph, source_nodes, **kw: pagerank(graph, source_nodes=source_nodes, **kw),
        ),
        Procedure("algo.unionFind", "weakly connected components (UnionFindProc.java:51-91)", wcc),
        Procedure("algo.unionFind.mscoloring", "WCC via min-label coloring (MSColoringProc.java:53-99) — same partition, shared impl", wcc),
        Procedure("algo.labelPropagation", "weighted LPA (LabelPropagationProc.java:67-110)", label_propagation),
        Procedure("algo.triangleCount", "triangle count + clustering coefficient (TriangleProc.java:58-298)", triangle_count),
        Procedure("algo.triangle.stream", "triangle triples (TriangleProc.java:241-298)", _wrap_df(triangle_stream)),
        Procedure("algo.closeness", "MS-BFS closeness centrality (MSClosenessCentrality.java)", closeness),
        Procedure("algo.harmonic", "MS-BFS harmonic centrality (MSHarmonicCentrality.java)", harmonic),
        Procedure("algo.allShortestPaths.stream", "unweighted APSP stream (MSBFSAllShortestPaths.java)", _wrap_df(all_shortest_paths)),
        Procedure("algo.allShortestPaths.weighted.stream", "weighted APSP stream (AllShortestPaths.java:22-46)", _wrap_df(all_shortest_paths_weighted)),
        Procedure("algo.shortestPaths", "SSSP distances (ShortestPaths.java)", shortest_paths),
        Procedure("algo.shortestPath.deltaStepping", "bucketed SSSP (ShortestPathDeltaStepping.java)", delta_stepping),
        Procedure("algo.mst", "minimum spanning tree (MSTPrim.java → Borůvka)", mst),
        Procedure("algo.scc", "strongly connected components (MultistepSCC.java)", scc),
        Procedure("algo.betweenness", "Brandes betweenness (BetweennessCentrality.java)", betweenness),
        Procedure("algo.betweenness.sampled", "RA-Brandes sampled betweenness (RABrandesBetweennessCentrality.java)", betweenness),
        Procedure("algo.louvain", "single-level Louvain (Louvain.java:99-140)", louvain),
        Procedure("algo.louvain.multilevel", "hierarchical Louvain: local moves + community contraction (extension beyond the single-level reference)", louvain_multilevel),
        Procedure("algo.kcore", "core decomposition via the iterative h-index fixpoint (extension)", core_decomposition),
        Procedure("algo.neighborhood", "HyperANF neighborhood function + effective diameter (extension)", neighborhood_function),
        Procedure("algo.randomWalk", "deterministic join-based uniform random walks (extension)", random_walks),
        Procedure("algo.similarity.jaccard", "neighborhood-Jaccard node similarity (extension)", _wrap_df(node_similarity)),
    ]
    return {p.name: p for p in procs}


def list_procedures() -> list[dict]:
    """`CALL algo.list` analogue."""
    return [
        {"name": p.name, "description": p.description}
        for p in sorted(_registry().values(), key=lambda p: p.name)
    ]


def run(
    name: str,
    graph: Graph,
    mode: str = "stream",
    write_path: str | None = None,
    **config,
) -> tuple[DataFrame, dict]:
    """Dispatch a procedure by `algo.*` name; returns (df, stats).

    stats always carries loadMillis/computeMillis/writeMillis like the
    reference's write-back result rows.
    """
    procs = _registry()
    if name not in procs:
        raise KeyError(f"unknown procedure {name!r}; see list_procedures()")
    t_load = time.time()
    graph.cache()
    graph.edge_count()  # materialize = the "load" phase
    load_ms = int((time.time() - t_load) * 1000)

    t_c = time.time()
    out = procs[name].fn(graph, **config)
    df, stats = out if isinstance(out, tuple) else (out, {})
    compute_ms = int((time.time() - t_c) * 1000)

    write_ms = 0
    if mode == "write":
        if not write_path:
            raise ValueError("mode='write' requires write_path")
        t_w = time.time()
        df.write.mode("overwrite").parquet(write_path)
        write_ms = int((time.time() - t_w) * 1000)

    stats = dict(stats)
    stats.update({"loadMillis": load_ms, "computeMillis": stats.get("computeMillis", compute_ms), "writeMillis": write_ms})
    return df, stats
