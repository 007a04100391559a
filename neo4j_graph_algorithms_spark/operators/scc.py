"""Strongly connected components — `algo.scc.*`.

Reference ships Tarjan variants (sequential: `impl/SCCTarjan.java:22-45`,
`SCCIterativeTarjan.java`, `SCCTunedTarjan.java`) and the parallel
**MultiStep** pipeline: trim → FW-BW on the giant SCC → coloring →
Tarjan remainder (`impl/multistepscc/MultistepSCC.java:22-46`,
`MultiStepColoring.java`, `MultiStepTrim.java`, `MultiStepFWBW.java`).
Tarjan's DFS stack cannot distribute; the MultiStep family is *already*
the distributed formulation, so the rebuild implements exactly that
shape (SURVEY.md §2.c #9):

1. **trim** — repeatedly peel nodes with in- or out-degree 0 within the
   active set; each is its own singleton SCC (`MultiStepTrim.java`).
2. **color** — propagate the maximum node id along forward edges to a
   fixpoint; every color class is closed under forward reachability
   from its root (`MultiStepColoring.java`).
3. **backward sweep** — BFS from each color root over REVERSED edges,
   restricted to same-colored nodes: reached set = the root's SCC
   (`MultiStepFWBW.java` backward phase). All roots sweep in the same
   joins (color is part of the key) — no per-root loop.
4. repeat on the residue until empty.

Fixture `tests/.../impl/SCCTest.java:60-157`: three 3-cycles a-b-c,
d-e-f, g-h-i bridged a→d, g isolated from them — 3 non-trivial SCCs.

Output: (id, component) where component = min original node id of the
SCC — deterministic; the reference's set ids are impl-defined and its
tests compare partitions.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpointing import adaptive_disabled, check_termination


def scc(
    graph: Graph, max_outer: int | None = None, termination=None
) -> tuple[DataFrame, dict]:
    """MultiStep-shaped SCC; returns (assignments(id, component), stats).

    Termination: every outer round assigns at least one SCC (the color
    root of the maximal color class always discovers its own SCC), so
    the loop converges in at most `condensation-chain-depth` rounds —
    unbounded by default. An explicit ``max_outer`` cap RAISES if nodes
    remain unassigned when it is hit (never silent row loss);
    ``didConverge`` is surfaced in stats either way.
    """
    spark = graph.edges.sparkSession
    t0 = time.time()
    n_parts = spark.sparkContext.defaultParallelism
    edges_all = (
        graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        .repartition(n_parts, "src").persist()
    )
    edges_all.count()

    active = graph.nodes.select("id")
    assigned: DataFrame | None = None
    outer = 0

    def assign(df: DataFrame) -> None:
        nonlocal assigned
        assigned = df if assigned is None else assigned.unionByName(df)
        assigned = assigned.localCheckpoint(eager=True)

    converged = False
    with adaptive_disabled(spark):
        active = active.localCheckpoint(eager=True)
        while max_outer is None or outer < max_outer:
            check_termination(spark, termination, outer)
            outer += 1
            if active.isEmpty():
                converged = True
                break
            # edges restricted to the active set; partitioned by `src`
            # before the checkpoint (localCheckpoint preserves
            # outputPartitioning) so the color-propagation fixpoint loop
            # — the hot inner loop, one join on src per round — streams
            # the cached sub-graph in place and shuffles only the color
            # frame
            sub = (
                edges_all.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .repartition(n_parts, "src")
                .localCheckpoint(eager=True)
            )
            # 1. trim: peel degree-0 nodes iteratively (singleton SCCs)
            while True:
                has_out = sub.select(F.col("src").alias("id")).distinct()
                has_in = sub.select(F.col("dst").alias("id")).distinct()
                keep = active.join(has_out, "id", "left_semi").join(has_in, "id", "left_semi")
                keep = keep.localCheckpoint(eager=True)
                trimmed = active.join(keep, "id", "left_anti")
                n_trimmed = trimmed.count()
                if n_trimmed == 0:
                    break
                assign(trimmed.select("id", F.col("id").alias("component")))
                active = keep
                sub = (
                    sub.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                    .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
                    .repartition(n_parts, "src")
                    .localCheckpoint(eager=True)
                )
            if active.isEmpty():
                converged = True
                break
            # 2. color: forward max-id propagation to fixpoint
            color = active.select("id", F.col("id").alias("color")).localCheckpoint(eager=True)
            while True:
                pushed = (
                    sub.join(color.select(F.col("id").alias("src"), "color"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.max("color").alias("nc"))
                )
                stepped = color.join(pushed, "id", "left").select(
                    "id", F.greatest("color", F.coalesce("nc", "color")).alias("color")
                ).localCheckpoint(eager=True)
                changed = (
                    stepped.join(color.withColumnRenamed("color", "prev"), "id")
                    .filter(F.col("color") != F.col("prev"))
                    .count()
                )
                color = stepped
                if changed == 0:
                    break
            # 3. backward sweep from each color root within its class
            roots = color.filter(F.col("id") == F.col("color")).select("color")
            reached = roots.select(F.col("color").alias("id"), "color")
            reached = reached.localCheckpoint(eager=True)
            frontier = reached
            while True:
                step = (
                    sub.join(frontier.select(F.col("id").alias("dst"), "color"), "dst")
                    .select(F.col("src").alias("id"), "color")
                    .distinct()
                    .join(color.withColumnRenamed("color", "c2"), "id")
                    .filter(F.col("color") == F.col("c2"))
                    .select("id", "color")
                    .join(reached, ["id", "color"], "left_anti")
                    .localCheckpoint(eager=True)
                )
                if step.isEmpty():
                    break
                reached = reached.unionByName(step).localCheckpoint(eager=True)
                frontier = step
            # SCC id = min node id of the reached set per color
            mins = reached.groupBy("color").agg(F.min("id").alias("component"))
            assign(reached.join(mins, "color").select("id", "component"))
            active = active.join(reached.select("id"), "id", "left_anti").localCheckpoint(eager=True)

    if not converged:
        converged = active.isEmpty()
    edges_all.unpersist()
    if not converged:
        n_left = active.count()
        raise RuntimeError(
            f"scc: max_outer={max_outer} outer rounds exhausted with "
            f"{n_left} nodes unassigned (didConverge=False) — raise the "
            "cap (a chain-shaped SCC condensation needs one round per link)"
        )
    result = assigned if assigned is not None else graph.nodes.select(
        "id", F.col("id").alias("component")
    )
    stats = {
        "outerRounds": outer,
        "didConverge": converged,
        "computeMillis": int((time.time() - t0) * 1000),
    }
    return result, stats
