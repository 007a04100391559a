"""spark-submit entry point — the cluster launch path the north rule
specifies:

    zip -r nga.zip neo4j_graph_algorithms_spark
    spark-submit --py-files nga.zip scripts/run_algo.py algo.pageRank \\
        --edges hdfs://.../edges.parquet --out hdfs://.../ranks \\
        --config max_iterations=50 --config tolerance=1e-6 \\
        --config checkpoint_dir=hdfs://.../ck --config resume=true

Under spark-submit the session inherits the submitted master/conf (we
only getOrCreate); standalone invocation falls back to the local
builder. `--repo-files` instead of `--edges` runs the full ingest
plane first: repo-file table → vectorized link extraction → edge table
(sha256(content) invariant preserved, see sources/link_extract.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_config(items: list[str]) -> dict:
    out: dict = {}
    for kv in items:
        k, _, v = kv.partition("=")
        if v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("procedure", help="algo.* name (see runner.list_procedures)")
    ap.add_argument("--edges", help="parquet path with (src, dst[, weight])")
    ap.add_argument("--repo-files", help="parquet path with (repo, path, commit, lang, content)")
    ap.add_argument("--synthetic", type=int, help="synthesize a link graph with N files")
    ap.add_argument("--out", help="output path (write mode); omit for row-count-only")
    ap.add_argument("--config", action="append", default=[], help="key=value, repeatable")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"nga-{args.procedure}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from neo4j_graph_algorithms_spark.graph import Graph
    from neo4j_graph_algorithms_spark import runner

    if args.repo_files:
        from neo4j_graph_algorithms_spark.sources.link_extract import (
            edges_from_links, extract_links,
        )

        files = spark.read.parquet(args.repo_files)
        edges = edges_from_links(extract_links(files), files)
    elif args.synthetic:
        from neo4j_graph_algorithms_spark.sources.link_extract import synthetic_link_edges

        edges = synthetic_link_edges(spark, args.synthetic)
    elif args.edges:
        edges = spark.read.parquet(args.edges)
        if "weight" not in edges.columns:
            from pyspark.sql import functions as F

            edges = edges.withColumn("weight", F.lit(1.0))
    else:
        ap.error("one of --edges / --repo-files / --synthetic is required")

    g = Graph.from_edges(edges, weight="weight")
    df, stats = runner.run(
        args.procedure, g,
        mode="write" if args.out else "stream",
        write_path=args.out,
        **_parse_config(args.config),
    )
    n = df.count() if not args.out else None
    print(json.dumps({"procedure": args.procedure, "rows": n, "stats":
                      {k: v for k, v in stats.items() if not isinstance(v, (list, dict))}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
