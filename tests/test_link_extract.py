"""Ingest plane: synthetic repo table → vectorized link extraction.

Verifies the north-rule per-row invariant (sha256(content) preserved
bit-exactly through extraction) plus structural expectations of the
deterministic generator (chain + hub links, self-imports skipped).
"""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.link_extract import (
    edges_from_links,
    extract_links,
    synthetic_repo_table,
)

N = 200
HUB = 97


def test_extract_links_sha256_invariant_and_structure(spark):
    files = synthetic_repo_table(spark, n_files=N, n_repos=8).persist()
    links = extract_links(files).persist()

    # expected out-links per file i: {(i+1)%N, (i+2)%N, i%HUB} minus self
    expected_total = sum(
        len({(i + 1) % N, (i + 2) % N, i % HUB} - {i}) for i in range(N)
    )
    # note: duplicate targets collapse in the set above only if two rules
    # coincide; findall emits one row per import line, so compare against
    # the per-line count (self-links skipped at generation)
    expected_lines = sum(
        sum(1 for t in [(i + 1) % N, (i + 2) % N, i % HUB] if t != i)
        for i in range(N)
    )
    assert links.count() == expected_lines
    assert expected_total <= expected_lines  # sanity on the fixture math

    # per-row invariant: the sha carried through the UDF equals a fresh
    # sha2 of the source content for that (repo, path)
    fresh = files.select(
        "repo", "path", F.sha2("content", 256).alias("fresh_sha")
    )
    mismatches = (
        links.join(fresh, ["repo", "path"])
        .filter(F.col("content_sha256") != F.col("fresh_sha"))
        .count()
    )
    assert mismatches == 0

    # resolution: every dst_path exists in the snapshot → no drops
    edges = edges_from_links(links, files)
    assert edges.count() == expected_lines
    # no self-loops in the numeric edge table either
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0

    files.unpersist()
    links.unpersist()
