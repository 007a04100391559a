"""Similarity search over an embedding column (`array<float>`).

Two paths, same result contract (query_id, neighbor_id, sim, rank):

- `cosine_topk` — brute force: query×corpus join with the dot product
  as a JVM expression chain (`F.aggregate`/`F.zip_with` — no Python in
  the row path). The O(Q·N) baseline every ANN variant is verified
  against; right shape when Q is small or N fits a broadcast.
- `lsh_cosine_topk` — random-hyperplane LSH: sign-bit signatures via a
  vectorized pandas UDF (one numpy matmul per Arrow batch), candidates
  from multi-table bucket joins, exact cosine re-rank of candidates
  only. Recall grows with tables; each table is one equi-join shuffle
  keyed by the bucket — the scale path when Q·N is out of reach.
- `ivf_cosine_topk` — inverted-file variant: k-means-lite centroids
  (seeded sample, a few Lloyd rounds computed distributively), probe
  the `nprobe` nearest cells per query. Classic IVF trade-off:
  centroid assignment is one broadcast matmul; only cell-mates join.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    sims = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _signatures(df: DataFrame, id_col: str, vec_col: str, planes, label: str) -> DataFrame:
    """(id, table, bucket) sign-bit signatures; one numpy matmul per
    Arrow batch per table."""
    import numpy as np
    import pandas as pd

    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim)

    def sig(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy())
            proj = vecs @ flat.T  # (rows, tables*bits)
            bits = (proj > 0).astype(np.int64).reshape(len(pdf), n_tables, n_bits)
            weights = (1 << np.arange(n_bits, dtype=np.int64))
            buckets = (bits * weights).sum(axis=2)  # (rows, tables)
            rows = {
                "id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table": np.tile(np.arange(n_tables), len(pdf)),
                "bucket": buckets.reshape(-1),
            }
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        sig, "id long, table int, bucket long"
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 12,
    dim: int | None = None,
    seed: int = 42,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidates + exact re-rank.

    ``max_bucket_df`` caps the CORPUS-side membership of each
    (table, bucket) before the candidate join — the same hot-bucket
    guard as every near-pair path (`dedup._cap_hot_buckets`): a giant
    near-identical embedding cluster otherwise lands in one bucket of
    every table and yields O(|Q_bucket|·|C_bucket|) candidates. Queries
    whose buckets are dropped in one table still probe their other
    ``n_tables − 1`` buckets (and the result is approximate by
    construction); dropped-bucket counts are logged by the capper.
    """
    import numpy as np

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim))

    qs = _signatures(queries, id_col, vec_col, planes, "q").withColumnRenamed("id", "query_id")
    cs = _signatures(corpus, id_col, vec_col, planes, "c").withColumnRenamed("id", "neighbor_id")
    if max_bucket_df is not None:
        from .dedup import _cap_hot_buckets

        # persist: the capper reads the signature table twice (bucket
        # counts + semi-join) and the candidate join once more — without
        # the cache each pass recomputes the whole-corpus matmul. The
        # candidate list is materialized below so the cache can be
        # released before returning (no persisted frames leak out).
        raw_cs = cs.persist()
        cs = _cap_hot_buckets(raw_cs, ["table", "bucket"], max_bucket_df)
        cands = (
            qs.join(cs, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        raw_cs.unpersist()
    else:
        cands = (
            qs.join(cs, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    sims = cands.join(qv, "query_id").join(cv, "neighbor_id").select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    lloyd_rounds: int = 2,
    seed: int = 42,
    max_cell_df: int | None = None,
) -> DataFrame:
    """IVF ANN: seeded-sample centroids refined with a few distributed
    Lloyd rounds; queries probe their `nprobe` nearest cells.

    ``max_cell_df`` caps the corpus-side membership of each inverted
    cell before the probe join (the IVF analogue of the LSH hot-bucket
    cap): a degenerate near-identical cluster collapses into one cell
    and every query probing it pays O(|cell|) candidates. Queries still
    probe their other ``nprobe − 1`` cells; dropped-cell counts are
    logged by the capper."""
    import numpy as np

    spark = corpus.sparkSession
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")).persist()
    # init centroids from a seeded sample (driver-side tiny collect)
    init = c.sample(fraction=min(1.0, (n_cells * 5) / max(c.count(), 1)), seed=seed).limit(n_cells).collect()
    cents = np.stack([np.asarray(r["cv"]) for r in init])
    while len(cents) < n_cells:
        cents = np.vstack([cents, cents[: n_cells - len(cents)]])

    def assign_cells(df: DataFrame, idname: str, n_probe: int) -> DataFrame:
        bc = spark.sparkContext.broadcast(cents)

        def go(batches: Iterator) -> Iterator:
            import pandas as pd

            C = bc.value
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["v"].to_numpy())
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
                sims = Vn @ Cn.T
                order = np.argsort(-sims, axis=1)[:, :n_probe]
                yield pd.DataFrame({
                    idname: np.repeat(pdf[idname].to_numpy(), n_probe),
                    "cell": order.reshape(-1),
                })

        return df.mapInPandas(go, f"{idname} long, cell long")

    def _cell_means(pdf):
        import pandas as pd

        V = np.stack(pdf["cv"].to_numpy())
        return pd.DataFrame(
            {"cell": [int(pdf["cell"].iloc[0])], "mean": [V.mean(axis=0).tolist()]}
        )

    for _ in range(lloyd_rounds):
        assigned = assign_cells(c.withColumnRenamed("cv", "v"), "neighbor_id", 1)
        # centroid update aggregates to one mean VECTOR per cell
        # executor-side (applyInPandas over the cell group); the driver
        # collects exactly n_cells rows, never (cell x dim) scalars
        means = (
            assigned.join(c, "neighbor_id")
            .groupBy("cell")
            .applyInPandas(_cell_means, "cell long, mean array<double>")
            .collect()
        )
        newc = cents.copy()
        for r in means:
            newc[int(r["cell"])] = np.asarray(r["mean"])
        cents = newc

    cell_of = assign_cells(c.withColumnRenamed("cv", "v"), "neighbor_id", 1).persist()
    if max_cell_df is not None:
        from .dedup import _cap_hot_buckets

        cell_of = _cap_hot_buckets(cell_of, ["cell"], max_cell_df)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")).persist()
    q_cells = assign_cells(q.withColumnRenamed("qv", "v"), "query_id", nprobe)

    cands = (
        q_cells.join(cell_of, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    sims = cands.join(q, "query_id").join(c, "neighbor_id").select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, sim >= threshold).

    The embedding-space member of the dedup family (exact sha /
    MinHash / SimHash / n-gram Jaccard live in ``pipeline.dedup``):

    - ``method="exact"`` — all-pairs cosine, the O(N^2) verification
      baseline (SQL-oracle-checkable); right only when N is small or
      as the ground truth for recall tests.
    - ``method="lsh"`` — the scale path: hyperplane sign-bit
      signatures (one numpy matmul per Arrow batch), candidates from
      per-table (table, bucket) self-joins carrying IDS ONLY, exact
      cosine re-rank of the deduped candidate pairs. Recall < 1 by
      construction and grows with ``n_tables``; differential-tested
      against exact. ``max_bucket_df`` caps hot buckets (giant
      near-dup clusters) exactly like the MinHash/SimHash paths.

    Null and zero-norm embeddings are excluded up front: cosine is
    undefined for them (0/0 → NaN, which Spark's NaN ordering would
    pass through `sim >= threshold`), and in LSH mode every zero
    vector lands in the same all-zero-sign bucket of every table,
    manufacturing N² garbage candidates.
    """
    import numpy as np

    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).filter(F.col("v").isNotNull() & (_norm(F.col("v")) > 0))
    if method == "exact":
        a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        sims = pairs.select(
            "id_a", "id_b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("sim"),
        )
        return sims.filter(F.col("sim") >= threshold)
    if method != "lsh":
        raise ValueError(f"unknown method: {method!r}")

    from .dedup import _cap_hot_buckets

    first = vecs.select("v").first()
    if first is None:  # empty (or all-null/zero) input — no pairs
        return vecs.select(
            F.col("id").alias("id_a"), F.col("id").alias("id_b"), F.lit(0.0).alias("sim")
        ).limit(0)
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim))
    # persist: left/right sides of the candidate join (and the hot-
    # bucket counts pass) otherwise each recompute the whole-corpus
    # signature matmul — same reason minhash_lsh_pairs persists its sigs
    sigs = _signatures(vecs, "id", "v", planes, "s").persist()
    capped = _cap_hot_buckets(sigs, ["table", "bucket"], max_bucket_df)
    left = capped.select("table", "bucket", F.col("id").alias("id_a"))
    right = capped.select("table", "bucket", F.col("id").alias("id_b"))
    cands = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sigs.unpersist()
    va = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    sims = cands.join(va, "id_a").join(vb, "id_b").select(
        "id_a", "id_b",
        (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("sim"),
    )
    return sims.filter(F.col("sim") >= threshold)
