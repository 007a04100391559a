"""Deduplication operators over a document table.

Scale design notes (the point of every choice here):

- exact: one hash-groupBy — map-side partial agg, single shuffle of
  (sha, 1) pairs; the canonical-keeper join is a broadcast when the
  dup set is small, shuffle-join otherwise.
- MinHash+LSH: signatures are computed in ONE Arrow batch pass (numpy
  (a·x+b) mod p over the shingle hash array — no per-row Python), then
  banded; candidate generation is a self-join on (band, bucket) — the
  shuffle key is the band bucket, so skew only appears when a bucket is
  hot, which the band hash spreads. Verification re-computes exact
  Jaccard only for candidates (the whole point of LSH: |candidates| ≪
  n²).
- SimHash: 64-bit signature per doc, near-dup = Hamming distance ≤ k;
  bucketing by 4×16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least one
  identical chunk) turns the n² scan into 4 equi-joins.
- n-gram Jaccard: exact pairwise similarity via shingle explode +
  pair-count agg — the oracle-friendly exact path (quadratic in
  duplicate-group size only, since the join key is the shingle).
- embedding cosine: see `similarity.py`; near-dup = top-1 above a
  threshold.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed MinHash parameters: deterministic across runs/engines
_MERSENNE = (1 << 61) - 1


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(sha256, n_docs, doc_ids, keeper): one row per duplicate group
    (n_docs > 1); keeper = min doc id (deterministic survivor)."""
    return (
        docs.select(id_col, F.sha2(F.col(text_col), 256).alias("text_sha256"))
        .groupBy("text_sha256")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingle_col(text_col: str, k: int):
    """Array of k-character shingles (JVM-side, no UDF)."""
    t = F.col(text_col)
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))


def _mod_m61(x):
    """Vectorized ``x mod (2^61 - 1)`` for uint64 ``x`` up to 2^64-1.

    Mersenne fold: 2^61 ≡ 1 (mod M), so x = (x>>61)·2^61 + (x & M)
    ≡ (x>>61) + (x & M); the fold result is at most M+7, so one
    conditional subtract finishes the reduction."""
    import numpy as np

    m = np.uint64(_MERSENNE)
    r = (x >> np.uint64(61)) + (x & m)
    return np.where(r >= m, r - m, r)


def _mulmod_m61(a, v):
    """Vectorized ``(a·v) mod (2^61 - 1)`` with a, v < 2^61.

    32-bit split multiply so every partial product fits uint64:
    a·v = a1·v1·2^64 + (a1·v0 + a0·v1)·2^32 + a0·v0, with
    2^64 ≡ 8 (mod M); the mid term times 2^32 reduces via
    mid = h·2^29 + l → mid·2^32 ≡ h + l·2^32 (since 2^61 ≡ 1)."""
    import numpy as np

    mask32 = np.uint64(0xFFFFFFFF)
    mask29 = np.uint64((1 << 29) - 1)
    a1, a0 = a >> np.uint64(32), a & mask32
    v1, v0 = v >> np.uint64(32), v & mask32
    t_hi = _mod_m61((a1 * v1) << np.uint64(3))
    mid = _mod_m61(a1 * v0 + a0 * v1)
    t_mid = _mod_m61((mid >> np.uint64(29)) + ((mid & mask29) << np.uint64(32)))
    t_lo = _mod_m61(a0 * v0)
    return _mod_m61(t_hi + t_mid + t_lo)


def _minhash_batch(hash_lists, a, b):
    """Signatures for one Arrow batch: list-of-arrays of shingle hashes
    → (n_docs, num_hashes) int64 matrix. Pure batch-level numpy — the
    only Python loop is over the `num_hashes` permutations, each pass a
    vectorized sweep over every shingle hash in the batch, followed by a
    segment-min (`np.minimum.reduceat`) per document."""
    import numpy as np

    n_docs = len(hash_lists)
    num_hashes = len(a)
    lens = np.fromiter((len(h) for h in hash_lists), count=n_docs, dtype=np.int64)
    sig = np.zeros((n_docs, num_hashes), dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return sig
    flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hash_lists])
    v = _mod_m61(flat.view(np.uint64))
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nonempty = lens > 0
    ne_starts = starts[nonempty]
    for i in range(num_hashes):
        hv = _mod_m61(_mulmod_m61(np.uint64(a[i]), v) + np.uint64(b[i]))
        sig[nonempty, i] = np.minimum.reduceat(hv, ne_starts).astype(np.int64)
    return sig


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature: array<long>) — one Arrow batch pass; the min over
    (a·x+b) mod M runs as batch-level numpy (split-multiply mod-Mersenne
    on uint64 + segment-min), no per-row or per-shingle Python."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)

    shingled = docs.select(
        F.col(id_col).alias("id"),
        F.transform(_shingle_col(text_col, shingle_k), lambda s: F.xxhash64(s)).alias("hashes"),
    )

    def sign(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            sig = _minhash_batch(list(pdf["hashes"]), a, b)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "signature": list(sig)})

    return shingled.mapInPandas(sign, "id long, signature array<long>")


def _cap_hot_buckets(
    bucketed: DataFrame,
    keys: list[str],
    max_bucket_df: int | None,
    stats: dict | None = None,
) -> DataFrame:
    """Drop LSH buckets whose membership exceeds ``max_bucket_df``.

    A web-scale corpus is guaranteed to contain giant near-dup clusters
    (boilerplate, licenses): one (band, bucket) with 10⁶ members puts
    10¹² rows in the candidate self-join. The cap bounds every bucket's
    pair fan-out to O(max_bucket_df²); dropped buckets are counted and
    logged (members of a dropped mega-cluster are exactly the docs that
    exact/sha dedup already catches). Same precedent as
    ``ngram_jaccard_pairs``'s ``max_shingle_df``.

    ``stats``, when passed, receives ``dropped_buckets`` and
    ``dropped_rows`` (bucket-membership rows removed, i.e. Σ|dropped
    bucket|) so callers can surface coverage loss in their result
    contract instead of a log line."""
    if max_bucket_df is None:
        if stats is not None:
            stats["dropped_buckets"] = 0
            stats["dropped_rows"] = 0
        return bucketed
    import logging

    counts = bucketed.groupBy(*keys).agg(F.count("*").alias("_df")).persist()
    hot = counts.filter(F.col("_df") > max_bucket_df).agg(
        F.count("*").alias("n"), F.coalesce(F.sum("_df"), F.lit(0)).alias("rows")
    ).collect()[0]
    dropped, dropped_rows = int(hot["n"]), int(hot["rows"])
    if stats is not None:
        stats["dropped_buckets"] = dropped
        stats["dropped_rows"] = dropped_rows
    if dropped == 0:
        # healthy corpus — skip the semi-join and full materialization
        counts.unpersist()
        return bucketed
    logging.getLogger(__name__).warning(
        "LSH: dropping %d hot buckets (%d membership rows, > %d members "
        "each) from candidate generation — their pairs are not emitted",
        dropped, dropped_rows, max_bucket_df,
    )
    out = bucketed.join(
        counts.filter(F.col("_df") <= max_bucket_df).select(*keys), keys, "left_semi"
    ).localCheckpoint(eager=True)
    counts.unpersist()
    return out


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_df: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard_est) whose estimated
    Jaccard (signature agreement rate) ≥ threshold.

    LSH: split the signature into `bands` bands of r = num_hashes/bands
    rows; docs sharing any band bucket become candidates; candidates
    are scored by full-signature agreement (the unbiased Jaccard
    estimator) — exact verification is `ngram_jaccard_pairs`.

    Scale shape: the (band, bucket) self-join carries ONLY ids — the
    128-long signature arrays (~1 KB/row) never enter the candidate
    shuffle or the pair `distinct()`; signatures are re-joined from the
    cached signature table once per side for scoring, after the id-pair
    dedup collapsed the per-band multiplicity. ``max_bucket_df`` caps
    degenerate buckets (see `_cap_hot_buckets`).
    """
    r = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k, seed).persist()
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(F.slice("signature", bnd * r + 1, r)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    banded = _cap_hot_buckets(banded, ["band", "bucket"], max_bucket_df, stats=stats)
    left = banded.select("band", "bucket", F.col("id").alias("id_a"))
    right = banded.select("band", "bucket", F.col("id").alias("id_b"))
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    scored = cands.join(
        sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a")), "id_a"
    ).join(
        sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b")), "id_b"
    )
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    out = scored.select(
        "id_a", "id_b", (agree / F.lit(num_hashes)).alias("jaccard_est")
    ).filter(F.col("jaccard_est") >= threshold)
    # materialize, then release the signature cache: pipeline calls must
    # not leak persisted frames into a long-lived session (the pair list
    # is the small end of the funnel — eager evaluation here is cheap)
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def _simhash_batch(hash_lists):
    """SimHash signatures for one Arrow batch: list-of-arrays of shingle
    hashes → (n_docs,) int64 vector. Pure batch-level numpy — the only
    Python loop is over the 64 bit positions, each pass a vectorized
    sweep over every shingle hash in the batch followed by a segment sum
    (`np.add.reduceat`) per document; memory stays O(batch hashes), no
    (hashes × 64) matrix is materialized."""
    import numpy as np

    n_docs = len(hash_lists)
    out = np.zeros(n_docs, dtype=np.uint64)
    lens = np.fromiter((len(h) for h in hash_lists), count=n_docs, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out.view(np.int64)
    flat = np.concatenate(
        [np.asarray(h, dtype=np.int64) for h in hash_lists]
    ).view(np.uint64)
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nonempty = lens > 0
    ne_starts = starts[nonempty]
    ne_lens = lens[nonempty]
    sig = np.zeros(len(ne_starts), dtype=np.uint64)
    one = np.uint64(1)
    for b in range(64):
        bit = ((flat >> np.uint64(b)) & one).astype(np.int64)
        counts = np.add.reduceat(bit, ne_starts)
        # majority vote: bit b of the signature is 1 iff more than half
        # of the doc's shingle hashes have bit b set
        sig |= (counts * 2 > ne_lens).astype(np.uint64) << np.uint64(b)
    out[nonempty] = sig
    return out.view(np.int64)


def simhash64(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over shingle hashes; one
    batch-level numpy pass per Arrow batch (no per-document Python)."""
    shingled = docs.select(
        F.col(id_col).alias("id"),
        F.transform(_shingle_col(text_col, shingle_k), lambda s: F.xxhash64(s)).alias("hashes"),
    )

    def sim(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            sig = _simhash_batch(list(pdf["hashes"]))
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "simhash": sig})

    return shingled.mapInPandas(sim, "id long, simhash long")


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
    shingle_k: int = 4,
    max_bucket_df: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) ≤ max_distance.

    Pigeonhole bucketing: with 4 16-bit chunks, any pair within
    distance ≤ 3 shares at least one exact chunk → 4 equi-joins instead
    of an n² scan (requires max_distance ≤ 3 for exactness; larger
    distances need more/smaller chunks).

    EXACTNESS CAVEAT: the pigeonhole guarantee holds only with
    ``max_bucket_df=None``. Setting the cap drops hot (chunk, val)
    buckets, and a true pair whose EVERY shared chunk lands in a
    dropped bucket is silently lost — the cap trades exactly those
    mega-cluster pairs (which exact/sha dedup already catches) for a
    bounded candidate join. Pass ``stats={}`` to receive
    ``dropped_buckets`` / ``dropped_rows`` in the caller's dict and
    surface the coverage loss in your pipeline's result contract."""
    sigs = simhash64(docs, text_col, id_col, shingle_k).persist()
    # per-chunk value shifts by 16·chunk — SQL expr since the shift
    # amount is itself an expression
    chunks = sigs.selectExpr(
        "id", "simhash",
        "explode(transform(sequence(0, 3), c -> struct(c as chunk, (shiftright(simhash, cast(c*16 as int)) & 65535) as val))) as x",
    ).select("id", "simhash", "x.chunk", "x.val")
    chunks = _cap_hot_buckets(chunks, ["chunk", "val"], max_bucket_df, stats=stats)
    left = chunks.select("chunk", "val", F.col("id").alias("id_a"), F.col("simhash").alias("s_a"))
    right = chunks.select("chunk", "val", F.col("id").alias("id_b"), F.col("simhash").alias("s_b"))
    cands = (
        left.join(right, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    out = cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_distance
    )
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs ≥ threshold (id_a < id_b, jaccard).

    Shingle-explode + pair aggregation: |A∩B| from the shingle join,
    |A∪B| = |A|+|B|−|A∩B|. The join key is the shingle, so common
    shingles fan out quadratically — at scale, set ``max_shingle_df`` to
    drop stop-shingles whose document frequency exceeds the cap BEFORE
    the self-join (one extra groupBy, bounding the pair blowup to
    O(df_cap²) per shingle). Jaccard is then computed over the surviving
    shingle sets on both sides (sizes and intersections consistently
    exclude the dropped shingles)."""
    shingles = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_shingle_col(text_col, shingle_k))).alias("sh"),
    )
    if max_shingle_df is not None:
        df_counts = shingles.groupBy("sh").agg(F.count("*").alias("_df"))
        shingles = (
            shingles.join(df_counts.filter(F.col("_df") <= max_shingle_df), "sh")
            .select("id", "sh")
        )
    shingles = shingles.persist()
    sizes = shingles.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        shingles.alias("a").join(shingles.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    out = out.localCheckpoint(eager=True)
    shingles.unpersist()
    return out


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Transitive duplicate CLUSTERS from a pair list — the step every
    production dedup pipeline runs after pair generation (exact groups,
    MinHash/SimHash/n-gram/embedding pairs all emit (id_a, id_b); what
    the corpus needs is one survivor per connected component, since
    near-duplication is not transitive pair-by-pair but clusters are).

    Returns one row per document in ``docs``:
    ``(id, cluster_id, is_canonical)`` where ``cluster_id`` is the MIN
    doc id of the document's connected component in the pair graph
    (documents in no pair are singleton clusters of themselves) and
    ``is_canonical`` marks the deterministic survivor (id == cluster_id)
    — so ``filter(is_canonical)`` IS the deduped corpus and
    ``filter(~is_canonical)`` the drop list.

    Scale design: the WCC fixpoint (frontier min-label propagation +
    pointer jumping, `operators/wcc.py`) runs ONLY over documents that
    appear in at least one pair — at web scale the pair graph is a tiny
    fraction of the corpus (that is the point of LSH candidate
    generation), so the iterative part never touches the full document
    table; the corpus-wide result is a single left join at the end.
    Cluster diameter is typically small but NOT bounded (chained
    near-dups), which is why this is a fixpoint, not a k-step unroll.
    """
    from ..graph import Graph
    from ..operators.wcc import wcc

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    members = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    comp, _stats = wcc(Graph.from_edges(edges, nodes=members))
    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("id") == F.col("cluster_id"))
    )
    return out
