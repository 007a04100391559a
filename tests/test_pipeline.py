"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

import math

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    decode_images,
    metadata_stats,
    resize_images,
    sample_video_frames,
    synthetic_assets,
)
from neo4j_graph_algorithms_spark.pipeline.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from neo4j_graph_algorithms_spark.pipeline.text import (
    fingerprint,
    lang_id,
    quality_scores,
    token_counts,
)

LOREM = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest where many other animals live in peace"
)


def _docs(spark):
    rows = [
        (0, LOREM),
        (1, LOREM),  # exact dup of 0
        (2, LOREM.replace("quick", "swift")),  # near dup of 0
        (3, "der hund und die katze sind gute freunde und das ist schoen"),
        (4, "completely different content about distributed query engines"),
        (5, "le chat et le chien sont les meilleurs amis et la vie est belle"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_docs"] == 2 and g["doc_ids"] == [0, 1] and g["keeper"] == 0


def test_ngram_jaccard_and_minhash_agree(spark):
    docs = _docs(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert exact[(0, 1)] == 1.0
    assert (0, 2) in exact  # near-dup above 0.5
    approx = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=16).collect()
    }
    assert approx[(0, 1)] == 1.0
    assert (0, 2) in approx
    # estimator within 0.25 of exact for the near-dup pair
    assert abs(approx[(0, 2)] - exact[(0, 2)]) < 0.25


def test_simhash_near_pairs(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(_docs(spark), max_distance=3).collect()}
    assert pairs[(0, 1)] == 0  # identical docs → identical simhash


def test_similarity_exact_vs_lsh_vs_ivf(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.normal(size=(20, 16)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(20)]
    # ids 100..119 duplicate 0..19 → exact top-1 of query i is i+100
    rows += [(100 + i, base[i].tolist()) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 100)

    exact = cosine_topk(queries, corpus, k=1).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in exact} == {(i, 100 + i) for i in range(5)}
    for r in exact:
        assert math.isclose(r["sim"], 1.0, abs_tol=1e-9)

    lsh = lsh_cosine_topk(queries, corpus, k=1, n_tables=6, n_bits=8, dim=16).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in lsh} == {(i, 100 + i) for i in range(5)}

    ivf = ivf_cosine_topk(queries, corpus, k=1, n_cells=4, nprobe=2).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in ivf} == {(i, 100 + i) for i in range(5)}


def test_text_ops(spark):
    docs = _docs(spark)
    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert langs[0] == "en" and langs[3] == "de" and langs[5] == "fr"

    toks = {r["doc_id"]: r["n_tokens"] for r in token_counts(docs).collect()}
    assert toks[0] == len(LOREM.split())
    bpe = {r["doc_id"]: r["n_tokens"] for r in token_counts(docs, mode="bpe_ish").collect()}
    assert bpe[0] >= toks[0]  # pre-tokenizer splits at least as fine

    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert q[0]["n_chars"] == len(LOREM)
    assert 0.0 < q[0]["alpha_ratio"] < 1.0
    assert q[0]["digit_ratio"] == 0.0

    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fps[0] == fps[1]  # identical docs share the fingerprint
    assert fps[0] != fps[4]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, n=30).persist()
    by_mod = {r["modality"]: r for r in metadata_stats(assets).collect()}
    assert set(by_mod) == {"image", "audio", "video"}
    assert sum(r["n_assets"] for r in by_mod.values()) == 30

    n_images = assets.filter(F.col("modality") == "image").count()
    decoded = decode_images(assets).collect()
    assert len(decoded) == n_images
    for r in decoded:
        assert 0.0 <= r["mean_intensity"] <= 255.0
        assert r["width"] >= 64 and r["height"] >= 64

    resized = resize_images(assets, target=16).collect()
    assert len(resized) == n_images
    for r in resized:
        assert len(r["payload"]) == 16 * 16 * 3

    frames = sample_video_frames(assets, every_n=5)
    joined = (
        frames.groupBy("asset_id").agg(F.count("*").alias("n"))
        .join(assets.select("asset_id", F.col("meta.n_frames").alias("nf")), "asset_id")
        .collect()
    )
    for r in joined:
        assert r["n"] == (r["nf"] - 1) // 5 + 1
    # decode with the real-codec path documents its absence loudly
    try:
        decode_images(assets, deterministic_fake=False).collect()
        raised = False
    except Exception:
        raised = True
    assert raised
