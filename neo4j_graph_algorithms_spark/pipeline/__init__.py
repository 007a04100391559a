"""Large-scale training-data pipeline operators.

Beyond the reference's graph suite, this package carries the operators a
100 TB training-data pipeline needs over the same engine: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
approximate nearest-neighbor search, text analysis (language id,
quality scores, token counts, fingerprints), and multimodal column
plumbing (binary payloads + typed metadata with Arrow-batched decode
stubs).
"""
