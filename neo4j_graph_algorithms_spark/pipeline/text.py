"""Text analysis operators — language id, quality scoring, token
counting, document fingerprinting.

All pure column-expression pipelines (whole-stage codegen, zero Python
in the row path) — these run at scan speed and their filters push down.
`__spark_entry__` carries oracle-twinned copies of several of these;
this module is the engine-surface home (richer options, same math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "de": [" der ", " und ", " die ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " los ", " las ", " una ", " es "],
}


def _occurrences(col: Column, pat: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit("")))) / len(pat)


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_score): stopword n-gram heuristic — argmax
    of per-language stopword hit counts, deterministic tie-break."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scored = docs.select(
        F.col(id_col),
        *[
            sum(_occurrences(padded, p) for p in pats).alias(f"s_{lang}")
            for lang, pats in STOPWORDS.items()
        ],
    )
    pairs = F.array(*[
        F.struct(F.col(f"s_{lang}").alias("s"), F.lit(lang).alias("lang"))
        for lang in STOPWORDS
    ])
    best = F.sort_array(pairs, asc=False)[0]
    return scored.select(
        id_col, best["lang"].alias("lang_pred"), best["s"].alias("lang_score")
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap quality heuristics per document: length, char-class
    ratios, mean word length, stopword density — the standard pre-train
    filter features."""
    t = F.col(text_col)
    ln = F.greatest(F.length(t), F.lit(1))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(_occurrences(padded, p) for p in STOPWORDS["en"])
    return docs.select(
        id_col,
        F.length(t).alias("n_chars"),
        F.size(words).alias("n_words"),
        (F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / ln).alias("alpha_ratio"),
        (F.length(F.regexp_replace(t, "[^0-9]", "")) / ln).alias("digit_ratio"),
        (F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / ln).alias("punct_ratio"),
        (F.length(F.regexp_replace(t, "[^ ]", "")) / ln).alias("space_ratio"),
        ((ln - F.length(F.regexp_replace(t, r"\s", ""))) / n_words).alias("mean_gap"),
        (F.length(t) / n_words).alias("mean_word_len"),
        (stop_hits / n_words).alias("stopword_density"),
    )


def token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens). `mode="whitespace"` splits on \\s+;
    `mode="bpe_ish"` counts GPT-style pre-tokenizer pieces (word chunks,
    number runs, punctuation runs — the standard proxy when the real
    BPE vocab isn't available) via regexp extraction."""
    t = F.trim(F.col(text_col))
    if mode == "whitespace":
        n = F.size(F.split(t, r"\s+"))
    else:
        # contiguous letter runs | digit runs | single non-space symbol
        n = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.select(id_col, n.alias("n_tokens"))


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    head: int = 256,
) -> DataFrame:
    """(id, fingerprint): min rolling-window hash over the first `head`
    chars — the winnowing-style representative fingerprint used for
    cheap copy detection; identical docs share it, near-identical docs
    collide with high probability."""
    h = F.substring(F.col(text_col), 1, head)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(h) - (window - 1), F.lit(1))),
        lambda i: F.md5(h.substr(i, F.lit(window))),
    )
    return docs.select(id_col, F.array_min(shingles).alias("fingerprint"))


# explicit ASCII punctuation ranges — used instead of \p{Punct} so the
# filter semantics are identical across engines (Java's \p{Punct} and
# RE2's [[:punct:]] agree on ASCII but this makes the set explicit)
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def filter_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_chars: int = 200,
    max_chars: int = 1_000_000,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    max_digit_ratio: float = 0.3,
    max_punct_ratio: float = 0.3,
    min_stopword_density: float = 0.0,
    languages: tuple[str, ...] | None = None,
) -> DataFrame:
    """Composite pre-train corpus filter — the standard quality gate a
    training-data pipeline runs before tokenization, as ONE projection
    over the document scan (pure column expressions: whole-stage
    codegen, no shuffle, filters push down to the parquet scan when the
    caller filters on ``keep``).

    Returns one row per document:
    ``(id, n_chars, n_tokens, alpha_ratio, digit_ratio, punct_ratio,
    stopword_density, lang_pred, reject_reason, keep)`` where
    ``reject_reason`` is the FIRST failing rule in the documented order
    (length → tokens → char-class ratios → stopword density → language)
    and ``keep = reject_reason IS NULL``. Keeping rejected rows with the
    reason (rather than filtering) is deliberate: at 100 TB the reject
    histogram is the pipeline's primary quality dashboard, and the kept
    subset is a trivial ``filter(keep)`` that Catalyst pushes down.
    """
    t = F.col(text_col)
    ln = F.greatest(F.length(t), F.lit(1))
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / ln
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")) / ln
    punct = (
        F.length(t) - F.length(F.regexp_replace(t, _PUNCT_CLASS, ""))
    ) / ln
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_density = sum(_occurrences(padded, p) for p in STOPWORDS["en"]) / F.greatest(
        n_tokens, F.lit(1)
    )
    lang_pred = F.sort_array(
        F.array(*[
            F.struct(
                sum(_occurrences(padded, p) for p in pats).alias("s"),
                F.lit(lang).alias("lang"),
            )
            for lang, pats in STOPWORDS.items()
        ]),
        asc=False,
    )[0]["lang"]

    reason = (
        F.when(F.col("n_chars") < min_chars, "too_short")
        .when(F.col("n_chars") > max_chars, "too_long")
        .when(F.col("n_tokens") < min_tokens, "too_few_tokens")
        .when(F.col("n_tokens") > max_tokens, "too_many_tokens")
        .when(F.col("alpha_ratio") < min_alpha_ratio, "low_alpha")
        .when(F.col("digit_ratio") > max_digit_ratio, "high_digit")
        .when(F.col("punct_ratio") > max_punct_ratio, "high_punct")
        .when(F.col("stopword_density") < min_stopword_density, "low_stopword_density")
    )
    if languages is not None:
        reason = reason.when(
            ~F.col("lang_pred").isin(*languages), "wrong_language"
        )
    reason = reason.otherwise(F.lit(None).cast("string"))

    return (
        docs.select(
            F.col(id_col).alias("id"),
            n_chars.alias("n_chars"),
            n_tokens.alias("n_tokens"),
            alpha.alias("alpha_ratio"),
            digit.alias("digit_ratio"),
            punct.alias("punct_ratio"),
            stop_density.alias("stopword_density"),
            lang_pred.alias("lang_pred"),
        )
        .withColumn("reject_reason", reason)
        .withColumn("keep", F.col("reject_reason").isNull())
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Output (doc_id, rank, term, tf, df, score): rank 1..k per doc.

    Scoring contract — chosen for ENGINE-EXACT reproducibility: the
    selection score is the rational ``tf · (N+1)/(df+1)`` (tf-
    proportional inverse document frequency without the log): both
    engines compute it with the same two IEEE double ops, so ranking
    (score DESC, term ASC) is bit-identical across Spark and any SQL
    oracle — a log-idf score differs in the last ulp between libm
    implementations and can flip near-ties. The log variant orders
    (tf, df) pairs differently in general; for keyword EXTRACTION the
    rational form is an accepted idf flavor (raw idf), and the exported
    ``score`` column makes the contract explicit.

    Scale shape: two hash aggregations (tf on (doc, term), df on term)
    + one join on term + one per-doc window — the term dimension is
    shuffle-joined (broadcastable when the vocabulary is small), the
    window is by-doc (never global).
    """
    from pyspark.sql.window import Window

    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id", "term", "tf", "df",
        (F.col("tf") * F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1.0))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def repeated_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-repeated word n-grams: (ngram, df) with df = number of
    DISTINCT documents containing the n-gram, df ≥ min_df — the
    boilerplate/template detector (license headers, navigation chrome,
    repeated spans) a pre-train corpus audit runs before dedup.

    Pure column algebra: tokenize once, slide an index sequence over
    the token array (`transform` + `slice` + `array_join` — no UDF,
    no per-row Python), DISTINCT per doc, one hash aggregation. The
    distinct + groupBy shuffles on the ngram string; a df-heavy
    "stop-gram" (every doc shares it) is just a large COUNT, never a
    fan-out — this operator is linear where the pair-join dedups are
    quadratic, which is why the audit runs first.
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.array_join(F.slice(w, i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ngram"),
    ).distinct()
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )
