"""Deterministic corpus sampling — hash-ordered, no RNG state.

Training-data pipelines subsample constantly (debug slices, eval
holdouts, per-stratum balancing). ``df.sample()`` is seed-dependent on
partitioning and unrepeatable across cluster sizes; these operators
instead derive a pseudo-random ORDER from a multiplicative hash of the
id — a pure column expression, so a sample is reproducible bit-for-bit
on any cluster size, re-runnable incrementally, and expressible in any
SQL engine (the driver oracles run the identical formula in DuckDB).

The shuffle key is Knuth's multiplicative hash reduced mod a prime:
``((id mod P) * 2654435761) mod P`` with P = 1e9+7 — the mod-P first
keeps the product under 2^62, so ANSI-mode Spark (which THROWS on
bigint overflow) and DuckDB both evaluate it exactly. Ids are assumed
non-negative (`pmod` guards Spark; document ids here are).

- ``hash_sample``: Bernoulli-style fraction sample — a pure FILTER
  (keep iff shuffle_key < fraction·P): no shuffle, no state, pushes
  down to the scan. The 100 TB shape: sampling is free.
- ``stratified_sample``: exactly min(n, |stratum|) rows per key via a
  per-key window over the hash order (deterministic tie-break on id) —
  one shuffle on the stratum key, the same exchange any per-key
  aggregation pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Knuth multiplicative constant and the reduction prime. Shared with
#: the driver oracles — change either and every recorded sample moves.
KNUTH = 2654435761
PRIME = 1_000_000_007


def shuffle_key(id_col):
    """Deterministic pseudo-random order key in [0, PRIME)."""
    return F.pmod(F.pmod(id_col, F.lit(PRIME)) * F.lit(KNUTH), F.lit(PRIME))


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~fraction of rows, deterministically: a pure filter."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(shuffle_key(F.col(id_col)) < int(fraction * PRIME))


def stratified_sample(
    df: DataFrame,
    key_cols: list[str],
    n_per_key: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(n_per_key, stratum size) rows per key, chosen by the
    hash order (id as the tie-break, so the pick is total and stable)."""
    if n_per_key < 1:
        raise ValueError(f"n_per_key must be >= 1, got {n_per_key}")
    w = Window.partitionBy(*key_cols).orderBy(
        shuffle_key(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_key)
        .drop("_rn")
    )
