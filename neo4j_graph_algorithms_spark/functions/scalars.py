"""Scalar helper functions — `algo.isFinite` / `algo.isInfinite` /
`algo.Infinity` / `algo.NaN` (`algo/.../IsFiniteFunc.java:27-47` — the
reference registers all four in the same class). Column-level wrappers
over Spark built-ins; exposed so procedure-parity callers find them by
name."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_finite(col: Column | str) -> Column:
    """True iff the value is non-null, not NaN, and not ±Infinity."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.isnan(c) & (c != float("inf")) & (c != float("-inf"))


def is_infinite(col: Column | str) -> Column:
    """True iff the value is +Infinity or -Infinity."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ((c == float("inf")) | (c == float("-inf")))


def infinity() -> Column:
    """`algo.Infinity()` (`IsFiniteFunc.java:39-42`): the double
    +Infinity constant — the reference's sentinel for unreachable
    distances, exposed so ported Cypher predicates keep working."""
    return F.lit(float("inf"))


def nan() -> Column:
    """`algo.NaN()` (`IsFiniteFunc.java:44-47`): the double NaN
    constant."""
    return F.lit(float("nan"))
