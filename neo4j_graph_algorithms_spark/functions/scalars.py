"""Scalar helper functions — `algo.isFinite` / `algo.isInfinite`
(`algo/.../IsFiniteFunc.java`). Column-level wrappers over Spark
built-ins; exposed so procedure-parity callers find them by name."""

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
