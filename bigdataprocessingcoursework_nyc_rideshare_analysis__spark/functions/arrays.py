"""Array-column combinatorics — JVM-side, no Python in the hot path.

``ordered_pairs`` is the basket-mining fan-out: all i<j element pairs of a
(sorted) array as an array of structs, built with nested
``transform(sequence(...))`` so the C(n,2) expansion runs MAP-SIDE inside
whole-stage codegen — the shape that replaces a keyed self-join wherever
per-key groups are small (baskets, audiences, posting lists, day series).
Callers bound n: the expansion is O(n²) per row by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_pairs(arr: Column | str, a_name: str = "a", b_name: str = "b") -> Column:
    """array<T> → array<struct<a_name: T, b_name: T>> of every i<j pair
    (1-based positions, so on a sorted input a ≤ b); empty for n < 2.

    Pairs are POSITIONAL: duplicate elements yield one pair per position
    combination, exactly as a self-join with ``left < right`` row identity
    would count them — callers wanting set semantics dedup the input array
    first (``collect_set``)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    n = F.size(c)
    return F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: F.struct(
                        F.element_at(c, i).alias(a_name),
                        F.element_at(c, j).alias(b_name),
                    ),
                ),
            )
        ),
    ).otherwise(F.array())
