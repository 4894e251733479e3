"""Vector (embedding) column expressions — JVM-side, no Python in the hot path.

Quantized cosine
----------------
Cross-engine differential testing of floating-point vector math is fragile:
two engines summing 64 float products in different orders disagree in the
last bits, which breaks value-hash comparison.  We therefore compute
similarity over *quantized* components: ``floor(x * 1e6)`` as BIGINT.  Integer
dot products are exact and order-independent, so Spark and DuckDB produce
bit-identical cosines.  At 1e-6 resolution the quantization error on unit-ish
vectors is far below any ranking-relevant delta.

(For production ranking where cross-engine bit-equality is not required,
the un-quantized double path is a one-line swap: drop ``quantize_vec``.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize_vec(col: Column | str) -> Column:
    """array<float> → array<bigint> via floor(x * 1e6) (exact, deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors → bigint."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_q(a: Column) -> Column:
    """Exact integer squared norm of a quantized vector → bigint."""
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine similarity from exact integer dot/norms → double.

    All inputs to the final double arithmetic are identical BIGINTs in both
    engines, so the result is bit-identical too.
    """
    return (
        dot_q(a, b).cast("double")
        / (F.sqrt(norm_sq_q(a).cast("double")) * F.sqrt(norm_sq_q(b).cast("double")))
    )
