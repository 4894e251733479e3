"""Shared scalar/aggregate column expressions.

Exact money math
----------------
The reference accumulates money in FLOAT (``codes/task2.py:73-74``) or lets
Spark implicitly cast strings to double (``codes/task3.py:112``), so its
totals depend on partition order.  Our engine sums money through
``DECIMAL(18,2)`` — exact and order-independent — and only converts the final
total to DOUBLE.  Two engines (Spark and the DuckDB oracle) computing the
same exact decimal sum produce bit-identical doubles, which is what makes
hash-based differential testing viable; at 100 TB it also means a re-run with
different partitioning reports the same revenue to the cent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, alias: str, scale: str = "decimal(18,2)") -> Column:
    """Order-independent SUM over a money column: decimal-exact, then double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str, scale: str = "decimal(18,2)") -> Column:
    """Order-independent AVG: exact decimal SUM / COUNT, evaluated in double.

    (Spark's ``avg(decimal)`` widens to a decimal result type that differs
    from DuckDB's ``avg`` → double; dividing the exact sum ourselves keeps
    both engines on the identical double.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(scale)).cast("double") / F.count(c)).alias(alias)


def route_label(pickup: Column | str, dropoff: Column | str) -> Column:
    """``"<pickup> to <dropoff>"`` route label (``codes/task3.py:109``,
    ``codes/task7.py:79``)."""
    p = F.col(pickup) if isinstance(pickup, str) else pickup
    d = F.col(dropoff) if isinstance(dropoff, str) else dropoff
    return F.concat_ws(" to ", p, d)
