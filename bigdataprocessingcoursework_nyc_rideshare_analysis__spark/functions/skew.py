"""Skew mitigation: salted two-phase aggregation and salted replicated joins.

Real rideshare data is heavily skewed (Manhattan holds ~40% of trips,
SURVEY.md §7.4), so a single hot group key can serialize an entire stage.
Two standard remedies, expressed declaratively:

- ``salted_sum_count``: phase 1 aggregates on (key, salt) spreading each hot
  key over N reducers; phase 2 merges the partials.  Because counts and
  exact-decimal sums are associative and order-independent, the result is
  bit-identical to the unsalted aggregate — which is exactly how the oracle
  checks it (same plain-SQL oracle as the unsalted query).
- ``salted_join``: the fact side gets a random salt in [0, N); the
  (smallish) build side is exploded N× with every salt value; the join key
  becomes (key, salt).  Hot fact keys now hash to N partitions.

The salt itself is ``rand()``-based and non-deterministic — deliberately:
correctness must never depend on the salt, and these ops only compute
salt-invariant (associative) results.  AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``, on in ``session.py``) handles the same
problem reactively; explicit salting is for when you know the skew up front
or need it for aggregation, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS, col: str = "_salt") -> DataFrame:
    return df.withColumn(col, (F.rand() * buckets).cast("int"))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    count_alias: str = "trip_count",
    sum_alias: str = "total_value",
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-proof groupBy: exact-decimal sum + count per key.

    Phase 1 shuffles on (key, salt) — each hot key spreads over ``buckets``
    reducers; phase 2 shuffles only |keys|×buckets partial rows.
    """
    partial = (
        with_salt(df, buckets)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias(count_alias),
        F.sum("_s").cast("double").alias(sum_alias),
    )


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "left",
) -> DataFrame:
    """Skew-proof equi-join: salt the fact, replicate the build side across
    all salt values, join on (key, salt).  Build-side rows multiply by
    ``buckets`` — use only when the build side is small enough to replicate
    (else broadcast already wins)."""
    salted_fact = with_salt(fact, buckets)
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    cond = (salted_fact[fact_key] == replicated[build_key]) & (
        salted_fact["_salt"] == replicated["_salt"]
    )
    return (
        salted_fact.join(replicated, cond, how)
        .drop(salted_fact["_salt"])
        .drop(replicated["_salt"])
    )
