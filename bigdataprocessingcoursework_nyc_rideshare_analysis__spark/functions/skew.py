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

from pyspark.sql import Column, DataFrame, Window
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

    When to reach for this (measured, SCALE.md skew receipt): NOT for
    plain sum/count on a hot key — hash-aggregate partial combine already
    emits one partial row per (map task, key), so the hot key's reduce
    side receives |map tasks| rows whatever its traffic share and the
    salt only adds a second shuffle (measured near-parity/slower on a
    40%-hot key at 10M rows).  The salt pays off for aggregation STATES
    that don't compress map-side — collect_list/collect_set, exact
    distinct counts, large typed aggregators — where the hot key's full
    row volume otherwise lands on one reducer, and for the JOIN form
    (``salted_join``), where the receipt shows the up-front salt beating
    both the static plan and AQE's reactive split."""
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


def keyed_running_sum(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    alias: str,
    partitions: int | None = None,
    count_alias: str | None = None,
    total_alias: str | None = None,
) -> DataFrame:
    """Per-key running SUM(``value_col``) over ``order_cols`` WITHOUT
    ``Window.partitionBy(*keys)`` — the low-cardinality-key scale trap: with
    a handful of keys (sources, length buckets), a keyed window funnels each
    key's ENTIRE stream through one task, so parallelism is bounded by |keys|
    no matter how many executors exist.

    The keyed generalization of ``operators.events.
    range_partitioned_running_sum`` (round-6 verdict items 2-3):

    1. range-repartition on ``(*keys, *order_cols)`` — a key's rows now span
       MANY contiguous partitions, and within a key, higher partition id ⇒
       strictly later order range;
    2. aggregate per-(partition, key) value totals — at most
       |partitions| + |keys| rows, since only keys straddling a partition
       boundary appear twice;
    3. per key, prefix-sum those totals over partition id into offsets (the
       only keyed window — over ≤ |partitions| rows per key, not the data);
    4. broadcast the offsets back and add a partition-LOCAL running sum.

    Exact for integer/decimal values (sum algebra is order-free), so the
    result is independent of where the sampled range boundaries land.
    Requires non-null ``keys`` (the offset join is an inner equi-join) and a
    duplicate-free ``(*keys, *order_cols)`` tuple per row (a running sum has
    no defined per-row value on ties) — same contract as the global form.

    Plan honesty (read the executed plan, not this prose): Catalyst cannot
    know every ``spark_partition_id`` row already sits in one partition, so
    the local window adds an ENSURE_REQUIREMENTS hash exchange on
    ``(_pid, *keys)`` — the data moves twice (range + hash), but both
    exchanges carry only the scalar (keys, order, value) projection (callers
    compute lengths/weights BEFORE this helper; text never shuffles), and
    the hash key has ≈|partitions| + |keys| distinct values, so parallelism
    stays data-proportional.

    The range-partitioned frame is ``persist()``-pinned — REQUIRED for
    correctness, not a speed cache: the totals/offsets branch and the
    local-window branch otherwise each plan their OWN
    ``ShuffleExchange(RangePartitioning)`` instance, and
    ``RangePartitioner`` samples its bounds with an ``rdd.id``-derived
    seed, so the two instances can draw DIFFERENT boundaries (exchange
    reuse is not guaranteed across the broadcast/window shapes — measured
    at sf0.1: 0 ReusedExchange, offsets computed against boundaries the
    data leg doesn't have, row numbers off by ±|boundary drift| and not
    even a permutation).  The persist makes the cache manager serve both
    branches from ONE ``InMemoryRelation`` — one exchange instance, one
    boundary draw — and the result is then exact for ANY draw.  (At
    oracle-check scale the sampler degenerates to exact bounds — sample
    size ≥ rows — which is why sf0.01 hash gates never caught it.)
    ``persist`` over ``localCheckpoint`` because it is fully lazy: a
    checkpoint instantiates the physical plan at CONSTRUCTION time, which
    eagerly launches any broadcast-subtree jobs in the caller's input
    (pinned lazy in ``test_plans.py``).  The cached blocks hold only the
    narrow (keys, order, value) projection and are evicted LRU /
    released by the harness's ``clearCache`` between queries.

    ``count_alias`` / ``total_alias``: when set, the output additionally
    carries the per-key ROW COUNT / per-key TOTAL of ``value_col`` as a
    column of that name — computed from the same ≤(|partitions|+|keys|)-row
    totals frame the offsets come from (a second full-range window over
    the identical partition+order spec, so it shares the one Window node
    and the one broadcast).  Callers previously re-aggregated the INPUT
    for these (``.join(broadcast(df.groupBy(keys).count()))``), which
    re-executed the whole upstream subtree once more per leg — the r11
    entity-aggregate persists papered over that for some callers; this
    removes the second consumer outright.  Exact: counts are int64 sums;
    totals are the same order-free int/decimal algebra as the offsets."""
    from .cachectl import query_scoped_persist

    par = partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = query_scoped_persist(
        df.repartitionByRange(par, *keys, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    aggs = [F.sum(value_col).alias("_tot")]
    if count_alias is not None:
        aggs.append(F.count(F.lit(1)).alias("_cnt"))
    totals = parted.groupBy("_pid", *keys).agg(*aggs)
    w_off = (
        Window.partitionBy(*keys).orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = ["_pid", *keys, F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")]
    if count_alias is not None or total_alias is not None:
        # full-range frame over the SAME partition+order spec as w_off: the
        # per-key grand count/total, evaluated in the same Window node
        w_all = (
            Window.partitionBy(*keys)
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        if count_alias is not None:
            off_cols.append(F.sum("_cnt").over(w_all).alias(count_alias))
        if total_alias is not None:
            off_cols.append(F.sum("_tot").over(w_all).alias(total_alias))
    offsets = totals.select(*off_cols)
    w_local = (
        Window.partitionBy("_pid", *keys)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.join(F.broadcast(offsets), ["_pid", *keys])
        .withColumn(alias, F.col("_off") + F.sum(value_col).over(w_local))
        .drop("_pid", "_off")
    )


def keyed_row_number(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    alias: str,
    partitions: int | None = None,
    count_alias: str | None = None,
) -> DataFrame:
    """Per-key 1-based ROW_NUMBER over ``order_cols`` without the
    |keys|-bounded window: a running count is a running sum of 1s, and over
    a duplicate-free order the two are identical — so this is
    ``keyed_running_sum`` with a literal 1 value column.  Use for UNLIMITED
    rank windows (every rank consumed downstream); a rank window followed by
    ``rn <= k`` does NOT need this — Spark's WindowGroupLimit already pushes
    a partial top-k before the exchange (pinned in ``test_plans.py`` for
    ``source_quota_sample``).

    ``count_alias``: attach the per-key frame size as a column (see
    ``keyed_running_sum``) — ntile/value-at-rank callers need it and should
    take it from here instead of re-aggregating their input."""
    out = keyed_running_sum(
        df.withColumn("_one", F.lit(1)),
        keys,
        order_cols,
        "_one",
        alias,
        partitions,
        count_alias=count_alias,
    )
    return out.drop("_one")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    alias: str,
    partitions: int | None = None,
    count_alias: str | None = None,
    total_alias: str | None = None,
) -> DataFrame:
    """Running SUM over the GLOBAL order without the single-partition
    window — ``keyed_running_sum`` with no keys (the same algebra as
    ``operators.events.range_partitioned_running_sum``; kept here so the
    global and keyed forms share one implementation).  Exact for
    int/decimal values; ``order_cols`` must be duplicate-free.
    ``count_alias`` / ``total_alias`` attach the frame size / grand total
    (see ``keyed_running_sum``)."""
    return keyed_running_sum(
        df,
        [],
        order_cols,
        value_col,
        alias,
        partitions,
        count_alias=count_alias,
        total_alias=total_alias,
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    alias: str,
    partitions: int | None = None,
    count_alias: str | None = None,
) -> DataFrame:
    """1-based ROW_NUMBER over the GLOBAL order given by ``order_cols``
    without ``Window.orderBy(...)``'s single-partition funnel — the trap
    round-7 verdict item 4 swept the package for: an unpartitioned ordered
    window drags every row through ONE task, so any frame that grows with
    users/docs/customers serializes there no matter the cluster size.

    This is ``keyed_row_number`` with no keys: range-partition on the
    order, per-partition counts, prefix offsets over the ≤|partitions|-row
    totals (the only remaining single-partition window — P rows, not
    data), broadcast back, local running count.  Descending components are
    expressed by negating the column at the call site (exact for
    int/decimal/double sort keys).

    Ties: ``order_cols`` should be duplicate-free for well-defined per-row
    numbers (same contract as ``keyed_running_sum``).  With ties the
    result is still a valid 1..N permutation in which equal keys receive
    consecutive numbers in arbitrary order (range partitioning co-locates
    equal keys), so rank→VALUE selections (exact quantiles, data-defined
    bin edges) are unaffected — callers relying on that must say so.
    ``count_alias`` attaches the frame size (see ``keyed_running_sum``)."""
    return keyed_row_number(df, [], order_cols, alias, partitions, count_alias=count_alias)


def _idiv(a: Column, b: Column) -> Column:
    """Exact long integer division (SQL ``div``) — NOT ``floor(a / b)``,
    whose double intermediate silently loses precision past 2^53 rows.

    Precondition: NON-NEGATIVE operands.  SQL ``div`` truncates toward
    zero, so for a < 0 it differs from floor division (``-3 div 2 = -1``
    vs ``floor(-3/2) = -2``).  Both ``ntile_from_rn`` call sites pass
    row numbers / counts (provably ≥ 0); a reuse with signed inputs must
    implement true floor semantics instead."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def ntile_from_rn(rn: Column, n: Column, buckets: int) -> Column:
    """ANSI ``ntile(buckets)`` computed from a 1-based global row number and
    the frame size: the first ``n % buckets`` tiles take ``⌈n/buckets⌉``
    rows, the rest ``⌊n/buckets⌋`` — the exact rule Spark and DuckDB share,
    so pairing this with ``global_row_number`` is bit-identical to the
    window function while scaling past the single-partition sort.  All
    arithmetic is long integer division, so the equivalence holds for any
    frame size a long can count — not just below the 2^53 double mantissa."""
    base = _idiv(n, F.lit(buckets))  # ⌊n/buckets⌋ rows in the small tiles
    rem = n % buckets  # first `rem` tiles take one extra row
    big = rem * (base + 1)  # rows covered by the large tiles
    return F.when(rn <= big, _idiv(rn - 1, base + 1) + 1).otherwise(
        # reachable only when rn > big, which requires base >= 1 (with
        # base = 0 the first `rem` = n tiles cover every row), so the
        # greatest() guard never changes the value — it only keeps the
        # expression total under ANSI division semantics
        rem + _idiv(rn - big - 1, F.greatest(base, F.lit(1))) + 1
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
