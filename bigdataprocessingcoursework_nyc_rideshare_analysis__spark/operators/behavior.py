"""Behavioral analytics over the event stream: per-user event-type entropy
and the first-order Markov transition matrix.

No reference counterpart (SURVEY.md §2.9 extension tier — the events table
is our streaming-shaped addition).  Both are classic product-analytics /
user-modeling shapes:

- ``user_event_entropy``: Shannon entropy of each user's event-type
  distribution — the engagement-diversity signal.  Computed as
  ``ln N − (Σ c·ln c)/N`` from per-(user,type) counts, so the plan is two
  hash aggregations and nothing else; entropy is rounded once (12 dp) in
  both engines because JVM ``Math.log`` and C ``log`` may differ in the
  last ulp.
- ``event_transition_probs``: (prev_type → type) counts and row-normalized
  probabilities over each user's time-ordered stream.  One window (lag over
  user partitions, deterministically tie-broken on event_id) + one
  aggregation; |types|² output.  At 100 TB the window partitions by
  user_id — millions of small partitions, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_ENTROPY_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / SUM(c), 9) AS entropy
FROM per_type
GROUP BY user_id
"""


@register("user_event_entropy", oracle=_ENTROPY_ORACLE, tags=("events", "agg", "r4"))
def q_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement diversity: Shannon entropy (nats) of each user's
    event-type mix.  A user doing only one thing scores 0; uniform use of
    all types scores ln(n_types)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return per_type.groupBy("user_id").agg(
        n.cast("bigint").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        # 9 dp: the Σ c·ln c accumulation can drift past the 12th decimal
        # on active users (seen at sf0.1)
        F.round(
            F.log(n.cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))) / n,
            9,
        ).alias("entropy"),
    )


_TRANSITIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM pairs
"""


@register("event_transition_probs", oracle=_TRANSITIONS_ORACLE, tags=("events", "window", "r4"))
def q_event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    (prev → next) pair, the transition count and the probability normalized
    over the source state's outgoing mass.  The lag window orders by
    (ts, event_id) so simultaneous events resolve deterministically; the
    final normalization runs on the |types|²-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm)).alias("p"),
    )
