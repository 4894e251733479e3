"""Structured Streaming counterparts of the batch event operators.

The reference has no streaming surface; this module gives the engine one
(SURVEY.md §2.9 extension).  The same aggregation logic as
``operators.events`` expressed over an unbounded source:

- ``hourly_rollup_stream``: tumbling 1-hour windows with a watermark for late
  data; in append mode a window emits once the watermark passes its end.
- ``session_window_stream``: gap-based sessions via ``F.session_window`` —
  the streaming-native equivalent of the batch lag/running-sum sessionizer
  (state store managed, per-key timeout semantics built in).
- ``dedup_stream``: watermark-bounded exact dedup
  (``dropDuplicatesWithinWatermark``) — the ingestion-side guard for
  at-least-once sources.
- ``enrich_stream``: stream-static broadcast join (the streaming twin of the
  batch dimension enrichment).
- ``sink_partitioned_parquet``: ``foreachBatch`` partitioned-parquet sink
  with checkpointed exactly-once batch ids.

Tests drive these with ``trigger(availableNow=True)`` over a file source fed
from the events fixture and assert batch/stream parity — the core guarantee
that lets one logical definition serve both deployment modes.

Scale: streaming state is keyed by (window/session × key); watermarks bound
state size.  At 100 TB/day you shard by source partition and the state store
scales with *active* windows, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Windowed count/avg per (1-hour tumbling window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value"))
            .alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup: first occurrence of each key wins, duplicate
    arrivals within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — bounded state, unlike ``dropDuplicates`` on a stream,
    which retains every key forever.  This is the standard ingestion guard
    (at-least-once sources → effectively-once downstream); at 100 TB/day the
    state store holds ~horizon×rate keys, sharded by the dedup key."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id", dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static enrichment join: each micro-batch left-joins the static
    dimension (re-read per batch, so slowly-changing dims pick up updates).
    The dim side broadcasts — the streaming fact never shuffles for
    enrichment, the same invariant as the batch zone-lookup join."""
    return events.join(
        F.broadcast(dim), events[key] == dim[dim_key], "left"
    ).drop(dim_key)


def sink_partitioned_parquet(
    stream: DataFrame, path: str, checkpoint: str, partition_by: str = "event_type"
):
    """``foreachBatch`` sink: write each micro-batch as partitioned parquet.

    foreachBatch hands the micro-batch over as a *batch* DataFrame, so the
    full batch writer API applies (partitioning, bucketing, merges).
    foreachBatch itself is only at-least-once — a failed micro-batch is
    replayed from the checkpoint — so end-to-end exactly-once output needs
    the write to be IDEMPOTENT: each batch overwrites its own
    ``batch_id=<n>`` directory, making a replay a byte-identical re-write
    rather than a duplicate append.  Readers see ``batch_id`` as an extra
    hive-partition column.  Returns the started query handle (caller
    awaits)."""

    # closure over `path`: cloudpickle-by-value, same rule as every
    # function this package ships to workers
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").partitionBy(partition_by).parquet(
            f"{path}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session aggregation per user (streaming-native sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
        )
    )


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 HOUR",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase matched to the same user's clicks
    in the preceding ``horizon`` (attribution join).

    Both sides carry watermarks and the join predicate bounds event-time
    distance — together these let the state store evict a buffered row once
    the other stream's watermark passes its joinable range, so state is
    O(rate × horizon) instead of unbounded.  State shards by the equi-key
    (user_id); the range predicate is evaluated within each key's buffer.
    The batch twin (same predicate on static frames) is asserted equal in
    tests — one logical definition, both deployment modes.

    ``how="leftOuter"`` adds unmatched-click rows (null purchase columns)
    — the "clicks that never converted" side of attribution.  Outer
    results are withheld until BOTH watermarks pass the click's joinable
    range (only then is "no purchase arrived" final), so with a draining
    trigger the tail of the stream — rows the watermark never crosses —
    stays unemitted; the parity test models exactly that frontier."""
    c = clicks.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"user_id = p_user_id AND purchase_ts >= click_ts "
        f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
    )
    return c.join(p, cond, how).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"
    )


def latest_snapshot_version(target_path: str, before_batch: int | None = None) -> int | None:
    """Largest COMMITTED snapshot version under ``target_path`` (``v=<n>``
    directories containing the Hadoop committer's ``_SUCCESS`` marker), or
    None.  ``before_batch`` additionally bounds the version strictly below
    the given batch id — the replay guard: a torn ``v=<batch_id>`` directory
    left by a crashed attempt of the SAME batch is never read as input.

    Driver-side directory listing — correct for a filesystem target; on
    object storage at scale the version pointer lives in a manifest (the
    ``doc_shards`` committing-writer pattern) or a table format's log."""
    import os

    if not os.path.isdir(target_path):
        return None
    versions = []
    for d in os.listdir(target_path):
        if d.startswith("v=") and d[2:].isdigit():
            v = int(d[2:])
            if before_batch is not None and v >= before_batch:
                continue
            if os.path.exists(os.path.join(target_path, d, "_SUCCESS")):
                versions.append(v)
    return max(versions) if versions else None


def sink_merge_upsert(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    key: str,
    order_col: str | None = None,
):
    """Streaming CDC apply: ``foreachBatch`` MERGEs each micro-batch of
    change rows into a versioned parquet snapshot — the streaming half of
    ``operators.merge.merge_upsert`` (Delta/Iceberg's ``MERGE INTO`` stream
    sink, built on the same engine primitive).

    Exactly-once without a table format, from three pieces:

    - **Versioned snapshots**: batch N writes ``v=<N>`` reading from the
      latest *committed* version `` < N`` — never its own possibly-torn
      prior attempt, and never an uncommitted directory
      (``latest_snapshot_version``'s ``_SUCCESS`` gate).
    - **Idempotent replay**: re-running batch N reads the same input
      snapshot and the same (checkpoint-replayed) change rows, so the
      overwrite of ``v=<N>`` is byte-identical.
    - **In-batch last-writer-wins**: with ``order_col``, multiple changes
      to one key within a batch collapse to the row with the greatest
      (order_col) before merging (pinned tiebreak on the full row via the
      window's deterministic ordering); without it, batches are assumed
      key-unique (one CDC event per key per micro-batch).

    The merge itself is the batch operator — at 100 TB the target is
    bucketed by the merge key so only the (small) change set shuffles, and
    old versions are vacuumed by retention.

    **Checkpoint↔target coupling (1:1).** Snapshot versions ARE this
    checkpoint's batch ids, so a target directory belongs to exactly one
    checkpoint for its lifetime.  Pointing a NEW checkpoint at an existing
    target would restart batch ids at 0, making every committed snapshot
    invisible to ``before_batch`` and silently re-initializing the table
    from bare change rows (while readers still see the stale higher
    version).  ``apply_batch`` fails fast on the detectable form — a
    committed version strictly greater than the current batch id, which no
    legitimate replay can produce (batch N replays read versions < N and
    overwrite exactly v=N; versions > N commit only after N is in the
    checkpoint).  The residual ambiguity — a fresh checkpoint at batch 0
    meeting a target holding only ``v=0`` — is indistinguishable from a
    crash-replay of batch 0 and stays the operator's contract to avoid."""
    from pyspark.sql import Window

    from ..operators.merge import merge_upsert

    # runs on the DRIVER (foreachBatch hands over a batch DataFrame), so
    # module references — unlike worker-shipped closures — are safe here
    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        changes = batch_df
        if order_col is not None:
            w = Window.partitionBy(key).orderBy(F.desc(order_col))
            changes = (
                changes.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        ahead = latest_snapshot_version(target_path)
        if ahead is not None and ahead > batch_id:
            raise RuntimeError(
                f"sink_merge_upsert: target {target_path!r} already holds "
                f"committed snapshot v={ahead} > current batch {batch_id} — "
                "the checkpoint's batch-id sequence is behind the target's "
                "version history (most likely a NEW checkpoint pointed at an "
                "existing target). Refusing to silently re-seed the table; "
                "use the original checkpoint or a fresh target directory."
            )
        prev = latest_snapshot_version(target_path, before_batch=batch_id)
        if prev is not None:
            target = sp.read.parquet(f"{target_path}/v={prev}")
            merged = merge_upsert(target, changes, key)
        else:
            merged = changes
        merged.write.mode("overwrite").parquet(f"{target_path}/v={batch_id}")

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
