"""Batch/stream parity: the streaming hourly rollup over a file source must
produce exactly the batch result once the stream drains (availableNow)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.events import q_events_hourly
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
    hourly_rollup_stream,
    session_window_stream,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    """Events fixture rewritten as a normal (micro-second) parquet dir that a
    file-source stream can read."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain_or_stop(q, expected_input_rows, timeout_s=120.0):
    """Wait for an availableNow query to finish, but do not pay its full
    termination timeout: queries whose stateful operator armed
    processing-time timers (the ttl_s forms) keep scheduling batches to
    service future timeouts after all files are consumed, so
    ``awaitTermination(timeout)`` blocks for the WHOLE timeout (measured:
    the two ttl tests were 181 s + 120 s of pure wait).  Progress rows are
    posted after each batch COMMITS, so once the summed numInputRows
    reaches the expected total, every input batch is committed (and the
    memory sink final for our asserts) — stop the query then."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if not q.isActive:
            return
        done = sum(p["numInputRows"] for p in q.recentProgress)
        if done >= expected_input_rows:
            break
        time.sleep(0.25)
    else:
        raise AssertionError(
            f"stream did not consume {expected_input_rows} rows in {timeout_s}s: "
            f"{[p['numInputRows'] for p in q.recentProgress]}"
        )
    q.stop()
    q.awaitTermination(30)


def _drain(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_hourly_matches_batch(spark, event_stream_dir):
    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    stream_src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    result = _drain(spark, hourly_rollup_stream(stream_src), "hourly_stream")

    batch = q_events_hourly(spark, SF_SMOKE)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["avg_value"]) for r in result.collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["avg_value"]) for r in batch.collect()
    }
    assert got == want


def test_stateful_running_totals_match_batch(spark, event_stream_dir):
    """After the stream drains, the last emitted totals per event_type must
    equal the batch aggregate over the same data."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        running_totals_stream,
    )

    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    stream_src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    q = (
        running_totals_stream(stream_src)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit once per micro-batch; keep the last row per key
    emitted = spark.table("running_totals").toPandas()
    last = {r.event_type: r for r in emitted.itertuples()}

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
    )
    for r in batch.collect():
        got = last[r["event_type"]]
        assert got.n_events == r["n"]
        assert abs(got.total_value - r["s"]) < 1e-6 * max(1.0, abs(r["s"]))
        assert got.max_value == r["m"]


def test_transform_with_state_contract(spark, event_stream_dir):
    """The transformWithStateInPandas (stateful v2) surface has ONE
    environment-dependent contract, and this test asserts whichever branch
    the environment provides — it never skips:

    - protobuf present: the v2 processor must emit the same final totals as
      the applyInPandasWithState op and the batch aggregate (one state
      machine, three execution surfaces);
    - protobuf absent (this container): the op must fail fast at plan-BUILD
      time with an actionable ImportError naming the dependency and the
      tested v1 fallback — not crash the streaming runner mid-query."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        running_totals_tws_stream,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            running_totals_tws_stream(load_table(spark, SF_SMOKE, "events"))
        return

    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    stream_src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    q = (
        running_totals_tws_stream(stream_src)
        .writeStream.format("memory")
        .queryName("running_totals_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("running_totals_tws").toPandas()
    last = {r.event_type: r for r in emitted.itertuples()}

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
    )
    for r in batch.collect():
        got = last[r["event_type"]]
        assert got.n_events == r["n"]
        assert abs(got.total_value - r["s"]) < 1e-6 * max(1.0, abs(r["s"]))
        assert got.max_value == r["m"]


def test_streaming_dedup_drops_duplicates(spark):
    """A doubled fixture (every event written twice) must drain to exactly
    the batch-distinct row set."""
    import tempfile

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import dedup_stream

    ev = load_table(spark, SF_SMOKE, "events")
    d = tempfile.mkdtemp(prefix="events_dup_")
    try:
        ev.union(ev).write.mode("overwrite").parquet(d)
        stream_src = spark.readStream.schema(ev.schema).parquet(d)
        q = (
            dedup_stream(stream_src)
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("dedup_stream")
        assert got.count() == ev.count()
        assert got.select("event_id").distinct().count() == ev.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_static_enrichment_matches_batch(spark, event_stream_dir):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import enrich_stream

    ev = load_table(spark, SF_SMOKE, "events")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    stream_src = spark.readStream.schema(ev.schema).parquet(event_stream_dir)
    result = _drain_append(spark, enrich_stream(stream_src, cust), "enriched_stream")
    batch = ev.join(cust, ev["user_id"] == cust["c_custkey"], "left").drop("c_custkey")
    got = {(r["event_id"], r["c_mktsegment"]) for r in result.collect()}
    want = {(r["event_id"], r["c_mktsegment"]) for r in batch.collect()}
    assert got == want


def test_foreachbatch_parquet_sink_roundtrip(spark, event_stream_dir):
    import tempfile

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        sink_partitioned_parquet,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    out = tempfile.mkdtemp(prefix="stream_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        stream_src = spark.readStream.schema(ev.schema).parquet(event_stream_dir)
        q = sink_partitioned_parquet(stream_src, out, ckpt)
        q.awaitTermination(120)
        written = spark.read.parquet(out)
        assert written.count() == ev.count()
        # partition column survives round-trip (hive-style directory layout)
        assert set(written.select("event_type").distinct().toPandas()["event_type"]) == set(
            ev.select("event_type").distinct().toPandas()["event_type"]
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _drain_append(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_session_window_runs(spark, event_stream_dir):
    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    stream_src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    result = _drain(spark, session_window_stream(stream_src), "session_stream")
    rows = result.collect()
    assert rows
    # sessions are per-user and well-formed
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_stream_stream_interval_join_matches_batch(spark, event_stream_dir):
    """Click→purchase attribution join: streaming result with availableNow
    must equal the same predicate applied to static frames."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        interval_join_stream,
    )

    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    clicks_s = src.filter(F.col("event_type") == "click")
    purchases_s = src.filter(F.col("event_type") == "purchase")
    q = (
        interval_join_stream(clicks_s, purchases_s)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"]) for r in spark.table("ss_join").collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purchases_b = ev.filter(F.col("event_type") == "purchase")
    want = {
        (r["click_id"], r["purchase_id"])
        for r in interval_join_stream(clicks_b, purchases_b).collect()
    }
    assert got == want and got


def test_stream_stream_left_outer_join_emits_final_unmatched(spark, event_stream_dir):
    """leftOuter attribution: unmatched clicks must surface with null
    purchase columns — but only once the watermark makes 'no purchase
    arrived' FINAL.  The assertion models that frontier explicitly: with
    horizon 1h and watermark 2h, a click is decidable iff
    click_ts + 3h < max(ts); matched pairs must equal the batch inner
    join, emitted nulls must be exactly the decidable batch-unmatched
    clicks (tail clicks stay open — emitting them early would be wrong)."""
    import datetime

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        interval_join_stream,
    )

    batch_schema = load_table(spark, SF_SMOKE, "events").schema
    src = spark.readStream.schema(batch_schema).parquet(event_stream_dir)
    q = (
        interval_join_stream(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "purchase"),
            how="leftOuter",
        )
        .writeStream.format("memory")
        .queryName("ss_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("ss_left_join").collect()
    got_matched = {(r["click_id"], r["purchase_id"]) for r in rows if r["purchase_id"] is not None}
    got_nulls = {r["click_id"] for r in rows if r["purchase_id"] is None}

    ev = load_table(spark, SF_SMOKE, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purchases_b = ev.filter(F.col("event_type") == "purchase")
    inner_b = interval_join_stream(clicks_b, purchases_b).collect()
    want_matched = {(r["click_id"], r["purchase_id"]) for r in inner_b}
    assert got_matched == want_matched

    # the query watermark is the MIN over both inputs' (max event ts − delay);
    # a click is decidable once that watermark passes click_ts + horizon
    max_c = clicks_b.agg(F.max("ts")).collect()[0][0]
    max_p = purchases_b.agg(F.max("ts")).collect()[0][0]
    frontier = min(max_c, max_p) - datetime.timedelta(hours=3)  # 2h delay + 1h horizon
    # exact boundary ties depend on the engine's strict-vs-inclusive
    # comparison and watermark truncation — assert the band, not the tie
    margin = datetime.timedelta(minutes=5)
    matched_clicks = {r["click_id"] for r in inner_b}
    unmatched = {r["event_id"]: r["ts"] for r in clicks_b.collect()
                 if r["event_id"] not in matched_clicks}
    must_emit = {cid for cid, ts in unmatched.items() if ts < frontier - margin}
    may_emit = {cid for cid, ts in unmatched.items() if ts < frontier + margin}
    assert must_emit and must_emit <= got_nulls <= may_emit
    # no matched click may ever appear as an unmatched-null row
    assert not (got_nulls & matched_clicks)


def test_custom_streaming_source_matches_batch(spark):
    """The custom Python DataSource's stream reader must emit, across
    micro-batches (offset advance → partition planning → Arrow reads →
    commit), exactly the rows its batch reader produces in one shot."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.pydatasource import (
        SOURCE_NAME,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    n_docs = 100
    batch = (
        spark.read.format(SOURCE_NAME).option("n_docs", n_docs).option("partitions", 4).load()
    )
    stream = (
        spark.readStream.format(SOURCE_NAME)
        .option("n_docs", n_docs)
        .option("partitions", 4)
        .option("batch_docs", 30)  # forces ≥4 micro-batches
        .load()
    )
    ckpt = tempfile.mkdtemp(prefix="pyds_stream_ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("pyds_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["doc_id"], r["text"]) for r in spark.table("pyds_stream").collect()
        }
        want = {(r["doc_id"], r["text"]) for r in batch.collect()}
        assert got == want and len(got) == n_docs
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_sink_checkpoint_restart_no_duplicates(spark):
    """Restarting the foreachBatch parquet sink from its checkpoint after new
    data arrives must append ONLY the new micro-batches: already-committed
    batch ids are skipped on replay, and each batch overwrites its own
    batch_id directory (the idempotence that upgrades at-least-once replay
    to exactly-once output)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        sink_partitioned_parquet,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(200).cache()
    first = ev.limit(120)
    second = ev.subtract(first)
    src = tempfile.mkdtemp(prefix="restart_src_")
    out = tempfile.mkdtemp(prefix="restart_out_")
    ckpt = tempfile.mkdtemp(prefix="restart_ckpt_")
    try:
        first.write.mode("append").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = sink_partitioned_parquet(stream, out, ckpt)
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == first.count()

        second.write.mode("append").parquet(src)  # new files, same checkpoint
        stream2 = spark.readStream.schema(ev.schema).parquet(src)
        q2 = sink_partitioned_parquet(stream2, out, ckpt)
        q2.awaitTermination(120)
        written = spark.read.parquet(out)
        assert written.count() == ev.count()  # no re-appended first batch
        assert written.select("event_id").distinct().count() == ev.count()
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_sink_crash_replay_overwrites_torn_batch(spark):
    """Exactly-once closure for the foreachBatch parquet sink: a crash AFTER
    a partial batch write but BEFORE the checkpoint commit must leave no
    trace once the query restarts.

    Simulated precisely at the at-least-once seam: run batch 0 to
    completion, append new source data, then plant a TORN output directory
    for the upcoming batch id (a corrupted subset of its rows, values
    poisoned to -999) without committing anything to the checkpoint — the
    exact on-disk state a mid-batch kill leaves.  On restart the file
    source re-plans the uncommitted files into that batch id and the
    ``mode("overwrite")`` per-``batch_id`` write replaces the torn
    directory wholesale, so the final output equals the clean two-batch
    run row-for-row and the poison rows are gone."""
    import os

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        sink_partitioned_parquet,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(200).cache()
    first = ev.limit(120)
    second = ev.subtract(first)
    src = tempfile.mkdtemp(prefix="crash_src_")
    out = tempfile.mkdtemp(prefix="crash_out_")
    ckpt = tempfile.mkdtemp(prefix="crash_ckpt_")
    try:
        first.write.mode("append").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = sink_partitioned_parquet(stream, out, ckpt)
        q.awaitTermination(120)

        # new data arrives; the NEXT batch id is (last committed + 1)
        second.write.mode("append").parquet(src)
        next_batch = max(int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
                         if f.isdigit()) + 1

        # plant the torn write: a partial, corrupted slice of the upcoming
        # batch under its batch_id dir — no checkpoint commit for it exists
        torn = second.limit(7).withColumn("value", F.lit(-999.0))
        torn.write.mode("overwrite").partitionBy("event_type").parquet(
            f"{out}/batch_id={next_batch}"
        )
        assert spark.read.parquet(out).filter(F.col("value") == -999.0).count() > 0

        stream2 = spark.readStream.schema(ev.schema).parquet(src)
        q2 = sink_partitioned_parquet(stream2, out, ckpt)
        q2.awaitTermination(120)

        recovered = spark.read.parquet(out)
        assert recovered.filter(F.col("value") == -999.0).count() == 0  # torn rows gone
        assert recovered.count() == ev.count()
        assert recovered.select("event_id").distinct().count() == ev.count()
        # row-for-row identical to the source frame (order-insensitive)
        assert recovered.select(*ev.columns).exceptAll(ev).count() == 0
        assert ev.exceptAll(recovered.select(*ev.columns)).count() == 0
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_cdc_merge_snapshots(spark):
    """Streaming MERGE sink: change batches fold into versioned snapshots,
    and the final snapshot equals the batch-applied merge of all changes in
    arrival order (updates win, inserts land, untouched rows survive)."""
    import os

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.merge import merge_upsert
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        latest_snapshot_version,
        sink_merge_upsert,
    )

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).limit(100).cache()
    schema = cust.schema
    batch1 = cust  # initial load: all inserts
    batch2 = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .select("c_custkey", "c_name", F.lit("CHANGED").alias("c_mktsegment"))
        .union(
            cust.limit(3).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("new row").alias("c_name"),
                F.lit("FRESH").alias("c_mktsegment"),
            )
        )
    )
    src = tempfile.mkdtemp(prefix="cdc_src_")
    out = tempfile.mkdtemp(prefix="cdc_out_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    try:
        batch1.write.mode("append").parquet(src)
        q = sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q.awaitTermination(120)
        v1 = latest_snapshot_version(out)
        assert v1 is not None
        assert spark.read.parquet(f"{out}/v={v1}").count() == 100

        batch2.write.mode("append").parquet(src)
        q2 = sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q2.awaitTermination(120)
        v2 = latest_snapshot_version(out)
        assert v2 is not None and v2 > v1

        got = spark.read.parquet(f"{out}/v={v2}")
        expected = merge_upsert(batch1, batch2, "c_custkey")
        assert got.count() == 103  # 100 originals + 3 inserts
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
        assert got.filter(F.col("c_mktsegment") == "CHANGED").count() == 20
        assert got.filter(F.col("c_mktsegment") == "FRESH").count() == 3
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_cdc_merge_rejects_foreign_checkpoint(spark):
    """Replay-guard coupling: pointing a NEW checkpoint at a target that
    already holds committed snapshots restarts batch ids at 0, which would
    make every committed version invisible to ``before_batch`` and silently
    re-seed the table from bare change rows.  The sink must fail fast on
    the detectable form (committed version > current batch id), not
    re-initialize."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        latest_snapshot_version,
        sink_merge_upsert,
    )

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).limit(20).cache()
    schema = cust.schema
    src = tempfile.mkdtemp(prefix="cdc_src_")
    out = tempfile.mkdtemp(prefix="cdc_out_")
    ckpt1 = tempfile.mkdtemp(prefix="cdc_ckpt_")
    ckpt2 = tempfile.mkdtemp(prefix="cdc_ckpt2_")
    try:
        # two batches through checkpoint 1 → committed v=0 and v=1
        cust.write.mode("append").parquet(src)
        sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt1, key="c_custkey"
        ).awaitTermination(120)
        cust.limit(5).select(
            "c_custkey", "c_name", F.lit("CHANGED").alias("c_mktsegment")
        ).write.mode("append").parquet(src)
        sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt1, key="c_custkey"
        ).awaitTermination(120)
        v = latest_snapshot_version(out)
        assert v is not None and v >= 1

        # a FRESH checkpoint on the same target restarts batch ids at 0:
        # the guard must abort the query instead of re-seeding v=0
        q = sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt2, key="c_custkey"
        )
        with pytest.raises(Exception, match="behind the target's version history"):
            q.awaitTermination(120)
        # the committed history is untouched
        assert latest_snapshot_version(out) == v
        assert spark.read.parquet(f"{out}/v={v}").count() == 20
    finally:
        for d in (src, out, ckpt1, ckpt2):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_cdc_merge_crash_replay_ignores_torn_snapshot(spark):
    """Replay guard: a torn (uncommitted) snapshot directory from a crashed
    attempt is invisible both to the reader helper and to the replayed
    batch, which rebuilds it from the last COMMITTED version."""
    import os

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        latest_snapshot_version,
        sink_merge_upsert,
    )

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).limit(50).cache()
    schema = cust.schema
    updates = cust.select(
        "c_custkey", "c_name", F.lit("CHANGED").alias("c_mktsegment")
    ).limit(10)
    src = tempfile.mkdtemp(prefix="cdc2_src_")
    out = tempfile.mkdtemp(prefix="cdc2_out_")
    ckpt = tempfile.mkdtemp(prefix="cdc2_ckpt_")
    try:
        cust.write.mode("append").parquet(src)
        q = sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q.awaitTermination(120)
        committed = latest_snapshot_version(out)

        # new changes arrive; plant a TORN snapshot for the upcoming batch:
        # poisoned rows, _SUCCESS removed — the state a mid-write kill leaves
        updates.write.mode("append").parquet(src)
        next_batch = max(
            int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
        ) + 1
        cust.withColumn("c_mktsegment", F.lit("TORN")).write.mode("overwrite").parquet(
            f"{out}/v={next_batch}"
        )
        os.remove(f"{out}/v={next_batch}/_SUCCESS")
        assert latest_snapshot_version(out) == committed  # torn dir invisible

        q2 = sink_merge_upsert(
            spark.readStream.schema(schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q2.awaitTermination(120)
        v = latest_snapshot_version(out)
        assert v == next_batch
        got = spark.read.parquet(f"{out}/v={v}")
        assert got.filter(F.col("c_mktsegment") == "TORN").count() == 0
        assert got.filter(F.col("c_mktsegment") == "CHANGED").count() == 10
        assert got.count() == 50
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_pipeline_end_to_end_with_crash_replay(spark):
    """The streaming ops COMPOSED as one pipeline — watermarked exact
    dedup → stream-static broadcast enrichment → tumbling hourly rollup →
    idempotent partitioned sink — driven across two restarts with a torn
    batch planted between them.  Per-op tests pin each stage; this pins
    that the stages compose in a single query plan and that end-to-end
    output equals the identical BATCH composition, byte-for-byte, after
    crash recovery."""
    import os

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        dedup_stream,
        enrich_stream,
        sink_partitioned_parquet,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(300).cache()
    doubled = ev.union(ev)  # at-least-once source duplicates
    dim = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")

    def pipeline(stream_df):
        # bronze -> silver: dedup + enrich emit rows immediately (the gold
        # windowed rollup runs as BATCH over the silver sink below — open
        # windows never emit under append mode at drain, so a streaming
        # aggregation here would hold everything in state)
        deduped = dedup_stream(stream_df, keys=["event_id"], watermark="30 days")
        return enrich_stream(deduped, dim, key="user_id", dim_key="c_custkey").select(
            "event_id", "ts", "c_mktsegment"
        )

    # batch twin: distinct events -> same join -> same rollup
    batch = (
        ev.dropDuplicates(["event_id"])
        .join(F.broadcast(dim), ev["user_id"] == dim["c_custkey"], "left")
        .drop("c_custkey")
        .groupBy(F.window("ts", "1 hour").alias("win"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("hour"), "c_mktsegment", "n")
    )

    src = tempfile.mkdtemp(prefix="pipe_src_")
    out = tempfile.mkdtemp(prefix="pipe_out_")
    ckpt = tempfile.mkdtemp(prefix="pipe_ckpt_")
    try:
        first = doubled.limit(400)
        first.write.mode("append").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        # complete-mode semantics aren't needed: watermark 30d holds all
        # state, availableNow drains everything, append emits final windows
        q = sink_partitioned_parquet(
            pipeline(stream), out, ckpt, partition_by="c_mktsegment"
        )
        q.awaitTermination(120)

        # remaining rows arrive; plant a torn write for the NEXT batch id
        doubled.subtract(first).write.mode("append").parquet(src)
        next_batch = max(
            int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
        ) + 1
        poison = (
            ev.limit(5)
            .join(F.broadcast(dim), ev["user_id"] == dim["c_custkey"], "left")
            .select(F.lit(-999).cast("long").alias("event_id"), "ts", "c_mktsegment")
        )
        poison.write.mode("overwrite").partitionBy("c_mktsegment").parquet(
            f"{out}/batch_id={next_batch}"
        )

        stream2 = spark.readStream.schema(ev.schema).parquet(src)
        q2 = sink_partitioned_parquet(
            pipeline(stream2), out, ckpt, partition_by="c_mktsegment"
        )
        q2.awaitTermination(120)

        silver = spark.read.parquet(out).drop("batch_id")
        assert silver.filter(F.col("event_id") == -999).count() == 0  # torn batch replaced
        assert silver.select("event_id").distinct().count() == silver.count()  # dedup held
        # gold: batch rollup over the streamed silver table == the batch twin
        total = (
            silver.groupBy(F.window("ts", "1 hour").alias("win"), "c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("hour"), "c_mktsegment", "n")
        )
        assert total.exceptAll(batch).count() == 0
        assert batch.exceptAll(total).count() == 0
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_cdc_snapshot_time_travel(spark):
    """Versioned snapshots double as TIME TRAVEL: `before_batch` bounds
    `latest_snapshot_version` so a reader can reconstruct the table as of
    any earlier committed batch — the poor-man's `VERSION AS OF`, and the
    replay guard and the history reader are literally the same code path."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.windows import (
        latest_snapshot_version,
        sink_merge_upsert,
    )

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).limit(30).cache()
    batch2 = cust.limit(10).select(
        "c_custkey", "c_name", F.lit("V2").alias("c_mktsegment")
    )
    src = tempfile.mkdtemp(prefix="tt_src_")
    out = tempfile.mkdtemp(prefix="tt_out_")
    ckpt = tempfile.mkdtemp(prefix="tt_ckpt_")
    try:
        cust.write.mode("append").parquet(src)
        q = sink_merge_upsert(
            spark.readStream.schema(cust.schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q.awaitTermination(120)
        v1 = latest_snapshot_version(out)

        batch2.write.mode("append").parquet(src)
        q2 = sink_merge_upsert(
            spark.readStream.schema(cust.schema).parquet(src), out, ckpt, key="c_custkey"
        )
        q2.awaitTermination(120)
        v2 = latest_snapshot_version(out)
        assert v2 > v1

        # current state carries the updates...
        now = spark.read.parquet(f"{out}/v={v2}")
        assert now.filter(F.col("c_mktsegment") == "V2").count() == 10
        # ...but AS OF v1 the original segments are intact — and the bound
        # used is the same one the crash-replay guard uses
        as_of_v1 = latest_snapshot_version(out, before_batch=v2)
        assert as_of_v1 == v1
        old = spark.read.parquet(f"{out}/v={as_of_v1}")
        assert old.filter(F.col("c_mktsegment") == "V2").count() == 0
        assert old.count() == 30
        assert old.exceptAll(cust).count() == 0 and cust.exceptAll(old).count() == 0
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def _py_debounce(ev_pdf, gap_s):
    keep = set()
    for _, g in ev_pdf.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts", "event_id"])
        last = None
        for r in g.itertuples():
            if last is None or (r.ts - last).total_seconds() > gap_s:
                keep.add(r.event_id)
                last = r.ts
    return keep


def test_streaming_throttle_debounce_matches_iterative_reference(spark):
    """Debounce-to-last-KEPT over one micro-batch equals the sequential
    per-key reference (the semantics no lag window can express)."""
    import pandas as pd

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        throttle_dedup_stream,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    d = tempfile.mkdtemp(prefix="events_debounce_")
    try:
        ev.orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(d)
        src = spark.readStream.schema(ev.schema).parquet(d)
        q = (
            throttle_dedup_stream(src, gap_s=3600)
            .writeStream.format("memory")
            .queryName("debounce_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.event_id for r in spark.table("debounce_stream").collect()}
        want = _py_debounce(ev.toPandas(), 3600)
        assert got == want
        assert len(got) < ev.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_throttle_state_carries_across_batches(spark):
    """With one file per micro-batch, the last-kept timestamp must survive
    the batch boundary: an early-second-batch event inside the gap of a
    first-batch kept event is dropped."""
    import pandas as pd

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        throttle_dedup_stream,
    )

    rows = [
        # one key; 3 events: kept, dropped (inside gap, 2nd batch), kept
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 00:30:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 02:00:00", 7, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        [(i, pd.Timestamp(t).to_pydatetime(), u, e, v, p) for i, t, u, e, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp(prefix="events_debounce_batches_")
    try:
        import time as _time

        ev.filter("event_id = 1").coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # file-source orders batches by mod time
        ev.filter("event_id >= 2").coalesce(1).write.mode("append").parquet(d)
        src = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
        q = (
            throttle_dedup_stream(src, gap_s=3600)
            .writeStream.format("memory")
            .queryName("debounce_batches")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r.event_id for r in spark.table("debounce_batches").collect())
        assert got == [1, 3]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _py_perceptual_screen(rows, max_hamming, band_bits=16, band=0):
    """Sequential reference: per band bucket, earliest media_id wins; admit
    iff hamming > max_hamming vs every previously-ADMITTED hash."""
    mask = (1 << band_bits) - 1
    kept_by_bucket = {}
    admitted = set()
    for media_id, phash in sorted(rows):
        b = (phash >> (band * band_bits)) & mask
        kept = kept_by_bucket.setdefault(b, [])
        if all(bin((phash ^ k) & ((1 << 64) - 1)).count("1") > max_hamming for k in kept):
            kept.append(phash)
            admitted.add(media_id)
    return admitted


def test_streaming_perceptual_screen_matches_sequential_reference(spark):
    """One micro-batch over the perceptual corpus (base images + near-twin
    variants): admitted set equals the earliest-wins sequential reference —
    every near-twin of an admitted base is rejected in-stream."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        dhash_frame,
        synthesize_ppm_with_variants,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        perceptual_dedup_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id").limit(100)
    sig = dhash_frame(synthesize_ppm_with_variants(docs))
    rows = [(r["media_id"], r["phash"] & ((1 << 64) - 1)) for r in sig.collect()]
    d = tempfile.mkdtemp(prefix="media_phash_")
    try:
        sig.orderBy("media_id").coalesce(1).write.mode("overwrite").parquet(d)
        src = spark.readStream.schema(sig.schema).parquet(d)
        q = (
            perceptual_dedup_stream(src, max_hamming=3)
            .writeStream.format("memory")
            .queryName("phash_screen")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.media_id for r in spark.table("phash_screen").collect()}
        want = _py_perceptual_screen(rows, 3)
        assert got == want
        # the variants exist and every one whose base was admitted is screened
        assert len(got) < len(rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_perceptual_screen_state_carries_across_batches(spark):
    """Two micro-batches (one file each): a second-batch near-twin of a
    first-batch admitted item must be rejected — the kept-fingerprint list
    survives the batch boundary."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        perceptual_dedup_stream,
    )

    base = 0b1010_1100_0011 << 20
    twin = base ^ (1 << 20)  # hamming 1, flipped OUTSIDE band 0 -> same bucket
    far = (base & 0xFFFF) | (0x123456 << 16)  # same band-0 bucket, far bits above
    schema = "media_id long, phash long"
    d = tempfile.mkdtemp(prefix="phash_batches_")
    stream_dir = None
    try:
        spark.createDataFrame([(1, base)], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b1")
        spark.createDataFrame([(2, twin), (3, far)], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b2")
        import os as _os
        import shutil as _sh

        stream_dir = tempfile.mkdtemp(prefix="phash_stream_")
        # land files one at a time; maxFilesPerTrigger=1 -> one batch per file
        import time as _time

        now = _time.time()
        for i, src_dir in enumerate(("b1", "b2")):
            for f in sorted(_os.listdir(f"{d}/{src_dir}")):
                if f.endswith(".parquet"):
                    dst = f"{stream_dir}/{i}_{f}"
                    _sh.copy(f"{d}/{src_dir}/{f}", dst)
                    # FileStreamSource orders batches by mtime: make it explicit
                    _os.utime(dst, (now + i * 10, now + i * 10))
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            perceptual_dedup_stream(src, max_hamming=3)
            .writeStream.format("memory")
            .queryName("phash_screen_batches")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.media_id for r in spark.table("phash_screen_batches").collect()}
        assert got == {1, 3}  # twin (2) rejected across the batch boundary
    finally:
        shutil.rmtree(d, ignore_errors=True)
        if stream_dir is not None:
            shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_exact_dedup_matches_batch(spark):
    """Round-8 (round-7 verdict item 7): batch ≡ stream for EXACT dedup.
    One parquet file → one availableNow micro-batch → the admitted
    (fingerprint, doc_id) set must equal batch ``dedup_exact``'s
    (fingerprint, rep_doc_id) set exactly."""
    import tempfile

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        exact_dedup_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="docs_dedup_")
    try:
        docs.coalesce(1).write.mode("overwrite").parquet(d)
        stream_src = spark.readStream.schema(docs.schema).parquet(d)
        q = (
            exact_dedup_stream(stream_src)
            .writeStream.format("memory")
            .queryName("exact_dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["fingerprint"], r["doc_id"])
            for r in spark.table("exact_dedup_stream").collect()
        )
        want = sorted(
            (r["fingerprint"], r["rep_doc_id"])
            for r in load_all()["dedup_exact"].fn(spark, SF_SMOKE).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_exact_dedup_rejects_across_microbatches(spark):
    """Cross-batch state: a second micro-batch that is ENTIRELY duplicate
    content (same texts, shifted doc_ids) must admit nothing — the seen-set
    survives the batch boundary.  File order is pinned via mtimes +
    maxFilesPerTrigger=1 (FileStreamSource processes oldest-first)."""
    import os
    import tempfile
    import time

    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        exact_dedup_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(100)
    n_distinct = docs.select(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))).distinct().count()
    d = tempfile.mkdtemp(prefix="docs_dedup_mb_")
    src = None
    try:
        f1, f2 = os.path.join(d, "batch1"), os.path.join(d, "batch2")
        docs.coalesce(1).write.mode("overwrite").parquet(f1)
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f2)
        src = tempfile.mkdtemp(prefix="docs_dedup_src_")
        now = time.time()
        for i, f in enumerate((f1, f2)):
            for p in os.listdir(f):
                if p.endswith(".parquet"):
                    dst = os.path.join(src, f"{i}_{p}")
                    os.rename(os.path.join(f, p), dst)
                    os.utime(dst, (now + i * 10, now + i * 10))
        stream_src = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            exact_dedup_stream(stream_src, ttl_s=3600)
            .writeStream.format("memory")
            .queryName("exact_dedup_mb")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain_or_stop(q, expected_input_rows=200)
        got = spark.table("exact_dedup_mb").collect()
        assert len(got) == n_distinct
        assert all(r["doc_id"] < 10_000_000 for r in got)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        if src is not None:
            shutil.rmtree(src, ignore_errors=True)


def test_streaming_minhash_neardup_screen_matches_greedy_replica(spark):
    """The in-stream MinHash screen must agree with a greedy replica built
    from the BATCH signature path (shuffle groupBy-min, ``datapipe.dedup.
    minhash_signatures``) — pinning both that the stream's in-row
    ``array_min(transform(...))`` signature is bit-identical to the batch
    one and that the admit/reject rule is the documented greedy
    (doc_id-ordered, per band-0 bucket, agreement < threshold)."""
    import tempfile

    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
        LSH_BANDS,
        MINHASH_PERMS,
        minhash_signatures,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.text import (
        shingles_col,
        tokens_col,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        STREAM_NEARDUP_THRESHOLD,
        minhash_dedup_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(200)

    # independent batch-path signatures: tokens → distinct shingles →
    # explode → shuffle groupBy-min per permutation
    sh = (
        docs.withColumn("_toks", tokens_col("text"))
        .select("doc_id", F.explode(F.array_distinct(shingles_col(F.col("_toks")))).alias("shingle"))
    )
    sigs = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(MINHASH_PERMS)]
        for r in minhash_signatures(sh).collect()
    }

    # greedy replica over band-0 buckets in doc_id order
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    bucket_of = {
        r["doc_id"]: r["b"]
        for r in spark.createDataFrame(
            [(d, *s[:rows_per_band]) for d, s in sigs.items()],
            "doc_id long, " + ", ".join(f"m{r} long" for r in range(rows_per_band)),
        )
        .select("doc_id", F.xxhash64(*[f"m{r}" for r in range(rows_per_band)]).alias("b"))
        .collect()
    }
    want: set[int] = set()
    kept_by_bucket: dict[int, list[list[int]]] = {}
    for d in sorted(sigs):
        kept = kept_by_bucket.setdefault(bucket_of[d], [])
        s = sigs[d]
        if all(
            sum(a == b for a, b in zip(s, k)) / MINHASH_PERMS < STREAM_NEARDUP_THRESHOLD
            for k in kept
        ):
            kept.append(s)
            want.add(d)

    d = tempfile.mkdtemp(prefix="docs_minhash_")
    try:
        docs.coalesce(1).write.mode("overwrite").parquet(d)
        stream_src = spark.readStream.schema(docs.schema).parquet(d)
        q = (
            minhash_dedup_stream(stream_src)
            .writeStream.format("memory")
            .queryName("minhash_screen")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {r["doc_id"] for r in spark.table("minhash_screen").collect()}
        assert got == want
        assert len(got) < docs.count()  # the fixture contains near-dups to reject
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_minhash_ttl_arms_timeout_and_state_survives_batches(spark):
    """``ttl_s`` switches the minhash screen to ProcessingTimeTimeout
    (round-8 advice: the no-eviction form grows without bound on an
    unbounded content domain).  With a TTL far longer than the run, the
    admit/reject semantics must be IDENTICAL to the untimed form: a second
    micro-batch of duplicate content (same texts, shifted doc_ids) hashes
    to the same signatures and is rejected against state admitted — and
    TTL-re-armed — in batch 1."""
    import os
    import tempfile
    import time

    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.streaming.stateful import (
        minhash_dedup_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(100)
    d = tempfile.mkdtemp(prefix="docs_minhash_ttl_")
    src = None
    try:
        f1, f2 = os.path.join(d, "batch1"), os.path.join(d, "batch2")
        docs.coalesce(1).write.mode("overwrite").parquet(f1)
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f2)
        src = tempfile.mkdtemp(prefix="docs_minhash_ttl_src_")
        now = time.time()
        for i, f in enumerate((f1, f2)):
            for p in os.listdir(f):
                if p.endswith(".parquet"):
                    dst = os.path.join(src, f"{i}_{p}")
                    os.rename(os.path.join(f, p), dst)
                    os.utime(dst, (now + i * 10, now + i * 10))
        stream_src = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            minhash_dedup_stream(stream_src, ttl_s=3600)
            .writeStream.format("memory")
            .queryName("minhash_ttl")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain_or_stop(q, expected_input_rows=200)
        got = spark.table("minhash_ttl").collect()
        assert len(got) > 0
        # every batch-2 doc duplicates a batch-1 signature: nothing admitted
        assert all(r["doc_id"] < 10_000_000 for r in got)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        if src is not None:
            shutil.rmtree(src, ignore_errors=True)
