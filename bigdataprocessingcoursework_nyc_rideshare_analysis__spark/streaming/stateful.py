"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed/session aggregations (``streaming.windows``) cover
time-bucketed state; this module shows the escape hatch for state machines
they can't express: an arbitrary per-key accumulator maintained across
micro-batches with explicit update semantics.

``running_totals_stream`` keeps, per event_type, a running (count, sum,
max) over the whole stream and emits the updated totals every micro-batch —
the streaming analog of ``groupBy().agg()`` over history, without
re-scanning history.

Scale notes: state is one tiny tuple per key in the state store, so memory
is O(|keys|), not O(events).  For unbounded key domains pair this with a
timeout (``GroupStateTimeout.ProcessingTimeTimeout``) and evict; here the
key domain (event types) is bounded so ``NoTimeout`` is correct.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-event_type running (count, sum, max) maintained in the state
    store and re-emitted each micro-batch (update output mode).

    The update function is a *closure*, deliberately: cloudpickle serializes
    closures by value, so Spark's Python workers never need this package on
    their import path.  A module-level function is pickled by reference and
    fails with ModuleNotFoundError whenever the driver process imported the
    engine from a path the workers don't share.  Every Python-worker
    callable in this repo follows this rule (cf. ``datapipe.multimodal``).
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx if mx != float("-inf") else None],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws_stream(events: DataFrame) -> DataFrame:
    """The same running-totals state machine on ``transformWithStateInPandas``
    — Spark 4's successor stateful API (SPARK-43563 "arbitrary stateful
    processing v2").

    Worth carrying both: ``applyInPandasWithState`` is the stable v1 surface,
    while the ``StatefulProcessor`` form adds lifecycle hooks (init/close),
    NAMED state variables (value/list/map) instead of one state tuple, and
    timer registration — the shape long-running keyed state machines need at
    scale (state eviction by timer rather than blanket timeout).  The two
    implementations are pinned to identical output in ``test_streaming.py``.

    The processor class is defined INSIDE this function: cloudpickle must
    serialize it by value (workers never import this package — same rule as
    every Python-worker callable here).

    ENVIRONMENT GATE: the transformWithState runtime speaks protobuf to its
    state server, so this surface needs the ``protobuf`` package on driver
    and workers.  Checked eagerly here with a clear error; the parity test
    skips when the dependency is absent (this container ships without it —
    the v1 ``running_totals_stream`` above has no such dependency and is
    the tested default)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark.sql.streaming.proto speaks protobuf to the state "
            "server); install protobuf or use running_totals_stream "
            "(applyInPandasWithState), which has no such dependency"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total, mx = self._totals.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._totals.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx if mx != float("-inf") else None],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


THROTTLE_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)

_LAST_KEPT_SCHEMA = StructType([StructField("last_us", LongType())])


def throttle_dedup_stream(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Streaming debounce: per (user_id, event_type), emit an event only if
    it arrives more than ``gap_s`` after the last EMITTED event of that key
    — state is the last-kept timestamp, carried across micro-batches.

    This is the strictly-iterative semantics the batch
    ``events_throttle_dedup`` operator deliberately relaxes (batch measures
    the gap to the previous RAW event so a lag window can express it; the
    debounce-to-last-kept rule is sequential per key and therefore lives
    here, where the state store IS the iteration).  Within a micro-batch
    rows are ordered by (ts, event_id) before the rule is applied, so
    output is deterministic for any fixed batching; state is one long per
    live key — O(|keys|) memory, eviction by timeout when the key domain
    is unbounded.

    The update function is a closure (cloudpickle by-value; workers never
    import this package — same rule as every Python-worker callable)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        keep = []
        for row in pdf.itertuples():
            us = row.ts.value // 1000  # pandas ns ticks → microseconds
            if last is None or us - last > gap_s * 1_000_000:
                keep.append(row.Index)
                last = us
        if last is not None:
            state.update((int(last),))
        out = pdf.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        if len(out):
            yield out

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=THROTTLE_OUT_SCHEMA,
        stateStructType=_LAST_KEPT_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming perceptual dedup screen ------------------------------------------

PERCEPTUAL_OUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
        StructField("bucket", LongType()),
    ]
)

_KEPT_HASHES_SCHEMA = StructType(
    [StructField("kept", ArrayType(LongType()))]
)


def perceptual_dedup_stream(
    media: DataFrame, max_hamming: int = 3, band_bits: int = 16, band: int = 0
) -> DataFrame:
    """Streaming PERCEPTUAL dedup screen: admit a media item only if no
    previously-admitted item in its fingerprint band bucket is within
    ``max_hamming`` bits — the in-stream twin of
    ``media_image_neardup_phash`` / ``media_audio_neardup_fp``'s batch
    banding, for ingest pipelines that must reject re-encoded/
    near-identical uploads AS THEY ARRIVE (batch dedup only tells you
    after the fact).  The built-in ``dropDuplicatesWithinWatermark``
    handles byte-exact streams; "within hamming distance of anything
    kept" is a sequential, order-dependent rule only a custom state
    machine expresses.

    State per band bucket is the list of ADMITTED fingerprints (near-dups
    are rejected and never enter state, so state grows with distinct
    content, not with traffic).  Single-band screening is the documented
    approximation: a pair colliding only in another band passes the screen
    and is caught by the nightly batch pass — the standard cheap-gate /
    exact-sweep split this engine uses everywhere (Bloom screen → n-gram
    pass, LSH → verify).  Within a micro-batch rows are ordered by
    media_id, so output is deterministic for any fixed batching; the
    earliest arrival wins, exactly like batch keep-first dedup.

    The update function is a closure (cloudpickle by-value; workers never
    import this package — same rule as every Python-worker callable)."""
    from pyspark.sql import functions as F

    mask = (1 << band_bits) - 1
    keyed = media.withColumn(
        "bucket",
        F.shiftright("phash", band * band_bits).bitwiseAND(F.lit(mask).cast("long")),
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        kept: list[int] = list(state.get[0]) if state.exists else []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("media_id")
        out_rows = []
        for row in pdf.itertuples():
            h = int(row.phash)
            if all(bin((h ^ k) & ((1 << 64) - 1)).count("1") > max_hamming for k in kept):
                kept.append(h)
                out_rows.append((int(row.media_id), h, int(key[0])))
        state.update((kept,))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["media_id", "phash", "bucket"])

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=PERCEPTUAL_OUT_SCHEMA,
        stateStructType=_KEPT_HASHES_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming exact dedup (fingerprint + seen-set state with TTL) --------------

EXACT_DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fingerprint", StringType()),
    ]
)

_SEEN_SCHEMA = StructType([StructField("rep_doc_id", LongType())])


def exact_dedup_stream(docs: DataFrame, ttl_s: int | None = None) -> DataFrame:
    """Streaming EXACT dedup — the in-stream twin of batch ``dedup_exact``
    (``datapipe/dedup.py``): the same md5-of-normalized-text fingerprint,
    admit the FIRST document per fingerprint, reject every later duplicate
    as it arrives.  With the r7 perceptual screen this gives ingest both
    halves of the dedup family in-stream: byte/content-exact here,
    near-identical there.

    State per fingerprint is ONE long (the admitted doc_id) in the state
    store — O(|distinct contents|), never O(traffic).  ``ttl_s`` arms a
    ProcessingTimeTimeout that evicts fingerprints idle for that long —
    the standard bounded-state compromise for unbounded fingerprint
    domains: a duplicate arriving after eviction is re-admitted, and the
    nightly batch ``dedup_exact`` sweep catches it (the same cheap-gate /
    exact-sweep split as the perceptual screen and the Bloom→n-gram
    contamination pass).  Within a micro-batch rows are ordered by doc_id,
    so the admitted set is deterministic for any fixed batching; when
    arrival order follows doc_id, the admitted set EQUALS the batch
    rep_doc_id set (pinned batch≡stream in ``test_streaming.py``).

    The update function is a closure (cloudpickle by-value; workers never
    import this package — same rule as every Python-worker callable)."""
    from pyspark.sql import functions as F

    from ..functions.text import normalize_text

    keyed = docs.select("doc_id", F.md5(normalize_text("text")).alias("fingerprint"))

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: forget the fingerprint; nothing to emit
            state.remove()
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        if not state.exists:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            rep = int(pdf["doc_id"].iloc[0])
            state.update((rep,))
            yield pd.DataFrame({"doc_id": [rep], "fingerprint": [key[0]]})
        if ttl_s is not None:
            state.setTimeoutDuration(ttl_s * 1000)

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=EXACT_DEDUP_OUT_SCHEMA,
        stateStructType=_SEEN_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_s is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# --- streaming MinHash near-dup screen -------------------------------------------

MINHASH_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", LongType()),
    ]
)

_KEPT_SIGS_SCHEMA = StructType(
    [StructField("kept", ArrayType(ArrayType(LongType())))]
)

#: admit iff estimated jaccard (minhash agreement fraction) vs every kept
#: doc in the band bucket stays below this — matches the batch tier's
#: JACCARD_THRESHOLD so the two screens agree on "near-duplicate"
STREAM_NEARDUP_THRESHOLD = 0.8


def minhash_dedup_stream(
    docs: DataFrame,
    threshold: float = STREAM_NEARDUP_THRESHOLD,
    ttl_s: int | None = None,
) -> DataFrame:
    """Streaming TEXT near-dup screen — the in-stream twin of batch
    ``neardup_minhash_lsh`` (``datapipe/dedup.py``), completing the
    batch≡stream dedup family (exact: ``exact_dedup_stream``; perceptual
    media: ``perceptual_dedup_stream``; text near-dup: this): admit a
    document only if its estimated Jaccard against every previously
    ADMITTED document in its LSH band bucket stays below ``threshold``.

    The signature is computed DECLARATIVELY and in-row — no streaming
    aggregation, no shuffle before the stateful op: per permutation i,
    ``min over the doc's distinct shingle hashes of xxhash64(h, i)`` via
    ``array_min(transform(...))``, the exact same hash chain as the batch
    ``minhash_signatures`` (xxhash64 of the shingle string, then of the
    (base, i) pair), so stream and batch signatures are bit-identical for
    the same text.  Cost profile (measured, round-9 streaming receipt):
    this expression evaluates at ~2.4 s per 200k docs on 32 cores — a
    vectorized NumPy/Arrow replacement was built, proven bit-identical
    (including the int-literal hashInt fold), and REJECTED at 10× slower:
    shipping the per-doc hash arrays through Arrow plus a per-row Python
    list walk costs far more than the JVM lambda evaluation saves.  The
    screen's actual per-batch bound is the stateful operator itself
    (per-group Arrow round trips + nested-array state serialization;
    vectorizing the per-row greedy into NumPy matrix compares — kept,
    since it also helps hot buckets — moved the wall < 5%), which scales
    with DISTINCT CONTENT touched per batch, not traffic — same axis as
    the state-size claim below.  A third candidate — batch-local
    exact-signature pre-dedup BEFORE the stateful op (round-9 follow-up)
    — was evaluated and rejected WITHOUT a measurement pass, because the
    rejection is structural: a batch's touched-group set is exactly the
    band-bucket image of its DISTINCT signature set, and exact-signature
    pre-dedup preserves that set by definition — it can only shrink rows
    per group, the axis the <5%-greedy result already showed is
    second-order, never the per-group overhead that dominates.  The grouping key is band 0's bucket — the
    single-band
    approximation the perceptual screen documents: a pair colliding only
    in another band passes the screen and is caught by the nightly batch
    ``neardup_minhash_lsh`` sweep (cheap-gate / exact-sweep split).

    State per bucket is the list of admitted signatures ({MINHASH_PERMS}
    longs each) — near-dups are rejected and never enter state, so state
    grows with distinct content, not traffic; agreement fraction over all
    {MINHASH_PERMS} permutations (not just the band) estimates Jaccard,
    the standard MinHash estimator.  Within a micro-batch rows are ordered
    by doc_id — earliest arrival wins, exactly like batch keep-first.

    ``ttl_s`` arms the same ProcessingTimeTimeout eviction as
    ``exact_dedup_stream`` — on an UNBOUNDED content domain even
    O(distinct) state grows without bound (round-8 advice), so buckets
    idle for ``ttl_s`` drop their kept signatures.  Same documented
    compromise: a near-dup of an evicted bucket is re-admitted and the
    nightly batch ``neardup_minhash_lsh`` sweep catches it.

    The update function is a closure (cloudpickle by-value; workers never
    import this package — same rule as every Python-worker callable)."""
    from pyspark.sql import functions as F

    from ..datapipe.dedup import LSH_BANDS, MINHASH_PERMS
    from ..functions.text import shingles_col, tokens_col

    rows_per_band = MINHASH_PERMS // LSH_BANDS
    toks = tokens_col("text")
    hs = F.transform(F.array_distinct(shingles_col(F.col("_toks"))), lambda s: F.xxhash64(s))

    # closure factory, not a default-arg lambda: PySpark reads the lambda's
    # parameter count as the higher-order function's arity, and a 2-param
    # lambda would be called as (element, index) — shadowing i
    def perm(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_hs"), perm(i)))
            for i in range(MINHASH_PERMS)
        ]
    )
    bucket = F.xxhash64(*[F.element_at("sig", r + 1) for r in range(rows_per_band)])
    keyed = (
        docs.withColumn("_toks", toks)
        .withColumn("_hs", hs)
        .filter(F.size("_hs") > 0)  # sub-k-token docs have no signature
        .withColumn("sig", sig)
        .withColumn("bucket", bucket)
        .select("doc_id", "bucket", "sig")
    )

    perms = MINHASH_PERMS

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            # TTL eviction: forget the bucket's kept signatures
            state.remove()
            return
        kept: list = [list(s) for s in state.get[0]] if state.exists else []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        # Vectorized greedy, identical semantics to the row-at-a-time loop
        # (round-9 streaming receipt: 32 int() calls + a pure-Python
        # agreement sum per (row, kept) dominated the screen's wall):
        # (1) screen every row against the PRE-EXISTING kept set in one
        # (n, n_kept, perms) comparison — rows failing it are rejected
        # regardless of batch order, so this commutes with the greedy;
        # (2) sequential greedy among survivors in doc_id order against
        # the batch's newly admitted signatures (survivors are few in
        # dup-heavy traffic; worst case equals the old loop).
        sigs = np.stack(pdf["sig"].to_numpy()).astype(np.int64, copy=False)
        ids = pdf["doc_id"].to_numpy()
        if kept:
            # chunk the (block, n_kept, perms) comparison so the dense
            # boolean temporary is bounded (~4k·n_kept·perms bytes) however
            # large a batch a bucket receives (round-9 advice); the
            # agreement test divides by perms and compares to threshold —
            # the row-at-a-time loop's exact arithmetic — rather than
            # pre-multiplying threshold*perms, whose float rounding could
            # flip an exact-boundary case for arbitrary thresholds
            pre = np.asarray(kept, dtype=np.int64)  # (n_kept, perms)
            ok = np.empty(len(sigs), dtype=bool)
            block = 4096
            for i in range(0, len(sigs), block):
                agree = (sigs[i : i + block, None, :] == pre[None, :, :]).sum(axis=2)
                ok[i : i + block] = (agree / perms < threshold).all(axis=1)
        else:
            ok = np.ones(len(sigs), dtype=bool)
        out = []
        new: list = []
        for idx in np.flatnonzero(ok):
            s = sigs[idx]
            if new and ((((s == np.asarray(new)).sum(axis=1)) / perms) >= threshold).any():
                continue
            new.append(s)
            out.append((int(ids[idx]), int(key[0])))
        kept.extend([int(x) for x in s] for s in new)
        state.update((kept,))
        if ttl_s is not None:
            state.setTimeoutDuration(ttl_s * 1000)
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "bucket"])

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=MINHASH_OUT_SCHEMA,
        stateStructType=_KEPT_SIGS_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_s is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
