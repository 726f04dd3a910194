"""Custom stateful streaming operators via applyInPandasWithState.

streaming_repeat_suppression = the cross-batch form of rsyslog's
'last message repeated n times' collapse (runtime/ratelimit.c:46-89):
the batch window version (windows.repeat_suppression) only sees one
micro-batch; the real daemon's repeat state lives across arrivals, so
here it lives in GroupState keyed by conv_id.

Semantics: rows arrive per conv in turn_idx order (sorted within the
batch); a run of identical ``msg`` values emits ONE row when the run
closes (next different msg). The open run is held in state across
micro-batches; state timeout closes it after ``state_ttl_ms`` of
processing-time silence (the reference repeats-summary flush timer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, msg string, first_turn int, repeat_count long"
)
STATE_SCHEMA = "msg string, first_turn int, count long"


def _make_suppress(state_ttl_ms: int | None):
    def _suppress(key, pdf_iter, state: GroupState):
        return _suppress_impl(key, pdf_iter, state, state_ttl_ms)

    return _suppress


def _suppress_impl(key, pdf_iter, state: GroupState, state_ttl_ms):
    (conv_id,) = key
    if state.hasTimedOut:
        if state.exists:
            msg, first_turn, count = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, msg, first_turn, count - 1)],
                columns=["conv_id", "msg", "first_turn", "repeat_count"],
            )
        return

    cur = state.get if state.exists else None
    out = []
    # applyInPandasWithState delivers a group's rows as multiple Arrow
    # chunks with NO cross-chunk ordering guarantee — materialize the
    # whole group and sort ONCE, or a conversation spanning chunk
    # boundaries (>~10k rows / multiple input files) would be collapsed
    # per-chunk and produce split runs with wrong repeat_count values.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("turn_idx")
        for turn, msg in zip(pdf["turn_idx"], pdf["msg"]):
            if cur is not None and cur[0] == msg:
                cur = (cur[0], cur[1], cur[2] + 1)
            else:
                if cur is not None:
                    out.append((conv_id, cur[0], cur[1], cur[2] - 1))
                cur = (msg, int(turn), 1)
    if cur is not None:
        state.update(cur)
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
    if out:
        yield pd.DataFrame(
            out, columns=["conv_id", "msg", "first_turn", "repeat_count"]
        )


def streaming_repeat_suppression(
    stream, msg_col: str = "msg", state_ttl_ms: int | None = 60_000
):
    """Collapse consecutive identical messages per conv across
    micro-batches. Emits closed runs; the open run stays in state until
    closed by a different message or flushed by the processing-time TTL
    (``state_ttl_ms``; None disables the flush timer — note that an
    availableNow trigger then terminates without draining open runs,
    while WITH a TTL it keeps running until the timers fire)."""
    from pyspark.sql import functions as F

    src = stream.select(
        "conv_id", "turn_idx", F.col(msg_col).alias("msg")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        _make_suppress(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_dyn_inc(
    stream,
    bucket: str,
    key: str,
    ts_col: str = "ts",
    interval_s: int = 600,
    watermark: str = "10 minutes",
):
    """Streaming dynstats emission: per-interval counter rows
    (runtime/dynstats.c resettable cycle — each emission interval
    independent) as a WATERMARKED tumbling-window aggregation.

    The watermark bounds state exactly like unusedMetricLife bounds the
    reference's bucket hash: windows older than the watermark are
    finalized and purged from the store. Late rows within the watermark
    still count (the daemon's analog: messages queued before the stats
    timer fires); rows later than that are dropped — the documented
    trade the reference makes too (a counter already emitted is never
    amended).

    Nuance (verified e2e in test_streaming.TestWatermarkedDynInc):
    Spark filters late EVENTS with the previous micro-batch's watermark
    while EVICTING state with the current one — so a straggler landing
    in the very batch where its window closes still counts, and only
    rows arriving a batch later are dropped (visible in
    numRowsDroppedByWatermark). One batch of grace, never amended
    counters: the same contract, off by at most one trigger.

    Scale shape: streaming partial aggregation per micro-batch + state
    store keyed by (window, key) — Spark's native map-side combine, no
    custom state code.
    """
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{interval_s} seconds"),
            F.col(key).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.lit(bucket).alias("name"),
            "key",
            F.col("window.start").alias("window_start"),
            "count",
        )
    )
