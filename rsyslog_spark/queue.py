"""Queue discard semantics (queue.discardMark / queue.discardSeverity).

Reference: ``qqueueChkDiscardMsg`` (runtime/queue.c:1605-1630) — at
enqueue time, if the queue already holds >= discardMark messages AND
the arriving message's severity is numerically >= discardSeverity
(i.e. it is discardSeverity-or-LESS-important), the message is dropped
and counted in the nearfull-discard counter. Defaults: discardMark -1
(off, queue.c:1539) and discardSeverity 8 (off — no real severity
reaches 8, queue.c:1540); rsyslog clamps a configured mark to 98% of
maxSize (queue.c:2484-2489).

Batch model
-----------
A batch engine has no live consumer, so queue DEPTH is modeled per
ingest burst: fixed ``window_s`` tumbling windows of the arrival
timestamp, with the queue drained between windows (the
consumer-keeps-up-on-average regime where discard protects against
bursts — exactly the situation discardMark exists for). Within a
window, arrival order is (ts, conv_id, turn_idx).

The sequential enqueue recurrence collapses to a closed form. Let rows
of a window be processed in order; c = count of previously KEPT rows
(= queue depth at enqueue, reference iQueueSize). A discardable row
(sev >= S) is kept iff c < M; a protected row (sev < S) is always
kept. By induction every row at 1-based position rn <= M is kept
(c = rn-1 < M holds while no discard has occurred, and none can occur
before depth reaches M); from position M+1 on, c >= M permanently
(kept rows only accumulate), so every discardable row is dropped.
Hence::

    keep  <=>  sev < S  OR  rn <= M

— one window-function expression, exactly the per-message outcome of
the sequential algorithm, with no sequential scan. At 100 TB the
window partition key is the time bucket: partitions are bounded by
burst size * window_s, and the rank is a single shuffle by bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def queue_discard(
    df: DataFrame,
    discard_mark: int,
    discard_severity: int = 8,
    window_s: int = 60,
    ts_col: str = "ts",
    sev_col: str = "syslogseverity",
    order_cols: tuple = ("conv_id", "turn_idx"),
    prefix: str = "q",
) -> DataFrame:
    """Append ``<prefix>_win``, ``<prefix>_pos``, ``<prefix>_keep``.

    keep=false rows are the ones ``qqueueChkDiscardMsg`` would destruct
    (caller filters or counts them — kept as flags so one frame
    verifies every row, the sampling_gates pattern). discard_mark <= 0
    or discard_severity >= 8 disables discard entirely, matching the
    reference's off defaults."""
    # floor division, not cast-truncation: cast('long') truncates
    # toward zero, so pre-1970 timestamps (negative epoch) would land
    # one bucket high vs the DuckDB oracle's floor semantics
    win = F.floor(F.unix_timestamp(F.col(ts_col)) / window_s).cast("long")
    w = Window.partitionBy(win).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    pos = F.row_number().over(w)
    if discard_mark <= 0 or discard_severity >= 8:
        keep = F.lit(True)
    else:
        keep = (
            (F.col(sev_col) < F.lit(discard_severity))
            | (pos <= F.lit(discard_mark))
        )
    return (
        df.withColumn(f"{prefix}_win", win)
        .withColumn(f"{prefix}_pos", pos.cast("long"))
        .withColumn(f"{prefix}_keep", keep)
    )


def queue_discard_stats(
    df: DataFrame,
    discard_mark: int | None = None,
    discard_severity: int | None = None,
    **kw,
) -> DataFrame:
    """Per-window impstats-style counters: (q_win, enqueued, discarded)
    — reference counter ``ctrNFDscrd`` (queue.c:1618), surfaced per
    burst window instead of per queue lifetime.

    Accepts either a raw frame (thresholds REQUIRED — it flags first)
    or one ALREADY flagged by :func:`queue_discard` (thresholds
    FORBIDDEN — they were baked in at flag time) — pass the flagged
    frame when you also keep the per-row facet, so the scan/parse/
    window subtree is shared instead of re-executed."""
    prefix = kw.get("prefix", "q")
    if f"{prefix}_keep" in df.columns:
        if discard_mark is not None or discard_severity is not None:
            raise ValueError(
                f"frame already carries {prefix}_keep: thresholds were "
                "fixed by queue_discard() and cannot be overridden "
                "here — pass the raw frame to re-flag"
            )
    else:
        if discard_mark is None:
            raise ValueError(
                "discard_mark is required when passing an unflagged "
                "frame (or flag it with queue_discard() first)"
            )
        df = queue_discard(
            df,
            discard_mark,
            8 if discard_severity is None else discard_severity,
            **kw,
        )
    return df.groupBy(f"{prefix}_win").agg(
        F.count(F.lit(1)).alias("enqueued"),
        F.sum((~F.col(f"{prefix}_keep")).cast("long")).alias("discarded"),
    )
