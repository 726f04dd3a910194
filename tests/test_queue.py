"""queue.discardMark / discardSeverity (rsyslog_spark/queue.py).

Differential check: the closed-form window expression vs an explicit
sequential enqueue simulation of qqueueChkDiscardMsg
(runtime/queue.c:1605-1630) — same philosophy as the config-expression
fuzzer (independent model, no shared code).
"""

from __future__ import annotations

import datetime as dt
import random

from rsyslog_spark.queue import queue_discard, queue_discard_stats


def _simulate(rows, mark, dsev, window_s):
    """Sequential reference: per window, depth = kept count; discard
    iff depth >= mark and sev >= dsev (queue.c:1613-1615)."""
    out = {}
    by_win = {}
    for ts, conv, turn, sev in sorted(rows):
        by_win.setdefault(int(ts.timestamp()) // window_s, []).append(
            (ts, conv, turn, sev)
        )
    for win, items in by_win.items():
        depth = 0
        for ts, conv, turn, sev in items:
            if mark > 0 and depth >= mark and sev >= dsev:
                out[(conv, turn)] = False
            else:
                out[(conv, turn)] = True
                depth += 1
    return out


def _mkrows(rng, n=300):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        # bursty arrivals: several rows per second in bursts
        ts = base + dt.timedelta(seconds=rng.randrange(0, 180))
        rows.append((ts, f"c{i % 7}", i, rng.randrange(0, 8)))
    return rows


class TestQueueDiscard:
    def test_matches_sequential_simulation(self, spark):
        rng = random.Random(11)
        rows = _mkrows(rng)
        df = spark.createDataFrame(
            rows, "ts timestamp, conv_id string, turn_idx long, "
            "syslogseverity int",
        )
        for mark, dsev in [(5, 4), (1, 0), (20, 7), (0, 4), (5, 8)]:
            got = {
                (r["conv_id"], r["turn_idx"]): r["q_keep"]
                for r in queue_discard(
                    df, mark, dsev, window_s=60
                ).collect()
            }
            want = _simulate(rows, mark, dsev, 60)
            assert got == want, (mark, dsev)

    def test_off_defaults_keep_everything(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), "c", i, 7) for i in range(50)],
            "ts timestamp, conv_id string, turn_idx long, "
            "syslogseverity int",
        )
        # reference defaults: mark -1 (queue.c:1539), severity 8 (:1540)
        out = queue_discard(df, -1, 8)
        assert all(r["q_keep"] for r in out.collect())

    def test_stats_counter(self, spark):
        rows = [
            (dt.datetime(2024, 1, 1, 0, 0, i), "c", i, 7 if i % 2 else 1)
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "ts timestamp, conv_id string, turn_idx long, "
            "syslogseverity int",
        )
        s = {r["q_win"]: (r["enqueued"], r["discarded"])
             for r in queue_discard_stats(df, 10, 5, window_s=60).collect()}
        (enq, dis), = s.values()
        # 40 arrivals; positions 11..40 with sev 7 (odd i) discarded:
        # odd i in 10..39 -> 15 rows
        assert (enq, dis) == (40, 15)

    def test_stats_threshold_misuse_raises(self, spark):
        import pytest

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), "c", 0, 7)],
            "ts timestamp, conv_id string, turn_idx long, "
            "syslogseverity int",
        )
        # unflagged frame without a mark: fail loudly, never a silent
        # discarded=0 answer
        with pytest.raises(ValueError, match="discard_mark is required"):
            queue_discard_stats(df)
        # pre-flagged frame with explicit thresholds: the flags were
        # baked in by queue_discard — overriding is ambiguous
        flagged = queue_discard(df, 30, 5)
        with pytest.raises(ValueError, match="already carries q_keep"):
            queue_discard_stats(flagged, 100, 2)
        # pre-flagged without thresholds still works
        assert queue_discard_stats(flagged).count() == 1
