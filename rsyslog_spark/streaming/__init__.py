"""Structured Streaming face of the engine.

rsyslog is a streaming daemon; its queue abstraction (runtime/queue.h:46,
SURVEY §1.5) maps to an unbounded stream consumed in micro-batches (the
dequeue batch of 128, queue.c:1534 ≙ a micro-batch). Semantics notes
(SURVEY §2.11): the reference has NO event-time windows or watermarks —
all time-based behavior uses arrival time — so the faithful streaming
variant uses processing-time semantics and per-batch rate limits.
"""

from rsyslog_spark.streaming.pipeline import (
    read_transcript_stream,
    stream_flagship,
)
from rsyslog_spark.streaming.stateful import (
    streaming_dyn_inc,
    streaming_repeat_suppression,
)

__all__ = [
    "read_transcript_stream",
    "stream_flagship",
    "streaming_dyn_inc",
    "streaming_repeat_suppression",
]
