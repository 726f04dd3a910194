"""TCP stream framing front door: octet-counting and octet-stuffing.

The reference frames syslog over stream transports two ways
(tools/omfwd.c:1195 builds "%d %s" octet-counted frames;
omfwd.c:1308-1310 appends the LF trailer for the non-transparent
"octet-stuffing" mode; imtcp/tcps_sess.c consumes both). The engine's
analog: a byte-stream column holding MANY framed messages becomes one
row per message, feeding the normal front door (uncompress -> sanitize
-> PRI -> chain) — composing with the zlib path exactly like the Kafka
record transform.

Scale shape: framing is per-stream-chunk local work — an Arrow-batched
UDF splits each buffer into its frames (no shuffle), then ONE
posexplode multiplies rows. Pass-through columns stay JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StringType


def frame_octet_counted(text: F.col) -> F.col:
    """Build one octet-counted frame: "<len> <msg>" with len in BYTES
    (omfwd.c:1195 "%d %s" where %d is the buffer's byte length)."""
    return F.concat(
        F.octet_length(text).cast("string"), F.lit(" "), text
    )


def _walk_counted(b) -> list:
    """Octet-count state machine over one buffer's bytes. A malformed
    header (no digits / no space) aborts the rest of the buffer — the
    reference drops the connection on framing errors (tcps_sess.c)."""
    frames: list = []
    if b is None:
        return frames
    s = b if isinstance(b, (bytes, bytearray)) else str(b).encode("utf-8")
    i, n = 0, len(s)
    while i < n:
        j = s.find(b" ", i)
        if j <= i or not s[i:j].isdigit():
            break
        ln = int(s[i:j])
        frames.append(bytes(s[j + 1 : j + 1 + ln]))
        i = j + 1 + ln
    return frames


@F.pandas_udf(ArrayType(StringType()))
def _split_counted_str(bufs: pd.Series) -> pd.Series:
    return pd.Series(
        [[f.decode("utf-8", "replace") for f in _walk_counted(b)]
         for b in bufs]
    )


@F.pandas_udf(ArrayType(BinaryType()))
def _split_counted_bin(bufs: pd.Series) -> pd.Series:
    return pd.Series([_walk_counted(b) for b in bufs])


def split_octet_counted(
    df: DataFrame,
    raw_col: str = "buf",
    out_col: str = "text",
    idx_col: str = "frame_idx",
    binary: bool = False,
) -> DataFrame:
    """Byte stream of "LEN SP MSG" frames -> one row per message, with
    the in-stream position as ``idx_col`` (the per-connection arrival
    order imtcp preserves).

    ``binary=True`` keeps frames as raw bytes — REQUIRED when payloads
    are not UTF-8 text (e.g. 'z'+zlib records bound for the uncompress
    front door); the text mode's lossy decode cannot round-trip them."""
    split = _split_counted_bin if binary else _split_counted_str
    return (
        df.withColumn("_frames", split(F.col(raw_col)))
        .select(
            *[c for c in df.columns if c != raw_col],
            F.posexplode("_frames").alias(idx_col, out_col),
        )
        .withColumn(idx_col, F.col(idx_col).cast("long"))
    )


def split_octet_stuffed(
    df: DataFrame,
    raw_col: str = "buf",
    out_col: str = "text",
    idx_col: str = "frame_idx",
) -> DataFrame:
    """Non-transparent framing: messages terminated by LF
    (omfwd.c:1308-1310 trailer; the imtcp default mode). Pure Column
    split — no UDF — with the empty tail after the final trailer
    dropped."""
    parts = F.split(F.col(raw_col), "\n")
    # a well-formed stream ends with the trailer, leaving one trailing
    # '' element; slice it off without losing intentional empty frames
    trimmed = F.when(
        (F.size(parts) > 0) & (F.element_at(parts, -1) == ""),
        F.slice(parts, 1, F.size(parts) - 1),
    ).otherwise(parts)
    return (
        df.withColumn("_frames", trimmed)
        .select(
            *[c for c in df.columns if c != raw_col],
            F.posexplode("_frames").alias(idx_col, out_col),
        )
        .withColumn(idx_col, F.col(idx_col).cast("long"))
    )
