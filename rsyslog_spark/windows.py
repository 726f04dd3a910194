"""Sequence-dependent operators over the stable (conv_id, turn_idx) order.

The reference's order-sensitive behaviors are all single-pass over
arrival order (SURVEY §2.9); our total order is the north-rule window
``partitionBy(conv_id).orderBy(turn_idx)`` — bounded per conversation,
so windows never concentrate a hot partition beyond one conversation's
size (skew note, SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(partition_by: str | list[str], order_by: str | list[str]):
    p = [partition_by] if isinstance(partition_by, str) else partition_by
    o = [order_by] if isinstance(order_by, str) else order_by
    return Window.partitionBy(*p).orderBy(*o)


def repeat_suppression(
    df: DataFrame,
    msg_col: str = "msg",
    partition_by: str = "conv_id",
    order_by: str | list[str] = "turn_idx",
) -> DataFrame:
    """'last message repeated n times' collapse (runtime/ratelimit.c:46-89).

    Consecutive identical messages within a partition collapse to the
    first occurrence plus a repeat count; output one row per run with
    ``repeat_count`` (0 = unique). The reference emits a literal
    'last message repeated n times' summary line; we keep the count as a
    column (the summary line is a template away).

    Plan: lag -> change-flag -> running-sum run id -> groupBy run. Two
    window passes + one partial-aggregated groupBy, all shuffle-on-conv_id
    (the same single shuffle reused — sort within partition is free).
    """
    w = _w(partition_by, order_by)
    ord0 = order_by if isinstance(order_by, str) else order_by[0]
    changed = (
        F.coalesce(F.lag(msg_col).over(w) != F.col(msg_col), F.lit(True))
    ).cast("int")
    run = F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    runs = df.withColumn("_run", run)
    first_cols = list(df.columns)
    # min over (order, row-struct) picks the first row of each run
    return (
        runs.groupBy(partition_by, "_run")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(
                F.struct(F.col(ord0).alias("_ord"), *first_cols)
            ).alias("_first"),
        )
        .select(
            *[F.col(f"_first.{c}").alias(c) for c in first_cols],
            (F.col("_n") - 1).alias("repeat_count"),
        )
    )


def rate_limit(
    df: DataFrame,
    interval_s: int,
    burst: int,
    source_col: str = "conv_id",
    ts_col: str = "ts",
    order_by: str = "turn_idx",
    keep_col: str = "rl_keep",
    severity: int = 0,
    severity_col: str = "syslogseverity",
) -> DataFrame:
    """Linux-style ratelimiter (interval, burst) — ratelimit.c:145-205:
    allow ``burst`` messages per interval window per limiter; mark the
    rest. The reference counts and reports discards; we mark with a
    boolean so the caller can route or drop (discard count = filter).

    ``severity``: only messages AT OR NUMERICALLY ABOVE the threshold
    (i.e. less important) are rate limited (ratelimit.c:253-255
    'severity >= ratelimit->severity'); 0 (default) limits everything.
    """
    win = F.window(F.col(ts_col), f"{interval_s} seconds")
    w = Window.partitionBy(F.col(source_col), win).orderBy(order_by)
    if severity > 0:
        # bypassing messages do NOT consume burst budget (the reference
        # skips the limiter body entirely for them): rank only the
        # limited rows via a running count of the limited flag
        limited = F.col(severity_col) >= severity
        cnt = F.sum(limited.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(keep_col, ~limited | (cnt <= burst))
    return df.withColumn(keep_col, F.row_number().over(w) <= burst)


def exec_only_every_nth(
    df: DataFrame,
    n: int,
    partition_by: str = "conv_id",
    order_by: str = "turn_idx",
    keep_col: str = "nth_keep",
) -> DataFrame:
    """action.execonlyeverynthtime (action.c:1865-1885): pass every Nth
    matching message."""
    w = _w(partition_by, order_by)
    return df.withColumn(
        keep_col, (F.row_number().over(w) % n) == 0
    )


def exec_only_once_every_interval(
    df: DataFrame,
    interval_s: int,
    partition_by: str = "conv_id",
    ts_col: str = "ts",
    order_by: str = "turn_idx",
    keep_col: str = "once_keep",
) -> DataFrame:
    """action.execonlyonceeveryinterval (action.c:1892-1897): at most one
    message per interval per partition."""
    win = F.window(F.col(ts_col), f"{interval_s} seconds")
    w = Window.partitionBy(F.col(partition_by), win).orderBy(order_by)
    return df.withColumn(keep_col, F.row_number().over(w) == 1)


def seq_summary(
    df: DataFrame,
    partition_by: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Per-partition sequence summary: (partition, n_turns, gap_free).

    The positive form of seq_check — one row per partition so the result
    is verifiable even when everything passes."""
    agg = df.groupBy(partition_by).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(idx_col).alias("_lo"),
        F.max(idx_col).alias("_hi"),
        F.countDistinct(idx_col).alias("_nd"),
    )
    return agg.select(
        partition_by,
        "n_turns",
        (
            (F.col("_lo") == 0)
            & (F.col("_hi") == F.col("n_turns") - 1)
            & (F.col("_nd") == F.col("n_turns"))
        ).alias("gap_free"),
    )


def seq_check(
    df: DataFrame,
    partition_by: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """seq_check analog (tests/diag.sh:460-464): verify each partition's
    index sequence is gap-free 0..N-1. Returns offending partitions
    (empty result == pass)."""
    agg = df.groupBy(partition_by).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(idx_col).alias("lo"),
        F.max(idx_col).alias("hi"),
        F.countDistinct(idx_col).alias("nd"),
    )
    return agg.filter(
        ~((F.col("lo") == 0) & (F.col("hi") == F.col("n") - 1) & (F.col("nd") == F.col("n")))
    )


def multiline_assemble(
    df: DataFrame,
    start_re: str | None = None,
    mode: str = "startmsg",
    text_col: str = "text",
    partition_by: str = "conv_id",
    order_by: str | list[str] = "turn_idx",
    sep: str = "\n",
) -> DataFrame:
    """imfile multi-line message assembly (plugins/imfile readMode /
    startmsg.regex, imfile.c:324,1623,1921-1922; strm.ReadMultiLine).

    A physical line STARTS a new message when:
    - mode='startmsg': it matches ``start_re`` (startmsg.regex)
    - mode='indented': it does NOT begin with space/tab (readMode=1)
    - mode='paragraph': the PREVIOUS line was empty (readMode=2)
    Continuation lines are appended with ``sep`` (the reference's
    escapeLF rendering happens downstream in sanitize, exactly like its
    pipeline order). Lines before the first start form message 0
    (the reference flushes pending partial data the same way).

    Returns one row per assembled message: (partition, msg_seq,
    first ``order_by`` value, n_lines, assembled text).

    Scale shape: one window cumsum over the bounded per-file/per-conv
    partition + one groupBy — no self-joins, no driver state; exactly
    the shape of the other sequence operators in this module.
    """
    o = [order_by] if isinstance(order_by, str) else list(order_by)
    t = F.col(text_col)
    if mode == "startmsg":
        if not start_re:
            raise ValueError("mode='startmsg' requires start_re")
        is_start = t.rlike(start_re)
    elif mode == "indented":
        is_start = ~(t.startswith(" ") | t.startswith("\t"))
    elif mode == "paragraph":
        prev = F.lag(t).over(_w(partition_by, o))
        is_start = prev.isNull() | (prev == "")
    else:
        raise ValueError(f"unknown mode {mode!r}")
    w = _w(partition_by, o)
    seq = F.sum(is_start.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_o = o[0]
    lines = df.withColumn("_mseq", seq)
    return (
        lines.groupBy(partition_by, "_mseq")
        .agg(
            F.min(first_o).alias(f"first_{first_o}"),
            F.count(F.lit(1)).alias("n_lines"),
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(first_o, text_col))
                    ),
                    lambda s: s[text_col],
                ),
            ).alias("msg_text"),
        )
        .withColumnRenamed("_mseq", "msg_seq")
    )
