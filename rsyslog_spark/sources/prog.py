"""improg: external program -> raw messages (contrib/improg/improg.c,
722 LoC).

The reference forks the configured binary, sends ``START\\n``, reads
LF-terminated lines from its stdout (each line = one message; empty
lines skipped, enqLine :379-407), optionally ACKs each line
(``ACK\\n``, confirmMessages default ON — :454/:414-418), and on
shutdown sends ``STOP\\n`` (+ SIGTERM when signalOnClose, afterRun
:640-656). Each message gets: rawmsg = the line with MSG at offset 0,
HOSTNAME = the daemon's localhostname, TAG/APPNAME = the ``tag`` param,
PRI = facility|severity (defaults severity 5, facility 128 = local0<<3,
:439-440), and the bound ruleset (:390-400).

Spark shape: the program is inherently a SINGLE-producer stream — the
reference daemon runs exactly one child per configured instance — so
the protocol runner executes on the driver and the collected lines
parallelize into a transcript-shaped frame for the normal front door
(uncompress -> sanitize -> PRI -> chain), the same contract as
imkafka's record transform. Scale = many instances (many sources
unioned), exactly like the reference scales by configuring more
``input(type="improg")`` blocks. The batch face bounds the stream with
``max_lines``/``timeout_s`` (the daemon's unbounded loop has no batch
analog; the STOP handshake is the same).
"""

from __future__ import annotations

import shlex
import signal
import subprocess
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def improg_lines(
    binary: str,
    confirm_messages: bool = True,
    signal_on_close: bool = False,
    close_timeout_s: float = 5.0,
    max_lines: int | None = None,
    timeout_s: float = 10.0,
) -> list[str]:
    """Run the improg line protocol against ``binary`` on the driver:
    START, read LF lines (ACK each when confirming), STOP at the
    bound. Empty lines are skipped like enqLine (:384-387). Returns
    the collected lines."""
    import select

    argv = shlex.split(binary)
    if not argv:
        raise ValueError("improg: empty binary parameter")
    child = subprocess.Popen(
        argv,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        bufsize=0,
    )
    lines: list[str] = []
    buf = b""
    deadline = time.monotonic() + timeout_s
    fd = child.stdout.fileno()

    def take(raw: bytes) -> None:
        line = raw.decode("utf-8", "replace")
        if confirm_messages:
            # the C ACKs every '\n' BEFORE the empty-line check
            # (readChild :411-418)
            try:
                child.stdin.write(b"ACK\n")
                child.stdin.flush()
            except (BrokenPipeError, OSError):
                pass
        if line:  # empty lines are not processed (enqLine :384-387)
            lines.append(line)

    try:
        child.stdin.write(b"START\n")
        child.stdin.flush()
        # the reference's runInput select loop (:605-627), bounded by
        # the batch-face deadline instead of the daemon's term state
        eof = False
        while not eof and (max_lines is None or len(lines) < max_lines):
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            ready, _, _ = select.select([fd], [], [], remaining)
            if not ready:
                break
            chunk = child.stdout.read(65536)
            if not chunk:
                eof = True
                break
            buf += chunk
            while b"\n" in buf and (
                max_lines is None or len(lines) < max_lines
            ):
                raw, buf = buf.split(b"\n", 1)
                take(raw)
    finally:
        if signal_on_close and child.poll() is None:
            child.send_signal(signal.SIGTERM)
        try:
            if child.poll() is None:
                child.stdin.write(b"STOP\n")
                child.stdin.flush()
            child.stdin.close()
            child.wait(timeout=close_timeout_s)
        except (BrokenPipeError, OSError, subprocess.TimeoutExpired):
            child.kill()
    return lines


def improg_spark(
    spark: SparkSession,
    binary: str,
    tag: str,
    severity: int = 5,
    facility: int = 16,
    localhostname: str = "localhost",
    confirm_messages: bool = True,
    signal_on_close: bool = False,
    max_lines: int | None = None,
    timeout_s: float = 10.0,
    parallelism: int | None = None,
) -> DataFrame:
    """improg instance -> transcript-shaped DataFrame.

    ``tag`` is REQUIRED like the param block (improg.c:138-139);
    PRI = facility*8 + severity (msgSetPRI(iFacility|iSeverity) with
    iFacility pre-shifted, :397/:440). Emits the same front-door
    columns as the other sources plus the enqLine message fields the
    reference pre-sets (syslogtag / pri / hostname): conv_id is the
    instance (tag), turn_idx the line ordinal — the single-producer
    line order, which IS the reference's ordering for this input.
    """
    if not tag:
        raise ValueError(
            "improg: mandatory parameter 'tag' not specified "
            "(improg.c:139 CNFPARAM_REQUIRED)"
        )
    lines = improg_lines(
        binary,
        confirm_messages=confirm_messages,
        signal_on_close=signal_on_close,
        max_lines=max_lines,
        timeout_s=timeout_s,
    )
    pri = facility * 8 + severity
    rows = [(tag, i, line) for i, line in enumerate(lines)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, text string"
    )
    if parallelism:
        df = df.repartition(parallelism)
    return (
        df.withColumn("role", F.lit("system"))
        .withColumn("tool", F.lit(""))
        .withColumn("ts", F.current_timestamp())
        .withColumn("syslogtag", F.lit(tag))
        .withColumn("pri", F.lit(pri))
        .withColumn("hostname", F.lit(localhostname))
    )
