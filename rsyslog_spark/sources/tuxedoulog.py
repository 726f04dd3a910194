"""imtuxedoulog: Oracle Tuxedo ULOG files -> messages
(contrib/imtuxedoulog/imtuxedoulog.c, 856 LoC).

ULOG lines look like ``hhmmss.fff.host!process.pid.thread.ctx: [gtrid
...: ] [ECID <...>: ] text``. The reference polls the day's file
(``ulogbase.MMDDYY`` built from the current localtime, :148-150) and
parses each line (parseMsg :205-305):

- hh/mm/ss from chars 0-5 via the ``^0x30`` walk, rejected outside
  0-23/0-59/0-59; fraction = atoi at char 7, precision 2 when char 9
  is '.' else 3; the DATE comes from the polled file's day;
- hostname = chars from index 10/11 (frac-width dependent) up to the
  mandatory '!'; PROCID = process.pid.thread — the walk back from the
  mandatory ':' to the last '.' drops the context id (:249-254);
- a ``gtrid ...:`` block is skipped entirely (:257-262);
- an ``ECID <value>:`` block becomes STRUCTURED-DATA via an in-place
  rewrite to ``[ECID="value"] `` — the C's length math INCLUDES the
  trailing space in the SD (text advanced 3 past '>', SD span ends
  after it, :266-283), which is why the reference e2e golden renders
  two spaces before the message text (tests/imtuxedoulog_data.sh);
- the message is the remainder; TAG = the ``tag`` param (APP-NAME
  renders from it), facility/severity like the other inputs.

Spark shape: a poll is a batch file read on the driver; one row per
line through the normal pipeline. ``date`` pins the polled day for
deterministic tests (the daemon uses "now").
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_ulog_line(line: str) -> dict | None:
    """One parseMsg walk (imtuxedoulog.c:205-305). Returns None on
    RS_RET_COULD_NOT_PARSE (the line is skipped like the reference's
    ratelimiter path on parse failure)."""
    if len(line) < 11:
        return None

    def d(c: str) -> int:
        return ord(c) ^ 0x30

    hour = d(line[0]) * 10 + d(line[1])
    minute = d(line[2]) * 10 + d(line[3])
    sec = d(line[4]) * 10 + d(line[5])
    if not (0 <= hour <= 23 and 0 <= minute <= 59 and 0 <= sec <= 59):
        return None
    host_at = 11 if line[10] == "." else 10
    bang = line.find("!", host_at)
    if bang < 0:
        return None
    prog_at = bang + 1
    colon = line.find(":", prog_at)
    if colon < 0:
        return None
    # atoi(rawMsg+7): leading digit run
    frac = 0
    for c in line[7:]:
        if not c.isdigit():
            break
        frac = frac * 10 + int(c)
    prec = 2 if len(line) > 9 and line[9] == "." else 3
    # PROCID: strip the trailing .ctx (walk back ':'-> '.', :249-254)
    dot = line.rfind(".", prog_at, colon + 1)
    if dot > prog_at:
        procid = line[prog_at:dot]
    else:
        procid = line[prog_at:colon]
    after: int | None = colon + 2
    if line[after:after + 5] == "gtrid":
        c2 = line.find(":", after)
        after = c2 + 2 if c2 >= 0 else None
    sd = None
    text_at = after
    if after is not None and line[after:after + 4] == "ECID":
        gt = line.find(">", after + 6)
        if gt >= 0:
            # in-place rewrite ECID <v>: -> [ECID="v"] ; the SD span
            # keeps the trailing space (:273-281)
            sd = '[ECID="' + line[after + 6:gt] + '"] '
            text_at = gt + 3
    if text_at is not None:
        msg = line[text_at:]
    else:
        msg = line  # text==NULL: raw message stays the whole line
    return {
        "hostname": line[host_at:bang],
        "procid": procid,
        "msg": msg,
        "structured_data": sd if sd else "-",
        "hour": hour,
        "minute": minute,
        "second": sec,
        "frac": frac,
        "frac_precision": prec,
    }


def tuxedoulog_poll(
    ulogbase: str,
    tag: str,
    severity: int = 5,
    facility: int = 16,
    date: _dt.date | None = None,
    localhostname: str = "localhost",
) -> list[dict]:
    """Read the day's ULOG file (``ulogbase.MMDDYY``, :148-150) and
    parse every non-empty line. ``tag``/``ulogbase`` are the two
    REQUIRED params (:121-122)."""
    if not ulogbase or not tag:
        raise ValueError(
            "imtuxedoulog: 'ulogbase' and 'tag' are mandatory "
            "(imtuxedoulog.c:121-122 CNFPARAM_REQUIRED)"
        )
    day = date or _dt.date.today()
    path = f"{ulogbase}.{day.month:02d}{day.day:02d}{day.year % 100:02d}"
    msgs: list[dict] = []
    if not os.path.exists(path):
        return msgs
    with open(path, "r", errors="replace") as fh:
        for idx, raw in enumerate(fh):
            line = raw.rstrip("\n")
            if not line:
                continue  # empty lines are not processed
            p = parse_ulog_line(line)
            if p is None:
                continue
            us = p["frac"] * 10 ** (6 - p["frac_precision"])
            ts = _dt.datetime(
                day.year, day.month, day.day,
                p["hour"], p["minute"], p["second"],
                min(us, 999999),
            )
            msgs.append(
                {
                    "turn_idx": idx,
                    "msg": p["msg"],
                    "hostname": p["hostname"],
                    "procid": p["procid"],
                    "structured_data": p["structured_data"],
                    "syslogtag": tag,
                    "app_name": tag,
                    "msgid": "-",
                    "pri": facility * 8 + severity,
                    "ts": ts,
                }
            )
    return msgs


def tuxedoulog_spark(spark: SparkSession, **kw) -> DataFrame:
    rows = tuxedoulog_poll(**kw)
    schema = (
        "turn_idx long, msg string, hostname string, procid string, "
        "structured_data string, syslogtag string, app_name string, "
        "msgid string, pri int, ts timestamp"
    )
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows], schema
    ).withColumnRenamed("ts", "timereported")
