"""imbatchreport: batch-report files -> ONE message per file
(contrib/imbatchreport/imbatchreport.c, 1033 LoC).

The reference polls a glob of finished batch-report files and submits
each whole file as a single message (readAndSendFile :238-397):

- a trailing ``[...]`` block (searched within the LAST 150 bytes after
  trailing-whitespace trim, SRUCTDATA_BUFFER_LEN :86) becomes the
  STRUCTURED-DATA with its embedded newlines REMOVED (:282-296);
  ``timestampkey`` reads the epoch digits after ``<key>=`` (lenTSk =
  len+1, :299-308) overriding the file-mtime timestamp; ``programkey``
  reads the value after ``<key>="`` up to the closing quote (lenProgk
  = len+2, :311-321) into APP-NAME; the block and the whitespace
  before it leave the MSG;
- the MSG body: every TAB becomes a space, runs of spaces collapse to
  ONE when ``deduplicatespace`` (with dedup OFF every space/tab still
  copies as ' ' — ``last_is_space`` can never latch, :348-370);
  each LF becomes the literal two chars ``\\n`` (with a space
  immediately before a LF dropped under dedup, :356-362);
- a file whose transformed body exceeds ``max_msg_size`` sends
  ``File too large : <path>`` instead and is handled as rejected
  (:377-383, FILE_TOO_LARGE :88);
- completion: ``rename="<regex> <sent> <rejected>"`` renames the file
  to ``path[:match.start] + suffix`` (sent on success / rejected on
  too-large-or-failure; '-' as sent = empty suffix); ``delete="<regex>
  <rejected>"`` unlinks on success, renames to rejected otherwise
  (:462-495; the two params are EXCLUSIVE and their regex/arity are
  config errors, :569-641); a file the action regex does not match
  STOPS the instance (it could never leave the glob scope, :455-459);
- message fields (enqMsg :199-220): HOSTNAME = localhostname, TAG,
  PROCID = MSGID = '-', facility>>3 (param stored pre-shifted,
  defaults LOG_LOCAL0/LOG_NOTICE :542-543), mtime timestamp in UTC.

Spark shape: one POLL is a batch read on the driver (file-system walk
+ rename/delete side effects are inherently sequential, like the
daemon's single poll loop); the per-file transform is pure and the
resulting frame feeds the normal pipeline. Scale = many instances /
polls; each file is one row.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import stat as _stat

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SD_BUFFER_LEN = 150
FILE_TOO_LARGE = "File too large : "


def _parse_action(spec: str, kind: str) -> tuple[re.Pattern, str, str]:
    """rename/delete param split (imbatchreport.c:569-641): tabs
    normalize to spaces, fields separated by space runs; rename takes
    (regex, sent, rejected) with '-' sent meaning empty; delete takes
    (regex, rejected). Wrong arity / bad regex = config error."""
    s = spec.replace("\t", " ")
    parts = [p for p in s.split(" ") if p != ""]
    want = 3 if kind == "rename" else 2
    if len(parts) < want:
        if kind == "rename":
            raise ValueError(
                "imbatchreport: 'rename' must specify THREE parameters "
                "separated by spaces or tabs ! The second parameter "
                "can be a null string to get this use a '-'. "
                "(imbatchreport.c:594-600)"
            )
        raise ValueError(
            "imbatchreport: 'delete' must specify TWO parameters "
            "separated by spaces or tabs ! (imbatchreport.c:634-638)"
        )
    try:
        preg = re.compile(parts[0])
    except re.error:
        raise ValueError(
            f"imbatchreport: The first part of '{kind}' parameter "
            "does not contain a valid regex "
            "(imbatchreport.c:585/:624)"
        )
    if kind == "rename":
        sent = "" if parts[1] == "-" else parts[1]
        return preg, sent, parts[2]
    return preg, "", parts[1]


def _extract_sd(content: bytes):
    """The structured-data tail walk (readAndSendFile :262-330) on the
    raw bytes. Returns (body_end, sd_text, ts_epoch_digits_fn,
    prog_fn) — body_end is the exact file_len the C computes,
    including its quirk: a trailing ']' whose '[' is NOT within the
    150-byte window still drops the scanned tail from the message."""
    file_len = len(content)
    sd_buf_l = min(file_len, _SD_BUFFER_LEN)
    buf = bytearray(content[file_len - sd_buf_l:])
    sd_text = None
    p = sd_buf_l - 1
    # trim trailing whitespace (each trim also shortens the file)
    while p > 0 and buf[p] in b"\n\t ":
        p -= 1
        file_len -= 1
    nb_rm = 0
    stdata_len = 0
    if p >= 1 and buf[p] == ord("]"):
        stdata_len = 1
        while p > 0 and buf[p] != ord("["):
            if buf[p] == ord("\n"):
                # LF not supported in structured data: removed
                del buf[p]
                nb_rm += 1
                p -= 1
                continue
            p -= 1
            stdata_len += 1
        if buf[p] == ord("["):
            sd_text = bytes(buf[p:p + stdata_len]).decode(
                "utf-8", "replace"
            )
            p -= 1
            while p > 0 and buf[p] in b"\n\t ":
                p -= 1
                nb_rm += 1
        # the C subtracts unconditionally — a ']' tail with no '['
        # in the window silently drops the scanned bytes too
    file_len -= nb_rm + stdata_len
    return file_len, sd_text


def _transform_body(
    content: bytes, dedup_space: bool, max_msg_size: int
) -> tuple[str, bool]:
    """The char loop (:346-371): tab/space -> ' ' (collapsed under
    dedup), LF -> literal backslash-n (dropping one space before it
    under dedup). Returns (msg, too_large)."""
    out = bytearray()
    last_is_space = False
    too_large = False
    for b in content:
        if len(out) >= max_msg_size:
            too_large = True
            break
        if b in (0x09, 0x20):
            if not last_is_space:
                out.append(0x20)
            last_is_space = dedup_space
        elif b == 0x0A:
            if last_is_space:
                out.pop()
            out += b"\\n"
            last_is_space = False
        else:
            out.append(b)
            last_is_space = False
    return out.decode("utf-8", "replace"), too_large


def batchreport_poll(
    reports: str,
    tag: str,
    severity: int = 5,
    facility: int = 16,
    rename: str | None = None,
    delete: str | None = None,
    program_key: str | None = None,
    timestamp_key: str | None = None,
    dedup_space: bool = False,
    max_msg_size: int = 8192,
    localhostname: str = "localhost",
) -> list[dict]:
    """One poll of the reports glob: read, transform, and apply the
    completion action per file. Returns one message dict per file."""
    if (rename is None) == (delete is None):
        raise ValueError(
            "imbatchreport: 'rename' and 'delete' are exclusive ! "
            "(one of them is required; imbatchreport.c:570-573)"
        )
    kind = "rename" if rename is not None else "delete"
    preg, sent_sfx, reject_sfx = _parse_action(rename or delete, kind)

    msgs: list[dict] = []
    for fpath in sorted(_glob.glob(reports)):
        st = os.stat(fpath)
        if not _stat.S_ISREG(st.st_mode):
            continue
        m = preg.search(fpath)
        if m is None:
            # could never leave the glob scope -> instance stops
            # (:455-459)
            break
        content = open(fpath, "rb").read()
        body_end, sd_text = _extract_sd(content)
        ts_epoch = int(st.st_mtime)
        app_name = None
        if sd_text is not None:
            if timestamp_key:
                at = sd_text.find(timestamp_key)
                if at >= 0:
                    ts_epoch = 0
                    for c in sd_text[at + len(timestamp_key) + 1:]:
                        if not c.isdigit():
                            break
                        ts_epoch = ts_epoch * 10 + int(c)
            if program_key:
                at = sd_text.find(program_key)
                if at >= 0:
                    val = sd_text[at + len(program_key) + 2:]
                    q = val.find('"')
                    if q >= 0:
                        app_name = val[:q]
        msg, too_large = _transform_body(
            content[:body_end], dedup_space, max_msg_size
        )
        if too_large:
            # the SD / APP-NAME / SD-timestamp were set on the message
            # BEFORE the body read in the C (:260-330 precede :346) —
            # a too-large file keeps them; only the MSG is replaced
            msg = FILE_TOO_LARGE + fpath
        msgs.append(
            {
                "filename": os.path.basename(fpath),
                "msg": msg,
                "structured_data": sd_text if sd_text else "-",
                "app_name": app_name,
                "syslogtag": tag,
                "pri": facility * 8 + severity,
                "hostname": localhostname,
                "procid": "-",
                "msgid": "-",
                "ts_epoch": ts_epoch,
                "too_large": too_large,
            }
        )
        # completion action (:462-495): rename keeps path[:match
        # start] + suffix; delete unlinks on success
        if kind == "rename" or too_large:
            new = fpath[: m.start()] + (
                reject_sfx if too_large else sent_sfx
            )
            os.rename(fpath, new)
        else:
            os.unlink(fpath)
    return msgs


def batchreport_spark(spark: SparkSession, **kw) -> DataFrame:
    """Poll + parallelize into a message frame (timereported from the
    epoch in UTC — the engine's pinned session zone, timeval2syslogTime
    TIME_IN_UTC :334)."""
    rows = batchreport_poll(**kw)
    schema = (
        "filename string, msg string, structured_data string, "
        "app_name string, syslogtag string, pri int, hostname string, "
        "procid string, msgid string, ts_epoch long, too_large boolean"
    )
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], schema
    )
    return df.withColumn(
        "timereported", F.timestamp_seconds(F.col("ts_epoch"))
    )
