"""Differential fuzz: contrib rewriter regexes vs independent C-walk
simulators.

Each simulator below is a direct, line-by-line transcription of the
reference parser's pointer walk (cited per function) — an INDEPENDENT
code path from the Java-regex implementations in
rsyslog_spark/parse/contrib.py. A seeded generator produces messages
biased toward the format boundaries (exact length floors, empty
hostnames, separators at end-of-string, case variants, partial-commit
shapes) and both paths must agree byte-for-byte on every one.

This suite already caught one real divergence while being written: the
C's `lenMsg < sizeof(": %")` check counts the NUL and runs before the
space skip, so a message ending exactly at '%' is rewritten — the
first regex draft required a char after '%'.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


# --- simulators (transcribed from the C walks) -----------------------

def sim_cisconames(s: str) -> str:
    """contrib/pmcisconames/pmcisconames.c:105-146."""
    n = len(s)
    i = 0
    while i < n and s[i] == " ":
        i += 1
    if n - i < 34:
        return s
    p = i

    def ch(k: int) -> str:
        return s[p + k] if p + k < n else "\x00"

    if (ch(9) == ":" and ch(12) == ":" and ch(3) == " "
            and ch(6) == " " and ch(15) == " "):
        p += 16
    elif (ch(14) == ":" and ch(17) == ":" and ch(3) == " "
            and ch(6) == " " and ch(11) == " " and ch(20) == " "):
        p += 21
    else:
        return s
    while p < n and s[p] != " ":
        p += 1
    if n - p < 4:            # sizeof(": %") counts the NUL
        return s
    p += 1                   # skip the space
    if s[p:p + 3].lower() != ": %":
        return s
    return s[:p] + s[p + 2:]


def sim_aix(s: str) -> str:
    """contrib/pmaixforwardedfrom/pmaixforwardedfrom.c:62-116."""
    n = len(s)
    i = 0
    while i < n and s[i] == " ":
        i += 1
    if n - i < 24:
        return s
    p = i + 16
    skip = 0
    if s[p:p + 23].lower() == "message forwarded from ":
        skip = 23
    if s[p:p + 5].lower() == "from ":
        skip = 5
    if not skip:
        return s
    if n - p - skip < 2:     # checked BEFORE the memmove
        return s
    s = s[:p] + s[p + skip:]  # preamble removed — partial commit point
    n = len(s)
    q = p
    while q < n and s[q] != " " and s[q] != ":":
        q += 1
    if q >= n:
        return s             # "nothing after colon or no colon at all"
    if s[q] != ":":
        return s             # similar-but-not-AIX: preamble stays gone
    return s[:q] + s[q + 1:]


def sim_snare(s: str, rep: str = "#011") -> str:
    """contrib/pmsnare/pmsnare.c:252-343."""
    n = len(s)
    tl = len(rep)
    if n < 30:
        return s
    p = 0
    while p < n and s[p] not in (" ", "\t", rep[0]):
        p += 1
    snare_end = -1           # index just past the tag (in CURRENT s)
    if n - p > tl and s[p:p + tl].lower() == rep.lower():
        after = p + tl
        if s[after:after + 13].lower() == "mswineventlog":
            snare_end = after + 13
        elif s[after:after + 11].lower() == "linuxkaudit":
            snare_end = after + 11
        else:
            return s         # tab-separated but not Snare: abort
        # collapse the hostname->tag separator to its first char
        s = s[:p + 1] + s[p + tl:]
        snare_end -= tl - 1
    else:
        q = 16
        while q < n and s[q] != " ":
            q += 1
        if q < n:
            q += 1
        rem = n - q
        if rem > 13 and s[q:q + 13].lower() == "mswineventlog":
            snare_end = q + 13
        elif rem > 11 and s[q:q + 11].lower() == "linuxkaudit":
            snare_end = q + 11
    if snare_end < 0:
        return s
    # remove the tab after the tag: skip one char, drop tl-1 chars
    t = snare_end + 1
    return s[:t] + s[t + tl - 1:]


# --- generator -------------------------------------------------------

def _gen_corpus(seed: int, n: int) -> list:
    rng = random.Random(seed)
    months = ["May", "Jan", "Xyz", "Oct"]
    hosts = ["fw01", "", "a", "host-x", "::1", "h#x", "h\tx"[:2]]
    tails = [": %ASA-1-0: msg", ": %", ": % ", ": ASA", " : %T: m",
             ":%T: m", ": %T-1: " + "x" * 20]
    out = []
    for _ in range(n):
        kind = rng.randrange(6)
        sp = " " * rng.randrange(3)
        if kind == 0:      # cisconames-ish short ts
            ts = (f"{rng.choice(months)} {rng.randrange(10, 99)} "
                  f"{rng.randrange(10, 99)}:{rng.randrange(10, 99)}:"
                  f"{rng.randrange(10, 99)} ")
            out.append(sp + ts + rng.choice(hosts) + rng.choice(tails)
                       + "x" * rng.randrange(0, 20))
        elif kind == 1:    # cisconames long ts
            ts = (f"{rng.choice(months)} {rng.randrange(10, 99)} "
                  f"{rng.randrange(1000, 9999)} {rng.randrange(10, 99)}:"
                  f"{rng.randrange(10, 99)}:{rng.randrange(10, 99)} ")
            out.append(sp + ts + rng.choice(hosts) + rng.choice(tails))
        elif kind == 2:    # aix-ish
            pre = rng.choice(["Message forwarded from ", "From ", "FROM ",
                              "from ", "Fro", "Msg from "])
            host = rng.choice(["srv1:", "srv1", "srv one:", ":", "",
                               "s:extra:"])
            out.append(sp + "X" * 16 + pre + host + " rest of msg"
                       [:rng.randrange(0, 12)])
        elif kind == 3:    # snare-ish
            rep = rng.choice(["#011", "\t"])
            tag = rng.choice(["MSWinEventLog", "LinuxKAudit", "NotSnare",
                              "mswineventlog"])
            out.append(rng.choice(["winhost", "h", ""]) + rep + tag + rep
                       + "5" + rep + "Security" + "p" * rng.randrange(0, 20))
        elif kind == 4:    # random junk
            out.append("".join(rng.choice(" abc:%#\t0") for _ in
                               range(rng.randrange(0, 50))))
        else:              # boundary paddings of a valid cisco line
            base = "May 28 16:09:56 fw01 : %S-5-C: m"
            cut = rng.randrange(20, len(base) + 1)
            out.append(base[:cut] + "z" * rng.randrange(0, 8))
    return out


CORPUS = _gen_corpus(20260817, 350)


class TestContribFuzz:
    def _run(self, spark, fn_col, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        out = df.withColumn("fixed", fn_col(F.col("text")))
        return [r["fixed"] for r in out.orderBy("i").collect()]

    def test_cisconames_differential(self, spark):
        from rsyslog_spark.parse.contrib import fix_cisconames

        got = self._run(spark, fix_cisconames, CORPUS)
        exp = [sim_cisconames(t) for t in CORPUS]
        bad = [(t, g, e) for t, g, e in zip(CORPUS, got, exp) if g != e]
        assert not bad, bad[:3]

    def test_aix_differential(self, spark):
        from rsyslog_spark.parse.contrib import fix_aix_forwarded_from

        got = self._run(spark, fix_aix_forwarded_from, CORPUS)
        exp = [sim_aix(t) for t in CORPUS]
        bad = [(t, g, e) for t, g, e in zip(CORPUS, got, exp) if g != e]
        assert not bad, bad[:3]

    @pytest.mark.parametrize("rep", ["#011", "\t"])
    def test_snare_differential(self, spark, rep):
        from rsyslog_spark.parse.contrib import fix_snare

        got = self._run(spark, lambda c: fix_snare(c, rep), CORPUS)
        exp = [sim_snare(t, rep) for t in CORPUS]
        bad = [(t, g, e) for t, g, e in zip(CORPUS, got, exp) if g != e]
        assert not bad, bad[:3]


# --- pmdb2diag differential ------------------------------------------

def sim_db2diag(s: str, levelpos=59, timepos=0,
                timeformat="%Y-%m-%d-%H.%M.%S.", pid_shift=49):
    """contrib/pmdb2diag/pmdb2diag.c:62-146 transcription. Returns
    (ok, severity, ts_utc_micros, procid, appname) with None for unset
    fields; timestamp via Python's OWN strptime — an independent
    implementation from the Column regex."""
    import time as _time

    n = len(s)
    if n < levelpos + 4:
        return (False, None, None, None, None)
    lvl = s[levelpos:levelpos + 1]
    table = {"C": (0, 8), "A": (1, 5), "S": (2, 6), "W": (4, 7),
             "I": (6, 4), "D": (7, 5)}
    if lvl in table:
        sev, lvl_len = table[lvl]
    elif lvl == "E":
        sev = 3 if s[levelpos + 1:levelpos + 2] == "r" else 5
        lvl_len = 5
    else:
        return (True, None, None, None, None)   # ABORT_FINALIZE(0)
    if n < levelpos + lvl_len:
        return (False, None, None, None, None)

    ts_us = None
    # strptime needs an exact prefix; emulate C strptime's partial
    # match by trying successively longer prefixes of the region
    region = s[timepos:]
    fmt = timeformat
    matched_len = None
    for ln in range(len(fmt), len(region) + 1):
        try:
            tm = _time.strptime(region[:ln], fmt)
            matched_len = ln
            break
        except ValueError:
            continue
    if matched_len is not None:
        rest = region[matched_len:]
        i = 0
        while i < len(rest) and rest[i].isdigit():
            i += 1
        frac_digits = rest[:i]
        tz = 0
        if i < len(rest) and rest[i] in "+-":
            j = i + 1
            while j < len(rest) and rest[j].isdigit():
                j += 1
            if j > i + 1:
                tz = int(rest[i + 1:j]) * (1 if rest[i] == "+" else -1)
        import calendar
        epoch = calendar.timegm(tm)
        frac = (int(frac_digits) / (10 ** len(frac_digits))
                if frac_digits else 0.0)
        ts_us = int(round((epoch + frac - tz * 60) * 1_000_000))

    procid = appname = None
    colon = s.find(":", levelpos + lvl_len)
    if colon >= 0:
        pid_start = colon + 2
        sp = s.find(" ", pid_start)
        if sp >= 0:
            procid = s[pid_start:sp]
        prog_start = pid_start + pid_shift
        if prog_start < n:
            ep = s.find(" ", prog_start)
            bs = s.find("\\", prog_start)
            stops = [x for x in (ep, bs) if x >= 0]
            stop = min(stops) if stops else n
            appname = s[prog_start:stop]
    return (True, sev, ts_us, procid, appname)


def _gen_db2(seed: int, n: int) -> list:
    rng = random.Random(seed)
    out = []
    levels = ["Error", "Event", "Warni", "Info", "Debug", "Criti",
              "Alert", "Sever", "Xyzzy", "Er"]
    for _ in range(n):
        ts = (f"2024-{rng.randrange(1, 13):02d}-"
              f"{rng.randrange(1, 29):02d}-"
              f"{rng.randrange(0, 24):02d}.{rng.randrange(0, 60):02d}."
              f"{rng.randrange(0, 60):02d}.")
        ts += rng.choice(["", "123", "123456"])
        ts += rng.choice(["", "+060", "-300", "+0"])
        body = ts + " " * max(0, 59 - len(ts)) + rng.choice(levels)
        if rng.random() < 0.8:
            body += rng.choice([" PID : 12345 ", " PID :", "  x "])
        pad = rng.randrange(0, 60)
        body += "p" * pad
        if rng.random() < 0.5:
            body += rng.choice(["db2sysc 0", "db2sy\\sc", "prog"])
        if rng.random() < 0.1:
            body = body[:rng.randrange(0, len(body))]
        out.append(body)
    return out


class TestDb2Fuzz:
    def test_differential(self, spark):
        from rsyslog_spark.parse.db2diag import parse_db2diag

        corpus = _gen_db2(424242, 250)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], "i long, text string"
        )
        rows = {r["i"]: r for r in parse_db2diag(df).collect()}
        bad = []
        for i, t in enumerate(corpus):
            ok, sev, ts_us, procid, appname = sim_db2diag(t)
            r = rows[i]
            got_ts = (int(r["db2_ts"].timestamp() * 1_000_000)
                      if r["db2_ts"] is not None else None)
            got = (r["db2_ok"], r["db2_severity"], got_ts,
                   r["db2_procid"], r["db2_appname"])
            # severity/ts only materialize past the full-level check in
            # the impl; sim mirrors that by construction
            exp = (ok, sev, ts_us, procid, appname)
            if got != exp:
                bad.append((t, got, exp))
        assert not bad, bad[:3]
