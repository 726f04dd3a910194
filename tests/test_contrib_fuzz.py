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
