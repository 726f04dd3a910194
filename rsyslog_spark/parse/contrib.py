"""Contrib parser dialects pmcisconames + pmaixforwardedfrom.

Both reference modules are message REWRITERS, not field parsers: they
always return RS_RET_COULD_NOT_PARSE so the NEXT parser in the chain
(typically rsyslog.rfc3164) parses the message — but they mutate the
raw message in place first, stripping a vendor preamble that would
otherwise confuse the hostname/TAG heuristics.

- ``fix_cisconames`` (contrib/pmcisconames/pmcisconames.c:105-146):
  after permitting leading spaces and requiring >= 34 chars, the walk
  needs one of two POSITIONAL timestamp shapes (only the listed
  offsets are checked, every other char is a wildcard):

      'Mmm DD HH:MM:SS '       spaces at 3,6,15, ':' at 9,12  -> skip 16
      'Mmm DD YYYY HH:MM:SS '  spaces at 3,6,11,20, ':' at 14,17 -> 21

  (short checked FIRST and committed — modeled with an atomic group so
  the regex cannot backtrack into the long shape the way the C cannot),
  then walks past the hostname to the next space and requires the
  case-insensitive opener ": %" with at least one char after it
  (the `lenMsg < sizeof(": %")` check counts the NUL). The two chars
  ": " are then removed (memmove by 2):

      'Mmm  1 00:00:01 fw01 : %ASA-1-000000: x'
   -> 'Mmm  1 00:00:01 fw01 %ASA-1-000000: x'

- ``fix_aix_forwarded_from``
  (contrib/pmaixforwardedfrom/pmaixforwardedfrom.c:62-116): after
  leading spaces and >= 24 chars, skips 16 timestamp chars WITHOUT
  validating them, then requires the case-insensitive preamble
  "Message forwarded from " (skip 23) or "From " (skip 5) with >= 2
  chars after it, removes the preamble, then walks to the first ' ' or
  ':' — only a ':' continues (one more memmove removes it); a ' '
  aborts, BUT the preamble removal has already mutated the message and
  PERSISTS (the C logs "similar enough that the preamble has been
  removed" and aborts after the first memmove). Both stages are
  modeled as separate conditional rewrites to keep that partial-commit
  behavior bit-exact:

      'Oct 11 11:11:11 Message forwarded from srv1: su: login ok'
   -> 'Oct 11 11:11:11 srv1 su: login ok'

Both parsers declare AutomaticPRIParsing, so the rewrite applies to the
post-PRI text; in a chain the mutated raw feeds every later instance
(chain_custom threads the rewritten column through), and the intended
pairing — rewrite then the stock rfc3164 chain — is
``with_parsed(rewrite_text(df, ['pmcisconames']))`` (the helper splits
the "<pri>" prefix with the exact with_pri rules first; the bare
``fix_*`` Column functions expect POST-PRI text).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# positional timestamp shapes — only the offsets the C checks are
# constrained; (?s) because the C positional tests accept ANY byte
# (including newline) at the wildcard offsets
_TS_SHORT = r".{3} .{2} .{2}:.{2}:.{2} "
_TS_LONG = r".{3} .{2} .{4} .{2}:.{2}:.{2} "

# atomic (?>short|long): the C commits to the short shape when its
# offsets match and never retries the long one, even if committing
# makes the rest of the walk fail
# NOTE the missing lookahead after '%': the C length check
# `lenMsg < sizeof(": %")` (pmcisconames.c:123) counts the NUL *and*
# runs BEFORE the space is skipped, so " : %" (4 chars) at the end of
# the message satisfies it — a message ending exactly at '%' IS
# rewritten (caught by the differential fuzz vs the C-walk simulator)
_CISCO_PAT = (
    r"(?s)^( *+)((?>" + _TS_SHORT + r"|" + _TS_LONG + r"))"
    r"([^ ]*+) (?i:: %)"
)

_AIX_PRE_PAT = (
    r"(?s)^( *+)(.{16})(?i:Message forwarded from |From )(?=.{2})"
)
_AIX_COLON_PAT = r"(?s)^( *+)(.{16})([^ :]*+):"


def fix_cisconames(col: Column) -> Column:
    """Rewritten text (unchanged when the walk rejects the line)."""
    # the >= 34 floor (pmcisconames.c:79) applies after leading spaces
    eligible = F.length(F.ltrim(col)) >= 34
    fixed = F.regexp_replace(col, _CISCO_PAT, r"$1$2$3 %")
    return F.when(eligible, fixed).otherwise(col)


def fix_aix_forwarded_from(col: Column) -> Column:
    """Rewritten text; the preamble removal persists even when the
    colon stage aborts (the reference's partial-commit memmove)."""
    eligible = F.length(F.ltrim(col)) >= 24
    stage1 = F.regexp_replace(col, _AIX_PRE_PAT, r"$1$2")
    # colon removal only runs when stage1 actually fired (the C only
    # reaches the second memmove through the preamble branch)
    stage2 = F.when(
        stage1 != col, F.regexp_replace(stage1, _AIX_COLON_PAT, r"$1$2$3")
    ).otherwise(stage1)
    return F.when(eligible, stage2).otherwise(col)


def _repl_lit(s: str) -> str:
    """Escape a literal for a Java regex REPLACEMENT string."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def fix_snare(col: Column, tab_representation: str = "#011") -> Column:
    """pmsnare (contrib/pmsnare/pmsnare.c:252-343): always-decline
    rewriter that collapses the tab separators of Snare-agent events
    ("MSWinEventLog" / "LinuxKAudit") to a single character.

    ``tab_representation`` is what a tab looks like AFTER the
    receive-side escaping (pmsnare.c endCnfLoad): "#011" under the
    engine defaults (escapeControlCharactersOnReceive=on + escapeTab=on
    + prefix '#', glbl.c:127-132), "\\\\t" with the C-style option, or
    a raw TAB when escaping is off. Each separator of length
    ``len(tab_representation)`` is collapsed to its FIRST char (the C
    memmove keeps byte 0 and removes the rest — a raw tab is therefore
    a validated no-op).

    The walk (post-PRI, >= 30 chars): scan to the first ' '/TAB/
    ``tab_representation[0]``; if the full tab representation matches
    there case-insensitively (with >= 1 char after it), the message
    must carry a Snare tag right after it or it is left alone
    ("Tab-separated but no Snare tag -> can't be Snare!"); otherwise
    the syslog-shaped variant is tried: 16 timestamp chars skipped
    UNVALIDATED, hostname to the next space, then the tag. On success
    both the hostname->tag separator (tab-separated form) and the
    separator AFTER the tag are collapsed. The C removes the after-tag
    chars without verifying them; this version requires them to exist
    (the C would memmove out of bounds otherwise)."""
    import re as _re

    rep = tab_representation
    c0, tl = rep[0], len(rep)
    drop = tl - 1
    cls = "[^ \\t" + _re.escape(c0) + "]*+"
    rep_pat = "(?i:" + _re.escape(rep) + ")"
    tag = "((?i:MSWinEventLog|LinuxKAudit))"
    after = "([\\s\\S])[\\s\\S]{" + str(drop) + "}"
    gate = "^" + cls + rep_pat + "[\\s\\S]"
    pat_tab = "^(" + cls + ")" + rep_pat + tag + after
    pat_sys = "^([\\s\\S]{16})([^ ]*) " + tag + after
    eligible = F.length(col) >= 30
    fixed_tab = F.regexp_replace(
        col, pat_tab, "$1" + _repl_lit(c0) + "$2$3"
    )
    fixed_sys = F.regexp_replace(col, pat_sys, "$1$2 $3$4")
    return (
        F.when(~eligible, col)
        .when(col.rlike(gate), fixed_tab)
        .otherwise(fixed_sys)
    )


def _pan_rewrite_one(s: str) -> str:
    """Exact pmpanngfw walk (contrib/pmpanngfw/pmpanngfw.c:95-250) on
    one post-PRI message. Returns the rewritten text (self when the
    message is not PAN-OS-shaped)."""
    # first 3 commas
    count = 0
    p = -1
    for i, ch in enumerate(s):
        if ch == ",":
            count += 1
            if count == 3:
                p = i + 1
                break
    if p < 0 or len(s) - p < 8:
        return s
    f4 = s[p:p + 8]
    # the uint64 mask table: 4th field must be one of the log types,
    # comma-terminated ("TRAFFIC," is the full-8-byte mask)
    if not (
        f4 == "TRAFFIC,"
        or f4[:7] in ("THREAT,", "CONFIG,", "SYSTEM,")
    ):
        return s
    out: list = []
    state = 0  # FIELD_START / IN_FIELD / IN_QUOTE / QUOTE_QUOTE
    i = p
    n = len(s)
    while i < n:
        c = s[i]
        if state == 0:
            if c == '"':
                state = 2
            elif c == ",":
                out.append("\t")
            else:
                state = 1
                out.append(c)
        elif state == 1:
            if c == ",":
                state = 0
                out.append("\t")
            else:
                out.append(c)
        elif state == 2:
            if c == '"':
                state = 3
            else:
                out.append(c)
        else:  # QUOTE_QUOTE
            if c == '"':
                state = 2
                out.append('"')
            elif c == ",":
                state = 0
                out.append("\t")
            else:
                # martian char after a closing quote: the C aborts
                # WITHOUT shortening the message — the compacted
                # prefix overwrote bytes p..p+len(out) in place and
                # the rest is untouched (partial commit, like the aix
                # rewriter's first stage)
                body = "".join(out)
                return s[:p] + body + s[p + len(body):]
        i += 1
    return s[:p] + "".join(out)


def fix_panngfw(col: Column) -> Column:
    """pmpanngfw (contrib/pmpanngfw): always-decline rewriter that
    converts the PAN-OS CSV body (4th field = THREAT/TRAFFIC/CONFIG/
    SYSTEM after the 3-field syslog preamble) to TAB-separated fields,
    stripping CSV quotes and collapsing '""' escapes — a character
    state machine, so it runs as an Arrow-batched pandas UDF (one
    Python pass per batch; the per-char loop is the operator, exactly
    like the reference's in-place walk)."""

    @F.pandas_udf("string")
    def _fix(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _pan_rewrite_one(t) if isinstance(t, str) else t
        )

    return _fix(col)


_REWRITERS = {
    "pmcisconames": fix_cisconames,
    "pmaixforwardedfrom": fix_aix_forwarded_from,
    "pmsnare": fix_snare,
    "pmpanngfw": fix_panngfw,
}


def rewriter(ptype: str, inst: dict | None = None):
    """The rewrite fn (Column -> Column) for a contrib parser type, or
    None. ``inst`` carries instance params (pmsnare's
    tab.representation)."""
    fn = _REWRITERS.get(ptype)
    if fn is None:
        return None
    if ptype == "pmsnare":
        rep = str((inst or {}).get("tab.representation", "#011"))
        return lambda c: fix_snare(c, rep)
    return fn


def rewrite_text(df, types, text_col: str = "text"):
    """Apply contrib rewriters to ``text_col`` the way the chain does:
    both modules declare AutomaticPRIParsing, so the walk starts AFTER
    the "<pri>" prefix — the prefix is split off with the exact
    with_pri rules, the rewrites run on the remainder in order, and
    the full text is reassembled. This is the standalone entry for the
    rewrite-then-default-chain pairing:

        with_parsed(rewrite_text(df, ["pmcisconames"]))
    """
    from rsyslog_spark.parse.pri import with_pri

    out = with_pri(df, raw_col=text_col)
    prefix = F.expr(
        f"substring({text_col}, 1, "
        f"length({text_col}) - length(rawmsg_after_pri))"
    )
    fixed = F.col("rawmsg_after_pri")
    for t in types:
        fn = _REWRITERS.get(t)
        if fn is None:
            raise ValueError(f"unknown contrib rewriter {t!r}")
        fixed = fn(fixed)
    out = out.withColumn(text_col, F.concat(prefix, fixed))
    added = [c for c in out.columns if c not in df.columns]
    return out.drop(*added)
