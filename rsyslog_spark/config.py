"""Config-as-query frontend: rsyslog.conf (RainerScript subset) -> compiled
pipeline.

The reference's "query language" IS its config (SURVEY §3.1: lex/parse
grammar/lexer.l + grammar/grammar.y -> cnfstmt AST -> optimize ->
activate). This module is the same lifecycle for the Spark engine: text
-> statement AST (rsyslog_spark.route dataclasses) -> RouteCompiler ->
per-sink predicates. A user can bring an rsyslog.conf written in the
supported subset and run it unchanged.

Supported subset (each maps to grammar.y constructs):
- template(name="T" type="string" string="...")      grammar.y obj / template.c
- $template T,"..."                                  legacy directive
- ruleset(name="r") { ... }                          grammar.y:150
- if EXPR then { ... } [else { ... }]                grammar.y:183-228
- EXPR: $prop / $!var refs, string/number literals,
  == != <> < <= > >= contains contains_i startswith startswith_i,
  and/or/not, parens, prifilt("..."), re_match($p,"re"),
  $prop == ["a","b"] array membership                rainerscript.c:3056-3463
- action(type="omfile" file|dynaFile="..." [template="T"])   tools/omfile.c
- action(type="omdiscard")  -> stop                  rainerscript.c:5088
- set $!k = EXPR; unset $!k;                         ruleset.c:220-239
- call rulesetname                                   ruleset.c:283
- stop / ~                                           ruleset.c:595
- legacy selector lines: 'PRIFILT  /path' and ':prop, op, "v"  /path'
                                                     conf.c:350-478
- module(...) / input(...) parsed and recorded (inputs are tables here)
"""

from __future__ import annotations

import os
import re
import shlex
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.coerce import rs_is_number, rs_to_number, rs_to_string
from rsyslog_spark.filters import prifilt_predicate, propfilt_predicate
from rsyslog_spark.functions import rs_re_match
from rsyslog_spark.route import (
    Action,
    Call,
    If,
    RouteCompiler,
    Ruleset,
    Set,
    Stop,
    Unset,
)
from rsyslog_spark.templates import BUILTIN_TEMPLATES, compile_template, resolve_property


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+)
  | (?P<prop>\$[!./]?[A-Za-z0-9_!\.\-]+)
  | (?P<name>[A-Za-z_][A-Za-z0-9_\-\.]*)
  | (?P<op><>|==|!=|<=|>=|<|>|=|\{|\}|\(|\)|\[|\]|,|;|~|&)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"config syntax error at: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


@dataclass
class ParsedConfig:
    templates: dict[str, str] = field(default_factory=dict)
    rulesets: dict[str, Ruleset] = field(default_factory=dict)
    sink_templates: dict[str, str] = field(default_factory=dict)
    modules: list[dict] = field(default_factory=list)
    inputs: list[dict] = field(default_factory=list)
    main: list = field(default_factory=list)  # statements outside rulesets

    def compiler(self) -> RouteCompiler:
        rc = RouteCompiler()
        for rs in self.rulesets.values():
            rc.add(rs)
        if self.main:
            rc.add(Ruleset("main", self.main))
        return rc


class _Parser:
    def __init__(self, tokens, cfg: ParsedConfig):
        self.t = tokens
        self.i = 0
        self.cfg = cfg

    # -- token helpers ---------------------------------------------------
    def peek(self, k=0):
        return self.t[self.i + k] if self.i + k < len(self.t) else (None, None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, val):
        kind, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")
        return v

    # -- top level -------------------------------------------------------
    def parse(self):
        while self.peek()[0] is not None:
            self.cfg_statement(self.cfg.main)
        return self.cfg

    def params(self) -> dict[str, str]:
        """(k="v" k2="v2") parameter list."""
        self.expect("(")
        out = {}
        while self.peek()[1] != ")":
            _, k = self.next()
            self.expect("=")
            kind, v = self.next()
            out[k.lower()] = _unquote(v) if kind == "string" else v
        self.expect(")")
        return out

    def block(self, into: list):
        self.expect("{")
        while self.peek()[1] != "}":
            self.cfg_statement(into)
        self.expect("}")

    def cfg_statement(self, into: list):
        kind, v = self.peek()
        if v == ";":
            self.next()
            return
        if kind == "name":
            lword = v.lower()
            if lword == "template":
                self.next()
                p = self.params()
                if p.get("type", "string") != "string":
                    raise ValueError("only type=string templates supported")
                self.cfg.templates[p["name"]] = p["string"]
                return
            if lword == "ruleset":
                self.next()
                p = self.params()
                body: list = []
                self.block(body)
                self.cfg.rulesets[p["name"]] = Ruleset(p["name"], body)
                return
            if lword == "module":
                self.next()
                self.cfg.modules.append(self.params())
                return
            if lword == "input":
                self.next()
                self.cfg.inputs.append(self.params())
                return
            if lword == "action":
                self.next()
                into.append(self.action(self.params()))
                return
            if lword == "if":
                self.next()
                cond = self.expr()
                _, t = self.next()
                if t != "then":
                    raise ValueError(f"expected 'then', got {t!r}")
                then: list = []
                els: list = []
                self.block(then)
                if self.peek()[1] == "else":
                    self.next()
                    self.block(els)
                into.append(If(cond, then, els))
                return
            if lword == "set":
                self.next()
                _, name = self.next()
                self.expect("=")
                into.append(Set(name, rs_to_string(self.expr())))
                if self.peek()[1] == ";":
                    self.next()
                return
            if lword == "unset":
                self.next()
                _, name = self.next()
                into.append(Unset(name))
                if self.peek()[1] == ";":
                    self.next()
                return
            if lword == "call":
                self.next()
                _, name = self.next()
                into.append(Call(name))
                return
            if lword == "stop":
                self.next()
                into.append(Stop())
                return
        if v == "~":
            self.next()
            into.append(Stop())
            return
        raise ValueError(f"unsupported config statement at {v!r}")

    def action(self, p: dict[str, str]) -> Action | Stop:
        typ = p.get("type", "omfile")
        if typ == "omdiscard":
            # optimizer rewrite omdiscard -> STOP (rainerscript.c:5088)
            return Stop()
        if typ != "omfile":
            raise ValueError(f"unsupported action type {typ!r}")
        path = p.get("file") or p.get("dynafile") or p.get("dynfile")
        if path is None:
            raise ValueError(
                "omfile action requires file= or dynaFile= (omfile.c "
                "mandatory params)"
            )
        sink = os.path.splitext(os.path.basename(path))[0]
        tpl = p.get("template")
        if tpl:
            tpl_text = self.cfg.templates.get(tpl, BUILTIN_TEMPLATES.get(tpl))
            if tpl_text is None:
                raise ValueError(f"unknown template {tpl!r}")
            self.cfg.sink_templates[sink] = tpl
            return Action(sink, compile_template(tpl_text))
        return Action(sink)

    # -- expressions (precedence: or < and < not < cmp < primary) --------
    def expr(self) -> Column:
        left = self.and_expr()
        while self.peek()[1] == "or":
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while self.peek()[1] == "and":
            self.next()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if self.peek()[1] == "not":
            self.next()
            return ~self.not_expr()
        return self.cmp_expr()

    _CMP = {"==", "!=", "<>", "<", "<=", ">", ">="}
    _STR_OPS = {"contains", "contains_i", "startswith", "startswith_i"}

    def cmp_expr(self) -> Column:
        left, left_is_str = self.concat_expr()
        kind, op = self.peek()
        if op in self._CMP or op in self._STR_OPS:
            self.next()
            if self.peek()[1] == "[":
                arr = self.array_literal()
                return self.array_cmp(left, op, arr)
            right, right_is_str = self.concat_expr()
            return self.compare(left, op, right, left_is_str, right_is_str)
        # bare value (boolean property in condition position, or a value
        # expression for `set`) — no coercion here; rsyslog's boolean
        # context truthiness applies var2Number != 0, done by callers
        return left

    def array_literal(self) -> list[str]:
        self.expect("[")
        vals = []
        while self.peek()[1] != "]":
            kind, v = self.next()
            if v == ",":
                continue
            vals.append(_unquote(v) if kind == "string" else v)
        self.expect("]")
        return vals

    def array_cmp(self, left: Column, op: str, arr: list[str]) -> Column:
        """right-side constant array: set membership / ANY-semantics
        (evalStrArrayCmp, rainerscript.c:2950-2983)."""
        if op == "==":
            return left.cast("string").isin(arr)
        if op in ("!=", "<>"):
            return ~left.cast("string").isin(arr)
        if op in ("contains", "contains_i"):
            s = left.cast("string")
            conds = [
                (F.lower(s).contains(v.lower()) if op.endswith("_i")
                 else s.contains(v))
                for v in arr
            ]
            out = conds[0]
            for c in conds[1:]:
                out = out | c
            return out
        raise ValueError(f"array not supported with {op!r}")

    def compare(self, left, op, right, l_str, r_str) -> Column:
        """Mixed-type comparison dance (rainerscript.c:3056-3369): when a
        string side fully converts to a number and the other side is a
        number, compare numerically; else compare as strings."""
        if op in self._STR_OPS:
            ls = rs_to_string(left)
            rs = rs_to_string(right)
            if op == "contains":
                return ls.contains(rs)
            if op == "contains_i":
                return F.lower(ls).contains(F.lower(rs))
            if op == "startswith":
                return ls.startswith(rs)
            return F.lower(ls).startswith(F.lower(rs))
        num_mode = (
            (rs_is_number(left) if l_str else F.lit(True))
            & (rs_is_number(right) if r_str else F.lit(True))
        )
        ln, rn = rs_to_number(left), rs_to_number(right)
        ls, rs = rs_to_string(left), rs_to_string(right)
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<>": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }
        f = ops[op]
        return F.when(num_mode, f(ln, rn)).otherwise(f(ls, rs))

    def concat_expr(self) -> tuple[Column, bool]:
        """``&`` string concat (rainerscript.c:3468-3479: numbers render
        decimal) — binds tighter than comparisons."""
        left, l_str = self.primary()
        while self.peek()[1] == "&":
            self.next()
            right, _ = self.primary()
            left = F.concat(rs_to_string(left), rs_to_string(right))
            l_str = True
        return left, l_str

    def primary(self) -> tuple[Column, bool]:
        """Returns (column, is_stringish) for coercion decisions."""
        kind, v = self.next()
        if v == "(":
            e = self.expr()
            self.expect(")")
            return e, False
        if kind == "string":
            return F.lit(_unquote(v)), True
        if kind == "number":
            return F.lit(int(v)), False
        if kind == "prop":
            return self.prop_column(v), True
        if kind == "name" and v == "prifilt":
            self.expect("(")
            _, sel = self.next()
            self.expect(")")
            return (
                prifilt_predicate(
                    _unquote(sel),
                    F.col("syslogfacility"),
                    F.col("syslogseverity"),
                ),
                False,
            )
        if kind == "name" and v == "exists":
            # exists($!x): property existence, NOT empty-string test
            # (grammar.y:222, msgCheckVarExists msg.h:234)
            self.expect("(")
            _, ref = self.next()
            self.expect(")")
            if ref.startswith(("$!", "$.")):
                return (
                    F.map_contains_key(F.col("vars"), F.lit(ref[2:])),
                    False,
                )
            return resolve_property(ref[1:]).isNotNull(), False
        if kind == "name" and v in ("re_match", "re_match_i"):
            self.expect("(")
            s, _ = self.primary()
            self.expect(",")
            _, pat = self.next()
            self.expect(")")
            return (
                rs_re_match(s, _unquote(pat), case_insensitive=v.endswith("_i")),
                False,
            )
        raise ValueError(f"unsupported expression token {v!r}")

    def prop_column(self, ref: str) -> Column:
        if ref.startswith("$!") or ref.startswith("$."):
            key = ref[2:].replace("!", "!")
            return F.element_at(F.col("vars"), F.lit(key))
        return resolve_property(ref[1:])


_LEGACY_SELECTOR = re.compile(
    r"^\s*(?P<filt>[^\s]+)\s+(?P<target>-?/\S+|\*)\s*$"
)
_LEGACY_PROPFILT = re.compile(
    r"^\s*:(?P<prop>[A-Za-z\-]+),\s*(?P<neg>!?)(?P<op>[a-z]+),\s*"
    r'"(?P<val>[^"]*)"\s+(?P<target>-?/\S+)\s*$'
)
_LEGACY_TEMPLATE = re.compile(r'^\s*\$template\s+(\w+),"(?P<t>[^"]*)"')


def _legacy_line(line: str, cfg: ParsedConfig) -> bool:
    """Handle sysklogd-style lines (conf.c legacy format). Returns True
    if the line was consumed."""
    m = _LEGACY_TEMPLATE.match(line)
    if m:
        cfg.templates[m.group(1)] = m.group("t")
        return True
    m = _LEGACY_PROPFILT.match(line)
    if m:
        sink = os.path.splitext(os.path.basename(m.group("target")))[0]
        pred = propfilt_predicate(
            resolve_property(m.group("prop")),
            m.group("op"),
            m.group("val"),
            negate=bool(m.group("neg")),
        )
        cfg.main.append(If(pred, [Action(sink)]))
        return True
    m = _LEGACY_SELECTOR.match(line)
    if m and ("." in m.group("filt")) and not line.lstrip().startswith(("if", "$")):
        filt = m.group("filt")
        target = m.group("target").lstrip("-")
        sink = os.path.splitext(os.path.basename(target))[0] or "star"
        pred = prifilt_predicate(
            filt, F.col("syslogfacility"), F.col("syslogseverity")
        )
        cfg.main.append(If(pred, [Action(sink)]))
        return True
    return False


def parse_config(text: str) -> ParsedConfig:
    """Parse a config text (RainerScript subset + legacy lines)."""
    cfg = ParsedConfig()
    modern_lines = []
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        if _legacy_line(line, cfg):
            continue
        modern_lines.append(line)
    tokens = _tokenize("\n".join(modern_lines))
    return _Parser(tokens, cfg).parse()


def compile_config(df, text: str, entry: str | None = None):
    """Text config -> (annotated DataFrame, actions). ``entry`` defaults
    to 'main' (statements outside any ruleset) or the single ruleset."""
    cfg = parse_config(text)
    rc = cfg.compiler()
    if entry is None:
        entry = "main" if cfg.main else next(iter(cfg.rulesets))
    return rc.compile(df, entry)
