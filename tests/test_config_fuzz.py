"""Property-based differential test: config expression grammar vs an
independent Python model of RainerScript evaluation semantics
(var2Number/var2String coercion rainerscript.c:1412-1456, numeric-mode
comparison dance :3056-3369, div-0 -> 0 :2996-3005, booleans-are-
numbers). Random expression trees render to config text, compile
through the real grammar, evaluate on Spark, and must match the model
byte-for-byte in string context."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rsyslog_spark.config import compile_config

_SAFE = st.text(
    alphabet="abcxyz 0159-", max_size=6
)
_NUM = st.integers(0, 50)


def _leaf():
    return st.one_of(
        st.tuples(st.just("num"), _NUM),
        st.tuples(st.just("str"), _SAFE),
    )


def _node(children):
    bin_ops = st.sampled_from(
        ["+", "-", "*", "/", "%", "&", "==", "!=", "<", "<=", ">", ">=",
         "and", "or", "contains", "startswith"]
    )
    return st.one_of(
        st.tuples(st.just("bin"), bin_ops, children, children),
        st.tuples(st.just("neg"), children),
        st.tuples(st.just("not"), children),
    )


EXPR = st.recursive(_leaf(), _node, max_leaves=8)


# ---- independent evaluator (kinds: n/s/b, values int/str/int) ----------

_NUMRE = re.compile(r"^-?[0-9]+$")


def _num(k, v):
    if k in ("n", "b"):
        return int(v)
    if v == "":
        return 0
    return int(v) if _NUMRE.match(v) else 0


def _sstr(k, v):
    if k == "b":
        return "1" if v else "0"
    if k == "n":
        return str(v)
    return v


def _isnum(k, v):
    return k in ("n", "b") or v == "" or bool(_NUMRE.match(v))


def _trunc_div(a, b):
    if b == 0:
        return 0
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _c_mod(a, b):
    if b == 0:
        return 0
    return a - _trunc_div(a, b) * b


def ev(node):
    tag = node[0]
    if tag == "num":
        return "n", node[1]
    if tag == "str":
        return "s", node[1]
    if tag == "neg":
        k, v = ev(node[1])
        return "n", -_num(k, v)
    if tag == "not":
        k, v = ev(node[1])
        return "b", 0 if _num(k, v) != 0 else 1
    _, op, l, r = node
    lk, lv = ev(l)
    rk, rv = ev(r)
    if op == "&":
        return "s", _sstr(lk, lv) + _sstr(rk, rv)
    if op in ("+", "-", "*", "/", "%"):
        a, b = _num(lk, lv), _num(rk, rv)
        if op == "+":
            return "n", a + b
        if op == "-":
            return "n", a - b
        if op == "*":
            return "n", a * b
        if op == "/":
            return "n", _trunc_div(a, b)
        return "n", _c_mod(a, b)
    if op in ("and", "or"):
        a, b = _num(lk, lv) != 0, _num(rk, rv) != 0
        return "b", int(a and b if op == "and" else a or b)
    if op == "contains":
        return "b", int(_sstr(rk, rv) in _sstr(lk, lv))
    if op == "startswith":
        return "b", int(_sstr(lk, lv).startswith(_sstr(rk, rv)))
    # comparison: numeric mode only when BOTH sides fully numeric
    ops = {
        "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }
    if _isnum(lk, lv) and _isnum(rk, rv):
        return "b", int(ops[op](_num(lk, lv), _num(rk, rv)))
    return "b", int(ops[op](_sstr(lk, lv), _sstr(rk, rv)))


def render(node):
    tag = node[0]
    if tag == "num":
        return str(node[1])
    if tag == "str":
        return '"%s"' % node[1]
    if tag == "neg":
        return "(-%s)" % render(node[1])
    if tag == "not":
        return "(not %s)" % render(node[1])
    _, op, l, r = node
    return "(%s %s %s)" % (render(l), op, render(r))


@pytest.fixture(scope="module")
def one_row(spark):
    return spark.createDataFrame([(1,)], "i int")


@given(exprs=st.lists(EXPR, min_size=1, max_size=10))
@settings(max_examples=15, deadline=None)
def test_expression_differential(one_row, exprs):
    body = "\n".join(
        f"set $.e{i} = {render(e)};" for i, e in enumerate(exprs)
    )
    conf = 'ruleset(name="z") {\n%s\n}' % body
    ann, _ = compile_config(one_row, conf, entry="z")
    got = ann.select("vars").first()["vars"]
    for i, e in enumerate(exprs):
        k, v = ev(e)
        expect = _sstr(k, v)
        assert got[f".e{i}"] == expect, (
            f"expr {render(e)}: spark={got[f'.e{i}']!r} model={expect!r}"
        )
