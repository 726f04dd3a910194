"""Ruleset compiler: statement lists -> per-sink predicates + projections.

Reference: scriptExec (runtime/ruleset.c:577-636) executes a statement
list per message; statement types grammar/rainerscript.h:109-121.

KEY INSIGHT (SURVEY §2.8): because RainerScript statements are
side-effect-free except set/unset (linear, no loops) and ``stop``, a
ruleset compiles to STATIC per-sink algebra:

    P_k = AND(enclosing conditions)  AND  NOT(any reachable earlier stop)

so rsyslog's multicast-with-stop becomes N parallel filtered writes over
ONE annotated DataFrame — single scan, exact per-sink counts, fully
declarative for Catalyst. Actions never stop the script (execAct,
ruleset.c:199-218: action errors don't abort), so actions contribute
nothing to downstream predicates.

Statements:
- Action(sink, template=...)          ≙ S_ACT (ruleset.c:199)
- Stop()                              ≙ S_STOP / '~' (ruleset.c:595-597)
- If(cond, then, els)                 ≙ S_IF (ruleset.c:304-320)
- PriFilt(selector, then)             ≙ S_PRIFILT (ruleset.c:420)
- PropFilt(prop, op, value, then)     ≙ S_PROPFILT (ruleset.c:537)
- Set(name, expr, force_reset) /
  Unset(name)                         ≙ S_SET/S_UNSET (ruleset.c:220-239)
- Call(name)                          ≙ S_CALL inline (ruleset.c:283-302)
- Continue()                          ≙ NOP (rainerscript.h:389)

``omdiscard`` is modeled as Stop() — the reference optimizer rewrites it
exactly so (rainerscript.c:5088-5099).

Variables: the ``$!`` tree is a ``vars: map<string,string>`` column;
set-without-reset does NOT overwrite an existing key (force_reset flag,
rainerscript.h:140; msgSetJSONFromVar semantics) — replicated via
map_contains_key guard.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.filters import prifilt_predicate, propfilt_predicate
from rsyslog_spark.templates import compile_template


# --- statement model --------------------------------------------------------

@dataclass
class Action:
    sink: str
    template: str | Column | None = None  # None -> raw row routing


@dataclass
class Stop:
    pass


@dataclass
class If:
    cond: Column
    then: list = field(default_factory=list)
    els: list = field(default_factory=list)


@dataclass
class PriFilt:
    selector: str
    then: list = field(default_factory=list)
    els: list = field(default_factory=list)


@dataclass
class PropFilt:
    prop: str
    op: str
    value: str | None = None
    negate: bool = False
    then: list = field(default_factory=list)
    els: list = field(default_factory=list)


@dataclass
class Set:
    name: str  # '$!path' or '$.path'
    expr: Column
    force_reset: bool = False


@dataclass
class Unset:
    name: str


@dataclass
class Call:
    ruleset: str


@dataclass
class Continue:
    pass


@dataclass
class Ruleset:
    name: str
    stmts: list = field(default_factory=list)


@dataclass
class CompiledAction:
    """One sink write: filter predicate column name + payload column."""
    sink: str
    pred_col: str
    out_col: str | None  # None -> whole row



def _var_key(name: str) -> str:
    """'$!a!b' / '$.x' / '$/g' -> bag key (path prefix stripped)."""
    return name[2:] if name.startswith(("$!", "$.", "$/")) else name

class RouteCompiler:
    """Compiles rulesets over a DataFrame into (annotated_df, actions)."""

    def __init__(self, rulesets: dict[str, Ruleset] | None = None):
        self.rulesets = rulesets or {}
        self._n = 0

    def add(self, rs: Ruleset) -> "RouteCompiler":
        self.rulesets[rs.name] = rs
        return self

    # -------------------------------------------------------------------
    def compile(
        self, df: DataFrame, entry: str, vars_col: str = "vars"
    ) -> tuple[DataFrame, list[CompiledAction]]:
        """Compile the entry ruleset (inlining Call targets) against df.

        Returns the annotated DataFrame (predicate/output columns added,
        set/unset applied in statement order) and the action list. The
        caller fans out with ``df.filter(a.pred_col)`` per action — one
        scan, N writes (SURVEY §2.8 'deterministic dataflow').
        """
        if vars_col not in df.columns:
            df = df.withColumn(vars_col, F.create_map().cast("map<string,string>"))
        self._vars_col = vars_col
        self._actions: list[CompiledAction] = []
        self._df = df
        true = F.lit(True)
        false = F.lit(False)
        self._exec_block(self.rulesets[entry].stmts, true, false, set())
        return self._df, self._actions

    # -------------------------------------------------------------------
    def _fresh(self, prefix: str) -> str:
        self._n += 1
        return f"_{prefix}_{self._n}"

    def _cond_of(self, st) -> Column:
        if isinstance(st, If):
            return st.cond
        if isinstance(st, PriFilt):
            return prifilt_predicate(
                st.selector, F.col("syslogfacility"), F.col("syslogseverity")
            )
        if isinstance(st, PropFilt):
            from rsyslog_spark.templates import resolve_property

            return propfilt_predicate(
                resolve_property(st.prop), st.op, st.value, st.negate
            )
        raise TypeError(st)

    def _exec_block(
        self, stmts: list, path: Column, stopped: Column, calling: set
    ) -> Column:
        """Walk a statement list; returns the updated ``stopped`` column
        (disjunction of stop conditions reachable so far)."""
        for st in stmts:
            if isinstance(st, Continue):
                continue
            if isinstance(st, Action):
                pred_name = self._fresh(f"act_{st.sink}")
                self._df = self._df.withColumn(pred_name, path & ~stopped)
                out_name = None
                if st.template is not None:
                    out_name = self._fresh(f"out_{st.sink}")
                    col = (
                        st.template
                        if isinstance(st.template, Column)
                        else compile_template(st.template)
                    )
                    # evaluate at THIS statement position so later set/
                    # unset doesn't leak backwards (ruleset.c sequential)
                    self._df = self._df.withColumn(out_name, col)
                self._actions.append(CompiledAction(st.sink, pred_name, out_name))
            elif isinstance(st, Stop):
                # everything on this path is stopped from here on
                stopped = stopped | path
            elif isinstance(st, (If, PriFilt, PropFilt)):
                cname = self._fresh("cond")
                self._df = self._df.withColumn(cname, self._cond_of(st))
                c = F.col(cname)
                stopped = self._exec_block(st.then, path & c, stopped, calling)
                if st.els:
                    stopped = self._exec_block(st.els, path & ~c, stopped, calling)
            elif isinstance(st, Set):
                self._apply_set(st, path & ~stopped)
            elif isinstance(st, Unset):
                self._apply_unset(st, path & ~stopped)
            elif isinstance(st, Call):
                # inline composition (direct-call semantics; a queued
                # target ruleset would materialize instead, SURVEY §2.8)
                if st.ruleset in calling:
                    raise ValueError(f"recursive call to {st.ruleset}")
                stopped = self._exec_block(
                    self.rulesets[st.ruleset].stmts,
                    path,
                    stopped,
                    calling | {st.ruleset},
                )
            else:
                raise TypeError(f"unknown statement {st!r}")
        return stopped

    def _apply_set(self, st: Set, active: Column):
        v = self._vars_col
        key = _var_key(st.name)
        cur = F.col(v)
        exists = F.map_contains_key(cur, F.lit(key))
        new_map = F.map_concat(
            F.map_filter(cur, lambda k, _: k != F.lit(key)),
            F.create_map(F.lit(key), st.expr.cast("string")),
        )
        if st.force_reset:
            updated = new_map
        else:
            # set does not overwrite existing (force_reset flag,
            # rainerscript.h:140)
            updated = F.when(exists, cur).otherwise(new_map)
        self._df = self._df.withColumn(
            v, F.when(active, updated).otherwise(cur)
        )

    def _apply_unset(self, st: Unset, active: Column):
        v = self._vars_col
        key = _var_key(st.name)
        cur = F.col(v)
        self._df = self._df.withColumn(
            v,
            F.when(
                active, F.map_filter(cur, lambda k, _: k != F.lit(key))
            ).otherwise(cur),
        )
