"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows": ...,
   "throughput_rows_per_sec": ...}

Optional scaling evidence (north rule: >=0.8 efficiency from N to 4N):
  SPARK_GRAFT_SCALING="8,32" python bench.py
adds {"scaling": {"cores_lo": .., "cores_hi": .., "sec_lo": ..,
"sec_hi": .., "efficiency": ..}} — same job, two parallelism levels
(sandbox stand-in for N vs 4N executors, see BASELINE.md §sandbox).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "1"))


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # local master cannot change on getOrCreate; force a new context
        SparkSession._instantiatedSession = None

    from rsyslog_spark.session import get_spark

    return get_spark(app_name=f"bench_{cores}", cores=cores)


def _flagship(spark, sf_dir: str, replicas: int):
    """End-to-end: transcripts -> parse -> enrich -> route -> per-sink
    counts + parse-failure metric (the north-rule pipeline)."""
    from rsyslog_spark.pipeline import build_flagship
    from rsyslog_spark.sources.transcripts import transcripts_spark

    t = transcripts_spark(spark, sf_dir, replicas=replicas)
    annotated, actions = build_flagship(t)
    agg = annotated.agg(
        F.count(F.lit(1)).alias("rows"),
        *[F.sum(F.col(a.pred_col).cast("long")).alias(a.sink) for a in actions],
    ).collect()[0]
    return int(agg["rows"])


def _count(df) -> int:
    return df.count()


def bench_queries(spark, sf_dir: str, replicas: int) -> tuple[dict, int]:
    import __spark_entry__ as E
    from rsyslog_spark import agg as A
    from rsyslog_spark import windows as W
    from rsyslog_spark.parse import with_parsed
    from rsyslog_spark.sources.transcripts import transcripts_spark

    t = transcripts_spark(spark, sf_dir, replicas=replicas)
    parsed = with_parsed(t, require_header=True)

    # warm-up: spin Python UDF workers + JIT/codegen once (excluded from
    # timings — steady-state throughput is the number that scales)
    with_parsed(t.limit(2000), require_header=True).select("parser").count()

    runs: list[tuple[str, callable]] = [
        ("flagship_e2e", lambda: _flagship(spark, sf_dir, replicas)),
        ("parse_chain", lambda: _count(parsed.select("parser", "msg"))),
        (
            "route_archive_lines",
            lambda: _count(E.q_route_archive_lines(spark, sf_dir)),
        ),
        (
            "dyn_inc",
            lambda: _count(A.dyn_inc(parsed, "b", "programname")),
        ),
        (
            "repeat_suppression",
            lambda: _count(W.repeat_suppression(t, msg_col="role")),
        ),
        ("rate_limit", lambda: _count(W.rate_limit(t, 60, 5))),
        (
            "dedup_minhash",
            lambda: _count(E.q_dedup_minhash_pairs(spark, sf_dir)),
        ),
        (
            "embedding_topk",
            lambda: _count(E.q_embedding_topk(spark, sf_dir)),
        ),
    ]
    timings: dict[str, float] = {}
    rows = 0
    for name, fn in runs:
        t0 = time.monotonic()
        n = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        if name == "flagship_e2e":
            rows = n
    return timings, rows


def run_once(cores: int) -> tuple[dict, int, float]:
    spark = _fresh_spark(cores)
    timings, rows = bench_queries(spark, SF_DIR, REPLICAS)
    total = round(sum(timings.values()), 3)
    return timings, rows, total


_CHILD_SNIPPET = """
import json, sys, time
cores, sf_dir, replicas = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
sys.path.insert(0, "__ROOT__")
from pyspark.sql import functions as F
from rsyslog_spark.session import get_spark
from rsyslog_spark.sources.transcripts import transcripts_spark
from rsyslog_spark.pipeline import build_flagship
spark = get_spark(cores=cores)
rows = 0
def flag():
    global rows
    ann, actions = build_flagship(
        transcripts_spark(spark, sf_dir, replicas=replicas))
    agg = ann.agg(F.count(F.lit(1)).alias("rows"),
        *[F.sum(F.col(a.pred_col).cast("long")) for a in actions]).collect()
    rows = int(agg[0]["rows"])
best = 1e9
for i in range(4):  # first iterations warm workers + JIT; keep best
    t0 = time.monotonic(); flag(); best = min(best, time.monotonic() - t0)
print(json.dumps({"sec": round(best, 3), "rows": rows}))
"""  # noqa: E501


def run_flagship_at(cores: int, replicas: int) -> tuple[float, int]:
    """Converged (best-of-4, JIT/worker-warm) flagship wall time at one
    parallelism level, in an ISOLATED process — two local masters in one
    JVM contaminate each other's measurements."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD_SNIPPET.replace("__ROOT__", root),
         str(cores), SF_DIR, str(replicas)],
        capture_output=True, text=True, timeout=900,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    return res["sec"], res["rows"]


def main():
    timings, rows, total = run_once(CPUS)
    out = {
        "metric": "end-to-end parse->enrich->route->aggregate wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "rows": rows,
        "cpus": CPUS,
        "throughput_rows_per_sec": round(rows / timings["flagship_e2e"], 1),
    }

    # steady-state throughput at a compute-bound input size (30x the sf
    # table) — the number that projects to cluster scale; the plain-sf
    # flagship above is fixed-overhead-dominated at small sf
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        reps = int(os.environ.get("SPARK_GRAFT_SS_REPLICAS", "30"))
        _flagship(spark, SF_DIR, reps)  # warm plan shape
        t0 = time.monotonic()
        ss_rows = _flagship(spark, SF_DIR, reps)
        ss_sec = round(time.monotonic() - t0, 3)
        out["steady_state"] = {
            "rows": ss_rows,
            "sec": ss_sec,
            "rows_per_sec": round(ss_rows / ss_sec, 1),
        }
    except Exception as ex:  # never fail the bench line on this extra
        out["steady_state"] = {"error": str(ex)[:120]}

    scaling = os.environ.get("SPARK_GRAFT_SCALING")
    if scaling:
        # north rule: same job at N and 4N parallelism, efficiency =
        # (T_N / T_4N) / (4N/N) >= 0.8. A compute-bound input size
        # (replicas) keeps fixed overheads from masking the scaling.
        lo, hi = (int(x) for x in scaling.split(","))
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICAS", "30"))
        t_lo, n_rows = run_flagship_at(lo, reps)
        t_hi, _ = run_flagship_at(hi, reps)
        eff = (t_lo / t_hi) / (hi / lo)
        out["scaling"] = {
            "cores_lo": lo,
            "cores_hi": hi,
            "rows": n_rows,
            "sec_lo": t_lo,
            "sec_hi": t_hi,
            "rows_per_sec_lo": round(n_rows / t_lo, 1),
            "rows_per_sec_hi": round(n_rows / t_hi, 1),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
