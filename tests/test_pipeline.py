"""End-to-end pipeline tests: routing fan-out, sinks, checkpoint/resume,
skew salting. Mirrors the reference's e2e style (inject -> route ->
verify per-sink sequence, tests/diag.sh seq_check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.checkpoint import LineageLog, run_with_resume, with_partition_id
from rsyslog_spark.pipeline import SINK_SPECS, build_flagship, run_flagship
from rsyslog_spark.route import Action, If, RouteCompiler, Ruleset, Set, Stop, Unset
from rsyslog_spark.skew import repartition_salted, with_salt

EXPECTED = {
    # derived from the generator classes (FIXTURES.md): 1000 rows at
    # sf0.001, 100 garbage (i%10==9), 900 parsed
    "parse_errors": 100,
    "archive": 900,
    "by_app": 900,
}


class TestFlagship:
    def test_per_sink_counts(self, transcripts):
        counts = run_flagship(transcripts)
        assert counts["parse_errors"] == EXPECTED["parse_errors"]
        assert counts["archive"] == EXPECTED["archive"]
        assert counts["by_app"] == EXPECTED["by_app"]
        # sev_high: parsed classes 0-7 with sev<=3 (class 8 rows get
        # default pri 13 -> sev 5)
        assert counts["sev_high"] == sum(
            1 for i in range(1000) if i % 10 <= 7 and i % 8 <= 3
        )
        assert counts["exec_audit"] == sum(
            1
            for i in range(1000)
            if i % 10 != 9 and i % 20 in (16, 17, 18) and i % 4 == 0
        )

    def test_fan_out_writes_match_counts(self, transcripts, tmp_path, spark):
        base = str(tmp_path / "sinks")
        counts = run_flagship(transcripts, base_path=base)
        for sink in ("archive", "parse_errors", "exec_audit"):
            n = spark.read.parquet(f"{base}/{sink}").count()
            assert n == counts[sink], sink
        # dynafile sink partitions by programname (omfile dynafile ≡
        # partitionBy, tools/omfile.c:671)
        import os

        parts = os.listdir(f"{base}/by_app")
        assert any(p.startswith("programname=") for p in parts)

    def test_stop_excludes_failed_rows_downstream(self, transcripts):
        annotated, actions = build_flagship(transcripts)
        archive = next(a for a in actions if a.sink == "archive")
        bad = annotated.filter(
            F.col(archive.pred_col) & ~F.col("parse_success")
        ).count()
        assert bad == 0


class TestRouteSemantics:
    def test_set_unset_and_call(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "y")], "id int, v string"
        )
        rc = RouteCompiler()
        rc.add(
            Ruleset(
                "sub",
                [Set("$!from_sub", F.lit("yes"))],
            )
        )
        rc.add(
            Ruleset(
                "main",
                [
                    Set("$!tag", F.col("v")),
                    Set("$!tag", F.lit("nope")),  # no force_reset -> keep
                    If(
                        F.col("id") == 1,
                        then=[
                            __import__(
                                "rsyslog_spark.route", fromlist=["Call"]
                            ).Call("sub"),
                            Action("one"),
                            Stop(),
                        ],
                    ),
                    Unset("$!tag"),
                    Action("rest"),
                ],
            )
        )
        ann, actions = rc.compile(df, "main")
        rows = {r["id"]: r for r in ann.collect()}
        by_sink = {a.sink: a for a in actions}
        # row 1: hit 'one', stopped before 'rest'
        assert rows[1][by_sink["one"].pred_col]
        assert not rows[1][by_sink["rest"].pred_col]
        assert rows[2][by_sink["rest"].pred_col]
        # set-no-overwrite kept original; call-inlined set applied on row 1
        assert rows[1]["vars"]["from_sub"] == "yes"
        assert "from_sub" not in rows[2]["vars"]
        # unset ran only on non-stopped path (row 2)
        assert rows[1]["vars"]["tag"] == "x"
        assert "tag" not in rows[2]["vars"]


class TestCheckpoint:
    def test_resume_skips_committed(self, transcripts, tmp_path, spark):
        lineage = str(tmp_path / "lineage")
        writes = []

        def process(df):
            writes.append(df.count())

        r1 = run_with_resume(
            spark, transcripts, "run1", lineage, process, n_buckets=16
        )
        assert r1["processed_partitions"] > 0 and r1["skipped"] == 0
        r2 = run_with_resume(
            spark, transcripts, "run1", lineage, process, n_buckets=16
        )
        assert r2["processed_partitions"] == 0
        assert r2["skipped"] == r1["processed_partitions"]
        assert len(writes) == 1  # second run wrote nothing

    def test_partial_resume(self, transcripts, tmp_path, spark):
        lineage = str(tmp_path / "lineage2")
        log = LineageLog(spark, lineage)
        bucketed = with_partition_id(transcripts, n_buckets=16)
        # simulate a crashed run that committed only buckets < 8
        log.commit(bucketed.filter(F.col("partition_id") < 8), "runP")
        seen = []

        def process(df):
            seen.append(
                df.select("partition_id").distinct().count()
            )

        r = run_with_resume(
            spark, transcripts, "runP", lineage, process, n_buckets=16
        )
        assert r["skipped"] == 8
        assert r["processed_partitions"] == seen[0]
        # all 16 buckets now committed -> full resume is a no-op
        assert sorted(log.committed_partitions("runP")) == list(range(16))

    def test_lineage_carries_parse_failures(self, parsed, tmp_path, spark):
        lineage = str(tmp_path / "lineage3")
        log = LineageLog(spark, lineage)
        stats = log.commit(with_partition_id(parsed, n_buckets=4), "runF")
        total_pf = (
            spark.read.parquet(lineage)
            .agg(F.sum("parse_failures"))
            .first()[0]
        )
        assert total_pf == 100  # the i%10==9 garbage class


class TestSkew:
    def test_salt_bounded(self, transcripts):
        salted = with_salt(transcripts, buckets=8)
        mx = salted.agg(F.max("salt")).first()[0]
        assert 0 <= mx <= 7

    def test_repartition_preserves_rows(self, transcripts):
        out = repartition_salted(transcripts, buckets=8, num_partitions=16)
        assert out.count() == transcripts.count()


class TestFlagshipPlanShape:
    """Regression-pin the 100 TB plan properties (PERF.md audit)."""

    def test_flagship_plan(self, spark):
        from pyspark.sql import functions as F

        from rsyslog_spark.pipeline import build_flagship
        from rsyslog_spark.sources.transcripts import transcripts_spark

        t = transcripts_spark(spark, "/root/testdata/sf0.001")
        ann, actions = build_flagship(t)
        agg = ann.agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.sum(F.col(a.pred_col).cast("long")) for a in actions],
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # one Arrow crossing, broadcast-only joins, no quadratic shapes
        assert plan.count("MapInArrow") == 1
        assert plan.count("BroadcastHashJoin") == 2
        assert plan.count("SortMergeJoin") == 0
        assert plan.count("CartesianProduct") == 0
        assert plan.count("BroadcastNestedLoopJoin") == 0
        # raw text does not ride back through the barrier on this path
        assert "rawmsg" not in ann.columns
