"""Stratified sampling + weighted mixing (dataops/sampling.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rsyslog_spark.dataops.sampling import (
    hash_int,
    stratified_sample,
    threshold,
    weighted_mix,
)


def _h(salt, v):
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:8], 16)


class TestSampling:
    def test_hash_matches_python_md5(self, spark):
        df = spark.range(20).select(F.col("id").alias("doc_id"))
        got = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", hash_int(F.col("doc_id"), "s").alias("h")
            ).collect()
        }
        assert got == {i: _h("s", i) for i in range(20)}

    def test_stratified_exact_gate(self, spark):
        rows = [(i, "en" if i % 2 else "fr") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        rates = {"en": 0.5, "fr": 0.1}
        out = {
            r["doc_id"]: r["samp_keep"]
            for r in stratified_sample(df, rates).collect()
        }
        for i, lang in rows:
            assert out[i] == (_h("sample", i) < threshold(rates[lang])), i

    def test_deterministic_under_repartition(self, spark):
        df = spark.range(500).select(F.col("id").alias("doc_id"),
                                     F.lit("en").alias("lang"))
        a = set(
            r["doc_id"]
            for r in stratified_sample(df, {"en": 0.3})
            .filter("samp_keep").collect()
        )
        b = set(
            r["doc_id"]
            for r in stratified_sample(df.repartition(13), {"en": 0.3})
            .filter("samp_keep").collect()
        )
        assert a == b and 0.2 < len(a) / 500 < 0.4

    def test_weighted_mix_copy_counts(self, spark):
        rows = [(i, ["en", "es", "zh", "de"][i % 4]) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        w = {"en": 2.0, "es": 2.5, "zh": 0.0}  # default 1.0 for de
        out = weighted_mix(df, w, default_weight=1.0).collect()
        by_doc: dict[int, list[int]] = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["copy"])
        for i, lang in rows:
            copies = sorted(by_doc.get(i, []))
            wt = w.get(lang, 1.0)
            expect_n = int(wt) + (
                1 if _h("mix", i) < threshold(wt - int(wt)) else 0
            )
            assert copies == list(range(expect_n)), (i, lang)
        # zh weight 0 -> no rows at all
        assert not any(lang == "zh" and i in by_doc for i, lang in rows)
        # es expectation 2.5: fraction of 3-copy docs is ~0.5
        es3 = [i for i, lang in rows if lang == "es" and len(by_doc[i]) == 3]
        assert 30 < len(es3) < 70  # of 100 es docs
