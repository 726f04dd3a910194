"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count,
column set, and order-insensitive values. Usage:

    python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        elif s.dtype == object:
            df[c] = s.astype(object).where(pd.notna(s), None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        errs.append(f"columns spark={sc} oracle={oc}")
        return errs
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = np.isclose(
                    a.astype(float), b.astype(float), rtol=1e-6, equal_nan=True
                )
            else:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            bad = np.flatnonzero(~eq)
            if len(bad):
                k = bad[0]
                errs.append(
                    f"col {c!r}: {len(bad)} diffs; first at row {k}: "
                    f"spark={a.iloc[k]!r} oracle={b.iloc[k]!r}"
                )
    return errs


def main():
    import __spark_entry__ as E
    from rsyslog_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="check_oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(os_[name]).fetch_df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows):")
            for e in errs[:6]:
                print(f"  - {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
