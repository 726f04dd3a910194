"""zlib uncompress front door (uncompressMessage, runtime/parser.c:312-362).

The reference checks every received raw message: a leading ``'z'`` byte
marks a zlib-compressed record (the tcpflood -C / omfwd
compression.mode="single" wire format); the remainder is inflated and
REPLACES the raw message. Messages that fail to inflate are DROPPED
("Message ignored", parser.c:349-354), and messages that would inflate
beyond the line limit are rejected rather than decompressed (DoS guard,
parser.c:329-335 — uncompress() with a bounded output buffer).

Spark shape: an opt-in ``mapInArrow`` pre-pass over a BINARY raw column
(string columns cannot carry compressed bytes — parquet strings are
UTF-8 by construction). The detection mask is computed columnar; only
flagged rows pay the per-row inflate (mirroring the reference's
per-message uncompress call). Runs BEFORE sanitize/PRI, exactly like
ParseMsg's call order (parser.c:617-631: uncompress, then sanitize).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def uncompress_record_batch(col, max_len: int = 8192):
    """binary Array -> (string Array, keep_mask Array).

    - rows starting with b'z': zlib-inflated (bounded at ``max_len``,
      glbl.GetMaxLine analog); inflate failure or oversize -> dropped
    - other rows: passed through, decoded as UTF-8 (lossy replacement
      for stray bytes — the sanitizer escapes control chars next)
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    b = col.cast(pa.binary())
    flag = pc.equal(
        pc.binary_slice(pc.fill_null(b, b""), 0, 1), pa.scalar(b"z")
    ).to_numpy(zero_copy_only=False)
    raw = b.to_pylist()
    out: list[str | None] = []
    keep: list[bool] = []
    for i, v in enumerate(raw):
        if v is None:
            out.append(None)
            keep.append(True)
            continue
        if flag[i]:
            try:
                d = zlib.decompressobj()
                inflated = d.decompress(v[1:], max_len)
                if d.unconsumed_tail:
                    raise zlib.error("exceeds max line length")
                out.append(inflated.decode("utf-8", errors="replace"))
                keep.append(True)
            except zlib.error:
                # parser.c:349-354: failed inflate -> message ignored
                out.append(None)
                keep.append(False)
        else:
            out.append(v.decode("utf-8", errors="replace"))
            keep.append(True)
    return pa.array(out, pa.string()), pa.array(keep, pa.bool_())


def compress_records(
    df: DataFrame, text_col: str = "text", out_col: str = "raw",
    select_expr: str | None = None, corrupt_expr: str | None = None,
) -> DataFrame:
    """Test-side producer of the compressed wire format (tcpflood -C,
    tests/tcpflood.c send path; omfwd compression.mode single): rows
    matched by ``select_expr`` become b'z' + zlib(text), rows matched by
    ``corrupt_expr`` become b'z' + garbage (the drop path), the rest are
    plain UTF-8 bytes. Output column is BINARY (the reference's raw
    message is bytes; parquet strings could not carry this)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    fields = [f for f in df.schema.fields if f.name != text_col] + [
        T.StructField(out_col, T.BinaryType())
    ]
    out_schema = T.StructType(fields)
    sel_name, cor_name = "_cmp_sel", "_cmp_cor"
    from pyspark.sql import functions as F

    df = df.withColumn(
        sel_name, F.expr(select_expr) if select_expr else F.lit(False)
    ).withColumn(
        cor_name, F.expr(corrupt_expr) if corrupt_expr else F.lit(False)
    )

    def _run(batches):
        for batch in batches:
            names = batch.schema.names
            cols = {n: batch.column(i) for i, n in enumerate(names)}
            txt = pc.fill_null(cols[text_col].cast(pa.string()), "")
            sel = cols[sel_name].to_pylist()
            cor = cols[cor_name].to_pylist()
            raw = []
            for v, s_, c_ in zip(txt.to_pylist(), sel, cor):
                if c_:
                    raw.append(b"z\x00not-zlib")
                elif s_:
                    raw.append(b"z" + zlib.compress(v.encode("utf-8")))
                else:
                    raw.append(v.encode("utf-8"))
            keep = [n for n in names if n not in (text_col, sel_name, cor_name)]
            yield pa.RecordBatch.from_arrays(
                [cols[n] for n in keep] + [pa.array(raw, pa.binary())],
                names=keep + [out_col],
            )

    return df.mapInArrow(_run, out_schema)


def with_uncompressed(
    df: DataFrame, raw_col: str = "raw", out_col: str = "text",
    max_len: int = 8192,
) -> DataFrame:
    """Replace a binary raw column with its uncompressed text form,
    dropping rows the reference would ignore (failed inflate)."""
    import pyarrow as pa

    fields = [
        f for f in df.schema.fields if f.name != raw_col
    ] + [T.StructField(out_col, T.StringType()),
         T.StructField("_keep", T.BooleanType())]
    out_schema = T.StructType(fields)

    def _run(batches):
        for batch in batches:
            names = batch.schema.names
            cols = {n: batch.column(i) for i, n in enumerate(names)}
            txt, keep = uncompress_record_batch(cols[raw_col], max_len)
            arrays = [cols[n] for n in names if n != raw_col] + [txt, keep]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[n for n in names if n != raw_col]
                + [out_col, "_keep"],
            )

    return df.mapInArrow(_run, out_schema).filter("_keep").drop("_keep")
