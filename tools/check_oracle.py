"""Local emulation of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names, and
an order-insensitive value comparison (sorted rows, stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from sarkac_spark.session import get_spark
from sarkac_spark.sources.tables import TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Driver-faithful zeros: the driver's pandas canonicalizer
        # hashes the repr, which DISTINGUISHES -0.0 from 0.0 — the r11
        # embedding_covariance red row slipped through because this
        # function used to collapse them. Keep the sign.
        if v == 0:
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        # full precision (shortest round-trip repr), not %.10g: the
        # driver hashes exact values, so a 12th-significant-digit
        # divergence the old format collapsed would be a driver red
        # row this tool called green (same blind-spot class as the
        # signed zero). House round-6 rule means green queries are
        # bit-identical anyway; this makes violations loud locally.
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


# The driver canonicalizes both engines through pandas, where DuckDB's
# HUGEINT (the result type of sum(BIGINT)) widens to float64 — so "1234.0"
# vs Spark's "1234" hash-mismatch on the driver even though fetchall() and
# %.10g collapse them here (the r02 doc_cube red row). Compare declared
# numeric kinds instead of values: HUGEINT is classed as float because
# that is what the driver sees.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "HUGEINT"}


def _duck_kind(type_str):
    t = str(type_str).upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    return None


def _spark_kind(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    return None


def _kind_mismatches(sdf_schema, d_cols, d_types):
    spark_kinds = {f.name: _spark_kind(f.dataType) for f in sdf_schema.fields}
    bad = []
    for c, t in zip(d_cols, d_types):
        sk, dk = spark_kinds.get(c), _duck_kind(t)
        if sk and dk and sk != dk:
            bad.append(f"{c}: spark={sk} duck={dk} ({t})")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    lines: list[str] = []
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            lines.append(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_sec = time.perf_counter() - t0
        # the driver's pandas canonicalizer sort_values-crashes on
        # array/struct/binary cells (round-1 inverted_index red row) —
        # make that class of bug a loud LOCAL failure
        from pyspark.sql import types as T

        bad_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
            )
        ]
        if bad_cols:
            lines.append(
                f"FAIL  {name}: non-scalar result columns {bad_cols} — "
                "the driver canonicalizer cannot sort these; emit "
                "strings/scalars instead"
            )
            failures += 1
            continue
        if name not in oracles:
            lines.append(
                f"OK*   {name}: rows={len(s_rows)} [{spark_sec:.2f}s] "
                "(rows-only check, no oracle)"
            )
            continue
        try:
            res = con.sql(oracles[name])
            d_cols = res.columns
            d_types = res.types
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            lines.append(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue

        # advisory: reachable signed zeros on either engine. Agreeing
        # -0.0s still hash-match, but they mark a round()-of-signed-
        # difference column one data perturbation away from the r11
        # embedding_covariance class — surface them for normalization.
        def _nz(rows):
            return sum(
                1
                for r in rows
                for v in r
                if isinstance(v, float) and v == 0 and math.copysign(1, v) < 0
            )

        nz_s, nz_d = _nz(s_rows), _nz(d_rows)
        if nz_s or nz_d:
            lines.append(
                f"ZERO- {name}: signed zeros reachable "
                f"(spark={nz_s}, duck={nz_d}) — add a `+ 0` normalizer"
            )

        ok = True
        kind_bad = _kind_mismatches(sdf.schema, d_cols, d_types)
        if kind_bad:
            lines.append(
                f"FAIL  {name}: numeric-kind divergence {kind_bad} — the "
                "driver's pandas canonicalizer will hash these differently "
                "(e.g. HUGEINT→float64 '1234.0' vs Spark int '1234'); CAST "
                "the oracle column to match the Spark type"
            )
            failures += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            lines.append(
                f"FAIL  {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}"
            )
            ok = False
        elif len(s_rows) != len(d_rows):
            lines.append(
                f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
            )
            ok = False
        else:
            ns, nd = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                lines.append(f"FAIL  {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            lines.append(f"OK    {name}: rows={len(s_rows)} [{spark_sec:.2f}s]")
        else:
            failures += 1

    spark.stop()
    print()
    print("\n".join(lines), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
