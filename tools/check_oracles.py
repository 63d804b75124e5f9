"""Compare every __spark_entry__ query against its DuckDB oracle at sf0.01,
mimicking the driver: row count, schema width, order-insensitive value
comparison (columns sorted by name, rows sorted).

Round-3 rewrite: both sides are canonicalized at the PANDAS layer — Spark
via ``toPandas()``, DuckDB via ``.df()`` — and every cell is tagged with its
column's pandas dtype FAMILY (int / float / bool / datetime / object).  The
round-2 version fetched the DuckDB side with ``fetchall()``, which converts
HUGEINT to a Python int and thereby masked exactly the dtype-family
divergence that made j3 pass locally while failing the driver for two
rounds (DuckDB integer SUM → HUGEINT → pandas float64, Spark → int64).

Families are intentionally width-insensitive (int32 == int64) — the driver
accepts row_number (Spark int32) vs ROW_NUMBER (DuckDB int64) — but family
crossings (int vs float, float vs Decimal-object) are hash failures, as
they are in the driver.  Nested/unhashable cells (list/ndarray/dict) are
hard errors: the driver's pandas canonicalizer cannot hash them, even for
rows-only queries (round-1 a2 erred this way).
"""

import importlib.util
import math
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def _family(dtype) -> str:
    """Pandas dtype → family tag the driver's hash distinguishes."""
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "i"
    if kind == "f":
        return "f"
    if kind == "b":
        return "b"
    if kind == "M":
        return "dt"
    return "O"


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return True
    if v is pd.NaT:
        return True
    try:
        return bool(pd.isna(v)) if not isinstance(v, (list, tuple, set, dict, np.ndarray)) else False
    except (TypeError, ValueError):
        return False


def norm_cell(v, family: str):
    """Canonical string for one cell, prefixed with its dtype family."""
    if isinstance(v, (list, dict, set, tuple, bytearray, np.ndarray)):
        raise TypeError(
            f"nested/unhashable cell type {type(v).__name__!r} — the driver's "
            "pandas canonicalizer errors on these; flatten (to_json / "
            "string-serialize) before registering"
        )
    if _is_null(v):
        return f"{family}:\x00null"
    if family == "i":
        return f"i:{int(v)}"
    if family == "f":
        fv = float(v)
        return "f:nan" if math.isnan(fv) else f"f:{fv!r}"
    if family == "b":
        return f"b:{bool(v)}"
    if family == "dt":
        return f"dt:{pd.Timestamp(v).isoformat()}"
    # object column: tag the per-cell python type (a Decimal in an object
    # column is a different hash input than a float64 column — keep it so).
    if isinstance(v, Decimal):
        return f"O.dec:{v}"
    if isinstance(v, bool):
        return f"O.b:{v}"
    if isinstance(v, (int, np.integer)):
        return f"O.i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        fv = float(v)
        return "O.f:nan" if math.isnan(fv) else f"O.f:{fv!r}"
    if isinstance(v, bytes):
        return f"O.bytes:{v.hex()}"
    return f"O.s:{v}"


def canon(pdf: pd.DataFrame):
    """(sorted lower-cols, column-family map, sorted canonical row keys)."""
    cols = [c.lower() for c in pdf.columns]
    fams = [_family(pdf.dtypes.iloc[i]) for i in range(len(cols))]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = list(pdf.itertuples(index=False, name=None))
    rows = ["\x01".join(norm_cell(r[i], fams[i]) for i in order) for r in raw]
    rows.sort()
    return [cols[i] for i in order], {cols[i]: fams[i] for i in order}, rows


def main(only: list[str] | None = None):
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from imgfact_spark.session import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:2000]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            # The driver canonicalizes the Spark side even without an oracle
            # (round-1 a2 erred this way) — so nested cells fail rows-only too.
            try:
                canon(spdf)
            except TypeError as e:
                failures.append((name, f"rows-only canonicalize: {e}"))
                print(f"✗ {name}: {e}")
                continue
            print(f"~ {name}: rows-only ({len(spdf)} rows)")
            if len(spdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            dpdf = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: duckdb error: {str(e)[:500]}")
            continue
        ok = True
        msgs = []
        if len(spdf) != len(dpdf):
            ok = False
            msgs.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if sorted(c.lower() for c in spdf.columns) != sorted(
            c.lower() for c in dpdf.columns
        ):
            ok = False
            msgs.append(
                f"cols spark={sorted(c.lower() for c in spdf.columns)} "
                f"duck={sorted(c.lower() for c in dpdf.columns)}"
            )
        if ok:
            try:
                _, sfam, sk = canon(spdf)
                _, dfam, dk = canon(dpdf)
            except TypeError as e:
                ok = False
                sfam = dfam = {}
                sk = dk = []
                msgs.append(f"canonicalize: {e}")
            if ok and sfam != dfam:
                ok = False
                diff = {
                    c: (sfam.get(c), dfam.get(c))
                    for c in sfam
                    if sfam.get(c) != dfam.get(c)
                }
                msgs.append(f"dtype-family mismatch (spark,duck): {diff}")
            if ok and sk != dk:
                ok = False
                ndiff = sum(1 for a, b in zip(sk, dk) if a != b)
                examples = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                msgs.append(f"value mismatch in {ndiff}/{len(sk)} rows; ex: {examples}")
        if ok:
            print(f"✓ {name} ({len(spdf)} rows)")
        else:
            failures.append((name, "; ".join(msgs)))
            print(f"✗ {name}: {'; '.join(msgs)[:600]}")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, m in failures:
            print(f"  {n}: {m[:300]}")
        sys.exit(1)
    print(f"ALL OK ({len([q for q in queries if not only or q in only])} queries)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or None)
