"""Compare every __spark_entry__ query against its DuckDB oracle at sf0.01,
mimicking the driver: row count, schema width, order-insensitive value
comparison (columns sorted by name, rows sorted).

Stricter than the round-1 version (whose ``%.9g`` normalization masked the
j3 DECIMAL-vs-DOUBLE driver hash mismatch): cells are type-tagged (Decimal /
float / int / bool compare as distinct families, as pandas dtype hashing
does in the driver), floats compare at full shortest-round-trip precision,
and nested/unhashable cells (list/dict/set/tuple/Row) are hard errors — the
driver's pandas canonicalizer cannot hash them."""

from __future__ import annotations

import importlib.util
import math
import sys
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, (list, dict, set, tuple, bytearray)):
        raise TypeError(
            f"nested/unhashable cell type {type(v).__name__!r} — the driver's "
            "pandas canonicalizer errors on these; flatten (to_json / "
            "string-serialize) before registering"
        )
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return str(v)


def df_key_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


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
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:2000]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            # The driver canonicalizes the Spark side even without an oracle
            # (round-1 a2 erred this way) — so nested cells fail rows-only too.
            try:
                df_key_rows(scols, srows)
            except TypeError as e:
                failures.append((name, f"rows-only canonicalize: {e}"))
                print(f"✗ {name}: {e}")
                continue
            print(f"~ {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: duckdb error: {str(e)[:500]}")
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            try:
                _, sk = df_key_rows(scols, srows)
                _, dk = df_key_rows(dcols, drows)
            except TypeError as e:
                ok = False
                sk = dk = []
                msgs.append(f"canonicalize: {e}")
            if sk != dk:
                ok = False
                ndiff = sum(1 for a, b in zip(sk, dk) if a != b)
                examples = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                msgs.append(f"value mismatch in {ndiff}/{len(sk)} rows; ex: {examples}")
        if ok:
            print(f"✓ {name} ({len(srows)} rows)")
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
