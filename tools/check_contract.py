"""Local simulation of the driver's correctness gate:

runs every __spark_entry__.queries()[name] at sf0.01 AND its oracle_sql()
in DuckDB, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, values normalized).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
(names filter the run to those queries — iterate on one without the full gate)
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


# The driver's value hash is TYPE-sensitive even when names match (r2 lesson:
# DuckDB HUGEINT vs Spark BIGINT hash-mismatch with identical values), so the
# local gate canonicalizes declared types and flags width drift.
_SPARK_T = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
}
_DUCK_T = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16", "UINTEGER": "u32",
    "UBIGINT": "u64", "FLOAT": "f32", "DOUBLE": "f64", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "bin",
}


def canon_types(cols, raw_types, mapping):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for i in order:
        t = str(raw_types[i])
        out.append(mapping.get(t, mapping.get(t.upper(), t.lower())))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}

    # smoke: entry()
    edf = entrymod.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema={edf.columns}")

    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = sdf.columns, sdf.collect()
            if name not in oracles:
                print(f"  {name}: rows-only check, {len(srows)} rows")
                continue
            q = con.sql(oracles[name])
            ocols, orows = list(q.columns), q.fetchall()
            sc, sr = table_repr(scols, [tuple(r) for r in srows])
            oc, orr = table_repr(ocols, orows)
            stypes = canon_types(scols, [t for _, t in sdf.dtypes], _SPARK_T)
            otypes = canon_types(ocols, q.types, _DUCK_T)
            ok_cols = sc == oc
            ok_rows = sr == orr
            ok_types = stypes == otypes
            status = "OK" if (ok_cols and ok_rows and ok_types) else "MISMATCH"
            if ok_cols and ok_rows and not ok_types:
                print(f"  {name}: TYPE MISMATCH spark={stypes} oracle={otypes}")
            if status != "OK":
                failures += 1
                print(f"  {name}: {status}  cols spark={sc} oracle={oc}")
                for a, b in list(zip(sr, orr))[:5]:
                    if a != b:
                        print(f"    spark={a}")
                        print(f"    orcle={b}")
                if len(sr) != len(orr):
                    print(f"    row counts: spark={len(sr)} oracle={len(orr)}")
            else:
                print(f"  {name}: OK ({len(sr)} rows)")
        except Exception as e:
            failures += 1
            print(f"  {name}: ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}")

    spark.stop()
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
