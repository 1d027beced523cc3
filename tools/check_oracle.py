"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 on Spark AND its oracle SQL on DuckDB,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns, strict=True):
    """Sort columns by name, then rows.  strict=True mimics the driver's
    hasher: values compare EXACTLY (repr), so an int64 12345 vs a
    float64 12345.0 (DuckDB HUGEINT promotion through Arrow) or a
    last-bit double difference is a failure, exactly as it is for the
    driver's value hash.  strict=False re-rounds floats to 6dp for a
    value-only comparison (the old behavior)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "to_pydatetime"):  # pandas Timestamp
                v = v.to_pydatetime()
            elif hasattr(v, "item"):  # numpy scalar from pandas fetch
                v = v.item()
            import decimal

            if isinstance(v, decimal.Decimal):
                # DuckDB fetchall() yields Decimal for SQL literals like
                # `1.0 AS score`; the Arrow/pandas path (what the driver
                # uses) delivers float64 — normalize to that
                v = float(v)
            if isinstance(v, float):
                if not strict:
                    v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            # strict mode compares REPRs so an int64 12345 vs float64
            # 12345.0 (HUGEINT promotion) fails here like it fails the
            # driver's hash — plain tuple equality would call them equal
            vals.append(repr(v) if strict else v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [columns[i] for i in order], out


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            # Fetch through pandas (Arrow) like the driver does, so type
            # promotions (HUGEINT -> float64/object) are visible here.
            pdf = con.sql(oracles[name]).df()
            d_cols = list(pdf.columns)
            d_rows = [tuple(r) for r in pdf.itertuples(index=False)]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sc, sr = normalize(s_rows, s_cols)
        dc, dr = normalize(d_rows, d_cols)
        status = []
        if sc != dc:
            status.append(f"columns {sc} != {dc}")
        if len(sr) != len(dr):
            status.append(f"rowcount {len(sr)} != {len(dr)}")
        if not status and sr != dr:
            diffs = [
                (a, b) for a, b in zip(sr, dr) if a != b
            ][:3]
            status.append(f"values differ, e.g. {diffs}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"ok    {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
