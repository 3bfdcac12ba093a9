"""Ad-hoc differential checker used while iterating (not collected by
pytest): runs named registry queries on Spark AND their DuckDB oracle at
a given sf dir, comparing with the SAME pandas-based normalization the
verify sweep uses (dtype-sensitive via astype(str) — catches HUGEINT ->
float64 oracle drift that a fetchall() compare hides).

Usage: PYTHONPATH=/root/repo python tests/_diffcheck.py sf0.01 name ...
"""

from __future__ import annotations

import sys


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    names = sys.argv[2:]
    sf_dir = f"/root/testdata/{sf}"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("diffcheck")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    def norm(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype.kind == "f":
                df[c] = df[c].round(4)
        return (
            df.astype(str)
            .sort_values(by=list(df.columns))
            .reset_index(drop=True)
        )

    rc = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            rc = 1
            continue
        got = norm(qs[name](spark, sf_dir).toPandas())
        if name not in oracles:
            print(f"{name}: rows-only, spark_rows={len(got)}")
            continue
        want = norm(con.execute(oracles[name]).fetchdf())
        ok = list(got.columns) == list(want.columns) and got.equals(want)
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} "
            f"spark={len(got)} oracle={len(want)}"
        )
        if not ok:
            rc = 1
            if list(got.columns) != list(want.columns):
                print(f"  cols spark={list(got.columns)} oracle={list(want.columns)}")
            else:
                neq = (got != want).any(axis=1)
                print("  first diff rows:")
                print("   spark:\n", got[neq].head(2))
                print("   oracle:\n", want[neq].head(2))
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
