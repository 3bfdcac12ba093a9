"""Ad-hoc differential checker used while iterating (not collected by
pytest): runs named registry queries on Spark AND their DuckDB oracle at
a given sf dir, compares order-insensitively at 6dp.

Usage: python tests/_diffcheck.py sf0.01 ev_markov_attribution ...
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

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    vals.append(f"{v:.4f}")
                else:
                    vals.append(str(v))
            out.append("|".join(vals))
        return sorted(out)

    rc = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            rc = 1
            continue
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only, spark_rows={len(srows)}")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        sc = canon(srows, scols)
        oc = canon(orows, ocols)
        ok = sc == oc and sorted(scols) == sorted(ocols)
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} "
            f"spark={len(srows)} oracle={len(orows)}"
        )
        if not ok:
            rc = 1
            for i, (x, y) in enumerate(zip(sc, oc)):
                if x != y:
                    print(f"  first diff row {i}:\n   spark  {x}\n   oracle {y}")
                    break
            if sorted(scols) != sorted(ocols):
                print(f"  cols spark={sorted(scols)} oracle={sorted(ocols)}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
