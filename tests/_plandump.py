"""Dump .explain("formatted") for named registry queries WITHOUT
executing them (optimization-round deliverable: plans/r13/<q>_<tag>.txt).

Usage: PYTHONPATH=/root/repo python tests/_plandump.py sf0.1 before q1 q2 ...
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sf, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = f"/root/testdata/{sf}"

    import __spark_entry__ as entry
    from gravity_books_datalakehouse_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark(app_name="plandump")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:
            plan = f"ERROR building {name}: {exc}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
