"""Ad-hoc per-query measurement harness for the optimization rounds
(not collected by pytest): for each named registry query, times N runs
against the noop sink (guide §1.4 — computes every column, discards the
sink cost), captures .explain("formatted") to plans/<round>/, and counts
plan features (Exchange, join strategies, BatchEvalPython).

Usage:
  PYTHONPATH=/root/repo python tests/_qprobe.py sf0.1 r13_before name ...
  PYTHONPATH=/root/repo python tests/_qprobe.py sf0.1 - name ...   # no plan dump

Prints one line per query: name, best/median of N noop-sink seconds,
exchange count, join node kinds, python-eval node count.
"""

from __future__ import annotations

import os
import re
import sys
import time


def main() -> int:
    sf = sys.argv[1]
    tag = sys.argv[2]
    names = sys.argv[3:]
    runs = int(os.environ.get("QPROBE_RUNS", "3"))
    sf_dir = f"/root/testdata/{sf}"

    import __spark_entry__ as entry
    from gravity_books_datalakehouse_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark(app_name="qprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup the bench does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.createDataFrame([(1,)], "x int")
    warm.mapInPandas(lambda it: it, schema="x int").collect()

    outdir = None
    if tag != "-":
        outdir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
        os.makedirs(outdir, exist_ok=True)

    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            continue
        times = []
        df = None
        try:
            for it in range(runs):
                spark.sparkContext.setJobDescription(f"{name}#{it}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
        except Exception as exc:
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if outdir is not None:
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        nex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        npy = len(
            re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow)", plan)
        )
        ts = sorted(times)
        print(
            f"{name}: best={ts[0]:.3f}s med={ts[len(ts)//2]:.3f}s "
            f"runs={[round(t, 3) for t in times]} exchanges={nex} "
            f"joins={joins} pyeval={npy}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
