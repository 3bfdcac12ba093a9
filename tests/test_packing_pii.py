"""Sequence packing + PII scrubbing: behavioral oracles on constructed
inputs (the registry queries' DuckDB oracles cover testdata parity; these
prove the operator semantics directly)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.packing import (
    CAPACITY,
    pack_assignments,
    pipeline_pack_sequences,
)
from gravity_books_datalakehouse_spark.operators.pii import redact_pii
from gravity_books_datalakehouse_spark.plans.operator_queries import oracle_sql

from tests.conftest import SF_CORRECT, assert_matches_oracle


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestPacking:
    def test_contiguous_fill_semantics(self, spark):
        # 5 docs of 1000 tokens that hash into the SAME shard (so they
        # share one cumulative stream): bins fill at 2048.
        import hashlib

        ids = [i for i in range(200) if hashlib.md5(str(i).encode()).hexdigest()[0] == "c"][:5]
        assert len(ids) == 5
        rows = [(i, "en", " ".join(["w"] * 1000)) for i in ids]
        a = (
            pack_assignments(_docs(spark, rows))
            .orderBy("doc_id")
            .collect()
        )
        # cumulative starts: 0,1000,2000,3000,4000 → bins 0,0,0|1,1,1|2
        assert [(r.first_bin, r.last_bin) for r in a] == [
            (0, 0),
            (0, 0),
            (0, 1),  # straddles the 2048 boundary
            (1, 1),
            (1, 2),  # straddles 4096
        ]
        assert all(r.ntok == 1000 for r in a)

    def test_bins_partition_token_stream(self, spark):
        # Random-ish sizes: every token index maps to exactly one bin ⇒
        # sum(ntok) == tokens covered by [first_bin..last_bin] spans with
        # no gaps: max(last_bin) bins hold all tokens.
        rows = [(i, "en", " ".join(["w"] * (37 * (i % 91) + 1))) for i in range(200)]
        a = pack_assignments(_docs(spark, rows))
        agg = a.groupBy("lang", "shard").agg(
            F.sum("ntok").alias("tot"), F.max("last_bin").alias("mb")
        )
        for r in agg.collect():
            # total tokens land inside (mb+1) bins, filling all but the tail
            assert r.mb == (r.tot - 1) // CAPACITY

    def test_shard_is_layout_invariant(self, spark):
        rows = [(i, "en", " ".join(["w"] * 100)) for i in range(64)]
        one = pack_assignments(_docs(spark, rows).coalesce(1))
        many = pack_assignments(_docs(spark, rows).repartition(7))
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))

    def test_registry_query_matches_oracle(self, spark, duck):
        assert_matches_oracle(
            pipeline_pack_sequences(spark, SF_CORRECT),
            duck,
            oracle_sql()["pipeline_pack_sequences"],
        )


class TestPIIRedact:
    CASES = [
        ("mail me at bob.smith+x@corp.example.org today", "mail me at <EMAIL> today"),
        ("call +1-555-867-5309 now", "call <PHONE> now"),
        ("call (02) 9374 4000 now", "call <PHONE> now"),
        ("host 192.168.001.250 is up", "host <IP> is up"),
        # IP precedence: a dotted quad is NOT claimed by the phone pattern
        ("ping 10.0.0.7 or dial 555-123-4567", "ping <IP> or dial <PHONE>"),
        ("no pii here", "no pii here"),
    ]

    def test_redaction_cases(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, (s, _) in enumerate(self.CASES)], "i long, s string"
        )
        got = {
            r.i: r.red
            for r in df.select("i", redact_pii(F.col("s")).alias("red")).collect()
        }
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"

    def test_redaction_matches_duckdb_regexes(self, spark):
        """Same chain, same strings, DuckDB RE2 vs Spark Java regex."""
        from gravity_books_datalakehouse_spark.operators.pii import (
            EMAIL_RE,
            IPV4_RE,
            PHONE_RE,
        )

        con = duckdb.connect()
        for i, (s, _) in enumerate(self.CASES):
            (duck_red,) = con.execute(
                f"""SELECT regexp_replace(regexp_replace(regexp_replace(
                      ?, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{IPV4_RE}', '<IP>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g')""",
                [s],
            ).fetchone()
            assert duck_red == self.CASES[i][1]

    def test_registry_query_matches_oracle(self, spark, duck):
        from gravity_books_datalakehouse_spark.operators.pii import text_pii_redact

        assert_matches_oracle(
            text_pii_redact(spark, SF_CORRECT), duck, oracle_sql()["text_pii_redact"]
        )


class TestGroupedAggUDF:
    def test_weighted_avg_matches_native(self, spark):
        from gravity_books_datalakehouse_spark.operators.grouped_map import (
            op_grouped_agg_weighted_avg,
        )
        from gravity_books_datalakehouse_spark.sources.catalog import load_table

        got = {
            r.l_returnflag: (r.wavg_price, r.n_lines)
            for r in op_grouped_agg_weighted_avg(spark, SF_CORRECT).collect()
        }
        li = load_table(spark, SF_CORRECT, "lineitem")
        want = {
            r.l_returnflag: (r.w, r.n)
            for r in li.groupBy("l_returnflag")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                    / F.sum("l_quantity"),
                    4,
                ).alias("w"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert got.keys() == want.keys()
        for k in got:
            assert got[k][1] == want[k][1]
            assert got[k][0] == pytest.approx(want[k][0], abs=1e-3)


class TestDistributedNtile:
    def test_matches_native_ntile_uneven_and_tiny(self, spark):
        from pyspark.sql import Window
        from gravity_books_datalakehouse_spark.operators.sort import (
            distributed_ntile,
        )

        for n_rows, n_tiles in [(1497, 10), (7, 10), (23, 4)]:
            df = spark.range(n_rows).select(
                F.col("id").alias("k"), (F.col("id") * 37 % 101).alias("v")
            )
            order = [F.desc("v"), F.asc("k")]
            mine = distributed_ntile(df, order, n_tiles, "t")
            ref = df.select(
                "k", F.ntile(n_tiles).over(Window.orderBy(*order)).alias("t")
            )
            diff = (
                mine.alias("a")
                .join(ref.alias("b"), "k")
                .filter(F.col("a.t") != F.col("b.t"))
                .count()
            )
            assert diff == 0, f"N={n_rows} n={n_tiles}"
