"""Python UDTF (user-defined TABLE function) — one row in, many rows out.

Completes the UDF-surface trifecta alongside scalar Pandas UDFs
(operators/multimodal.py) and grouped/stateful Pandas operators
(operators/grouped_map.py, streaming/stateful.py). The reference has no
UDTFs at all (SURVEY.md §2.7: its only custom callable is a group
aggregator); Spark 4 UDTFs add the missing generator shape: per-row
fan-out with Python logic too irregular for built-in expressions.

Discipline unchanged from the rest of the engine: anything expressible
with built-ins STAYS built-in (document chunking in operators/text.py is
sequence+posexplode, not a UDTF). The UDTF path is for logic that needs
real Python per row — here a sentence splitter stands in for e.g. a
model-backed segmenter; its semantics are deliberately chosen to be
reproducible by DuckDB string functions so the oracle can hash-verify
the plumbing (ordering, lateral join, column threading) end to end.

At scale: a UDTF is a narrow per-partition stage (no shuffle), with
rows crossing into a Python worker. ``useArrow=True`` batches that
boundary; still expect ~10× less throughput than codegen'd expressions
— budget it for the irregular 1% of the pipeline, not the scan path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table


@udtf(returnType="tok_idx int, tok_len int", useArrow=True)
class SplitTokens:
    """Emit (1-based index, codepoint length) for each single-space-
    separated segment — Python ``str.split(' ')`` and DuckDB
    ``string_split(text, ' ')`` agree on empty-segment semantics
    (consecutive separators → empty segments kept), and both
    ``len``/``length`` count codepoints, so the fan-out is
    bit-reproducible."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, segment in enumerate(text.split(" ")):
            yield i + 1, len(segment)


@register(
    "op_udtf_token_explode",
    """SELECT doc_id,
              CAST(generate_subscripts(parts, 1) AS INT) AS tok_idx,
              CAST(length(unnest(parts)) AS INT) AS tok_len
       FROM (SELECT doc_id, string_split(text, ' ') AS parts
             FROM documents)""",
)
def op_udtf_token_explode(spark, sf_dir):
    """Python UDTF via LATERAL join: every document fans out to one row
    per token (~60× row expansion) with the outer doc_id threaded
    through. The lateral UDTF call is per-partition (no shuffle, no
    driver round-trip); Arrow batches the Python boundary."""
    spark.udtf.register("split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """SELECT d.doc_id, s.tok_idx, s.tok_len
           FROM v_docs_udtf d, LATERAL split_tokens(d.text) s"""
    )
