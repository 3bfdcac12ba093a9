"""PII scrubbing for training-data curation (beyond-reference, §2.8).

Redacts email addresses, phone numbers, and IPv4 addresses from a text
column with chained ``regexp_replace`` — pure JVM column expressions
inside whole-stage codegen, so the scrub runs at scan speed over 100 TB
with zero shuffles (the only shuffle in the registry query is the final
per-source report).

Regex discipline: patterns use only syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded/greedy
quantifiers, no lookaround, no backrefs — so the oracle re-derives every
count and every redacted byte. Order matters: IPs are redacted before
phones (an IPv4 is also a digits-and-dots run the phone pattern would
claim); counts follow the same precedence.

The synthetic corpus contains no PII (no digits at all), so the registry
query deterministically appends a contact block derived from doc_id on
BOTH engines before scrubbing — the regexes are exercised for real, and
the oracle still verifies bit-for-bit. ``redact_pii`` itself is the
production entry point for raw crawled text.

Reference scope note: the reference pipeline carries customer emails
verbatim into the DWH (etl_script_dwh/etl_dwh.py:47-55 keeps
customer.email); a training-data lakehouse must scrub instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PHONE_RE = r"[+(]?[0-9][0-9()\-. ]{6,}[0-9]"


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4s, then phone-like runs with typed tags."""
    c = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


#: Deterministic PII-bearing contact block, derivable on both engines.
_CONTACT_SPARK = (
    "concat(text, ' Contact user', CAST(doc_id AS STRING), "
    "'@example.com or +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' at 10.0.', CAST(doc_id % 256 AS STRING), '.', CAST(doc_id % 100 AS STRING))"
)
_CONTACT_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)"
)


@register(
    "text_pii_redact",
    f"""WITH t AS (
          SELECT source, {_CONTACT_SQL} AS contact FROM documents),
        r AS (
          SELECT source, contact,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(contact, '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{IPV4_RE}', '<IP>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
                 len(regexp_extract_all(contact, '{EMAIL_RE}')) AS n_emails,
                 len(regexp_extract_all(contact, '{IPV4_RE}')) AS n_ips,
                 len(regexp_extract_all(
                   regexp_replace(contact, '{IPV4_RE}', '<IP>', 'g'),
                   '{PHONE_RE}')) AS n_phones
          FROM t)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
               CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
               CAST(SUM(n_ips) AS BIGINT) AS ips_redacted,
               CAST(SUM(len(contact) - len(redacted)) AS BIGINT) AS chars_removed,
               min(md5(redacted)) AS sample_fingerprint
        FROM r
        GROUP BY source
        ORDER BY source""",
)
def text_pii_redact(spark, sf_dir):
    """Scrub PII from every document and report per-source redaction
    counts plus a content fingerprint of the scrubbed text (proves the
    replacement bytes match the oracle exactly, not just the counts)."""
    docs = load_table(spark, sf_dir, "documents")
    contact = F.expr(_CONTACT_SPARK)
    t = docs.select("source", contact.alias("contact"))
    r = t.select(
        "source",
        "contact",
        redact_pii(F.col("contact")).alias("redacted"),
        F.regexp_count(F.col("contact"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("contact"), F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(F.col("contact"), IPV4_RE, "<IP>"), F.lit(PHONE_RE)
        ).alias("n_phones"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").cast("bigint").alias("emails_redacted"),
            F.sum("n_phones").cast("bigint").alias("phones_redacted"),
            F.sum("n_ips").cast("bigint").alias("ips_redacted"),
            F.sum(F.length("contact") - F.length("redacted"))
            .cast("bigint")
            .alias("chars_removed"),
            F.min(F.md5("redacted")).alias("sample_fingerprint"),
        )
        .orderBy("source")
    )
