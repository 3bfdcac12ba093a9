"""Portable hashing: identical results in Spark and in the DuckDB oracle.

Spark's ``hash()`` (murmur3) and ``xxhash64()`` have no DuckDB twin, so
every hash that must be *verifiable cross-engine* (dedup keys, minhash
signatures, fingerprints) is built from ``md5`` hex strings, which both
engines compute identically. Ordering on fixed-width lowercase hex equals
ordering on the underlying 128-bit integer, so ``min(md5(...))`` is a
valid minhash permutation without any hex→int conversion.

Inside Spark-only paths (salting, bucketing) prefer native ``xxhash64`` —
it is cheaper; portability is only needed where the oracle re-derives the
value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint as lowercase hex.

    DuckDB oracle equivalent: ``md5(col)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def portable_hex_hash(col: Column | str, seed: int) -> Column:
    """Seeded md5 hex hash — one 'permutation' per seed for minhash.

    DuckDB oracle equivalent: ``md5(CAST(seed AS VARCHAR) || ':' || col)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"), c.cast("string")))


def hex_prefix_bits(hex_col: Column, n_bits: int) -> Column:
    """First ``n_bits`` (multiple of 4) of a hex digest as a BIGINT.

    Used for numeric bucketing (e.g. SimHash bit tests). DuckDB twin uses
    per-nibble ``strpos('0123456789abcdef', c) - 1`` arithmetic.
    """
    n_nibbles = n_bits // 4
    return F.conv(F.substring(hex_col, 1, n_nibbles), 16, 10).cast("bigint")
