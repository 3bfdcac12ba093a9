"""Scalar-function kits: date dimension (F1–F4) and portable hashing."""

from gravity_books_datalakehouse_spark.functions.datekit import (
    build_date_dim,
    date_dim_from_bounds,
)
from gravity_books_datalakehouse_spark.functions.hashing import (
    md5_fingerprint,
    portable_hex_hash,
)

__all__ = [
    "build_date_dim",
    "date_dim_from_bounds",
    "md5_fingerprint",
    "portable_hex_hash",
]
