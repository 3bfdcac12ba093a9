"""Plans: medallion pipeline and star-schema builders + analytics queries."""

from gravity_books_datalakehouse_spark.plans.star import (
    build_star,
    star_queries,
    STAR_CTE_SQL,
)

__all__ = ["build_star", "star_queries", "STAR_CTE_SQL"]
