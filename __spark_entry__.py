"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes the full operator catalog (niamoto_spark.queries);
``oracle_sql()`` returns the DuckDB equivalents for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from niamoto_spark.queries import build_oracles, build_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from niamoto_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extensions)."""
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; hash-seed-dependent / approximate
    operators (minhash, simhash, ngram-LSH, IVF) are rows-only by design."""
    return build_oracles()
