"""niamoto_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the niamoto reference pipeline.

The reference (see /root/reference, surveyed in SURVEY.md) is a single-process
pandas + embedded-DB system that loops over entities and widgets, issuing
O(entities x widgets) SQL round trips (reference:
src/niamoto/core/services/transformer.py:488-541).  This engine inverts that
loop: every transformer is expressed as a set-oriented Spark DataFrame
operation — one `groupBy(group_id).agg(...)` job computes a widget for *all*
entities at once — so the same declarative configs scale from thousands of
rows on a laptop to 100 TB on a cluster.

Layout
------
- ``session``      SparkSession factory tuned for the target environment.
- ``registry``     plugin registry (same @register(name, type) contract as the
                   reference, base.py:438-494) mapping names to Spark ops.
- ``catalog``      entity registry: logical name -> storage path + schema +
                   id_field + kind + links (reference registry.py:16-131).
- ``hierarchy``    hierarchy derivation, nested sets, transitive closure.
- ``operators``    the SURVEY §2 operator inventory re-expressed Spark-first,
                   plus large-scale training-data ops (dedup, similarity,
                   text analysis, multimodal plumbing).
- ``functions``    reusable Column helpers (entropy, histograms, cosine, ...).
- ``plans``        restricted SQL/expression surfaces (SELECT-only guard,
                   predicate grammar, safe formula eval).
- ``sources``      readers (csv sniffing, parquet, vector/raster stubs).
- ``exporters``    JSON static-API / Darwin Core projections.
- ``streaming``    Structured Streaming variants for the append `events` flow.
"""

__version__ = "0.1.0"

from niamoto_spark.session import get_spark  # noqa: F401
