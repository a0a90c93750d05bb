"""pydra_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of a Python map-reduce framework plus the LLM-pipeline
operator set (dedup, similarity search, text analysis, multimodal
columns). See SURVEY.md §2 for the graded operator inventory.

Layout:
- ``api``       — Pipeline, the mrjob-style user API
- ``operators`` — schema-agnostic operator library (dedup/similarity/
  textops/sessions)
- ``session``   — SparkSession factory (AQE, Arrow, UTC, broadcast tuning)
- ``sources``   — fixture schemas + fail-fast loaders
- ``plans``     — the graded query registry (one module per operator family)
"""

from .api import Pipeline
from .session import get_spark
from .sources.tables import SCHEMAS, TABLES, load_table, register_views

__all__ = [
    "Pipeline",
    "get_spark",
    "SCHEMAS",
    "TABLES",
    "load_table",
    "register_views",
]
