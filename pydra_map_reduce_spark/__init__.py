"""pydra_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of a Python map-reduce framework plus the LLM-pipeline
operator set (dedup, similarity search, text analysis, multimodal
columns). See SURVEY.md §2 for the graded operator inventory.

Layout:
- ``session``   — SparkSession factory (AQE, Arrow, UTC, broadcast tuning)
- ``sources``   — fixture schemas + fail-fast loaders
- ``plans``     — the graded query registry (one module per operator family)
"""

from .session import get_spark
from .sources.tables import SCHEMAS, TABLES, load_table, register_views

__all__ = ["get_spark", "SCHEMAS", "TABLES", "load_table", "register_views"]
