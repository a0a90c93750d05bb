"""pydra_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the ``jlg/pydra-map-reduce`` reference
(whose checkout at /root/reference is empty — see SURVEY.md §0; the
operator inventory in SURVEY.md §2 is the authoritative spec).

Layout:
    session    — SparkSession factory tuned for local[N] and cluster scale
    sources    — declared schemas + parquet/csv/json/text readers, sinks
    plans      — the query registry (queries + DuckDB oracle SQL)
    operators  — composite operators (dedup, similarity, as-of, map-reduce)
    functions  — reusable column-expression helpers
    streaming  — Structured Streaming variants of the event-time operators
"""

__version__ = "0.1.0"
