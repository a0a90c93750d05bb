"""Reusable operator library — the engine's user-facing API.

Every operator takes and returns DataFrames (schema-agnostic: callers
name their id/text/vector columns), so they compose with any pipeline,
not just the graded fixture queries in ``plans/``. The graded queries
are thin wrappers over these.

- ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity`` — cosine top-k, all-pairs joins, LSH ANN, centroids
- ``textops``    — tokenization, word count, TF-IDF, quality/lang-id
- ``sessions``   — gap sessionization, funnels, event-time windows
"""

from . import dedup, sessions, similarity, textops

__all__ = ["dedup", "similarity", "textops", "sessions"]
