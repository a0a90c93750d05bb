"""Multimodal (binary) columns. SURVEY.md §2.11.

Images/audio/video ride in DataFrames as opaque `binary` payloads plus
typed metadata. The fixtures carry no media, so the payload here is
the utf-8 encoding of `documents.text` — which makes the whole Spark
plumbing (BinaryType schema, Arrow transfer of bytes into pandas,
mapInPandas feature extraction, metadata structs) real and
differentially testable: byte-level features are recomputable in SQL.

The actual media decode (PIL/ffmpeg) is STUBBED — `_decode_stub`
returns deterministic byte-level pseudo-features and raises
NotImplementedError when asked for a real decode, as the container has
no codec libraries. Swapping in a real decoder changes only that
function; schema/partitioning/batch shape stay as tested here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def _decode_stub(payload: bytes, kind: str) -> tuple[int, int]:
    """Deterministic fake 'decode': (byte_len, first_byte).

    A real implementation would dispatch on ``kind`` to PIL / soundfile
    / ffmpeg; those libs are absent here by design.
    """
    if kind != "text/plain":
        raise NotImplementedError(f"no codec for {kind!r} in this environment")
    return len(payload), payload[0] if payload else -1


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           'text/plain'                       AS kind,
           CAST(strlen(text) AS BIGINT)       AS byte_len,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
    FROM documents
    """,
    section="2.11 multimodal columns (binary payload + pandas-UDF feature extract)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload column → mapInPandas feature extraction. The
    oracle recomputes the byte features from the source text (ascii
    fixture ⇒ byte_len == strlen), proving bytes survive the Arrow
    round-trip intact."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("kind"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(
        extract, "doc_id long, kind string, byte_len long, first_byte int"
    )
