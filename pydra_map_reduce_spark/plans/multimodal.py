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


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(n_chars // 50 + 1 AS BIGINT)          AS n_frames,
           CAST((n_chars // 50 + 2) // 2 AS BIGINT)   AS n_sampled,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT)  AS first_frame_byte
    FROM documents
    """,
    section="2.11 multimodal: frame-sample a binary 'video' payload (stubbed decode)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped pipeline: payload → frame count → sample every 2nd
    frame → per-frame feature. The codec is the deterministic stub
    (frame i = payload[50*i]); the Spark plumbing — binary column in,
    Arrow batch to pandas, 1-row-per-doc features out — is exactly
    what a real ffmpeg-backed extractor swaps into."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // 50 + 1  # stub: one 'frame' per 50 bytes
                sampled = list(range(0, n_frames, 2))  # every 2nd frame
                first_byte = b[0] if b else -1
                rows.append((doc_id, n_frames, len(sampled), first_byte))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_frames", "n_sampled", "first_frame_byte"]
        )

    return media.mapInPandas(
        sample_frames,
        "doc_id long, n_frames long, n_sampled long, first_frame_byte long",
    )
