"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

SURVEY.md §2.1: the extensible-source surface. The reference engine's
pluggable-scan concept maps in PySpark 4 to a user-defined DataSource:
`partitions()` declares the parallel split (each partition becomes one
Spark task — the scan scales out like any file source) and `read()`
yields that partition's rows in the worker. The generator below is
deterministic (Knuth multiplicative hash of the row id), so an oracle
can reproduce it exactly in SQL — which is what makes the query
differential-checkable rather than rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_KNUTH = 2654435761  # golden-ratio multiplier, fits the val in 32 bits
_MOD = 4294967296


class SynthDataSource(DataSource):
    """`spark.read.format("pydra_synth").option("rows", N)` source."""

    @classmethod
    def name(cls) -> str:
        return "pydra_synth"

    def schema(self) -> str:
        return "id BIGINT, val BIGINT"

    def reader(self, schema) -> "SynthReader":
        return SynthReader(self.options)


class SynthReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))
        if self.parts < 1:
            # parts=0 would yield an EMPTY partition list — a silently
            # zero-row scan regardless of `rows`, far from the misuse
            raise ValueError(f"parts must be >= 1, got {self.parts}")
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple[int, int]]:
        # contiguous slices; the last partition absorbs the remainder
        per = self.rows // self.parts
        start = partition.value * per
        end = self.rows if partition.value == self.parts - 1 else start + per
        for i in range(start, end):
            yield (i, (i * _KNUTH) % _MOD)


def register(spark) -> None:
    """Idempotent registration (re-register replaces on Spark 4)."""
    spark.dataSource.register(SynthDataSource)
