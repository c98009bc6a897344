"""User-defined Python data source (PySpark 4 DataSource V2 Python API,
pyspark.sql.datasource — public API added in Spark 4.0): the §2.8-style
surface the other sources don't cover. A DataSource subclass declares its
schema, plans InputPartitions, and each executor reads ITS partition via
``read(partition)`` — so the source itself is distributed, not a driver
collect that gets parallelized afterwards (the contrast is
sources/http_source.py, where the bounded dimension IS driver-fetched by
design and the mapInPandas path exists for the unbounded case).

The source synthesizes a deterministic double-entry ledger from pure
integer arithmetic (id·2654435761 mod bounds — a Knuth multiplicative
hash, public), so the DuckDB oracle can regenerate the identical rows
from range() and verify the whole path end-to-end: partition planning →
per-partition generation → Arrow batches → aggregation.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LEDGER_ROWS = 8000
LEDGER_PARTS = 8
_MULT = 2654435761  # Knuth's 2^32 / phi multiplicative-hash constant
_ACCOUNTS = 97
_CENTS_MOD = 1_000_000


class _LedgerPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _LedgerReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = max(0, int(options.get("rows", LEDGER_ROWS)))
        self.n_parts = max(1, int(options.get("numPartitions", LEDGER_PARTS)))

    def partitions(self):  # planned on the driver; metadata only
        if self.n_rows == 0:
            # an empty but valid plan: one partition yielding no rows
            return [_LedgerPartition(0, 0)]
        step = -(-self.n_rows // self.n_parts)
        return [
            _LedgerPartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _LedgerPartition):  # runs on executors
        for i in range(partition.start, partition.end):
            h = (i * _MULT) % (1 << 32)
            yield (i, h % _ACCOUNTS, (h % _CENTS_MOD) / 100.0)


class LedgerDataSource(DataSource):
    """``spark.read.format("synth_ledger")`` — options: rows, numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "synth_ledger"

    def schema(self) -> str:
        return "entry_id bigint, account int, amount double"

    def reader(self, schema) -> _LedgerReader:
        return _LedgerReader(self.options)
