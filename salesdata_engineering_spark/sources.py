"""Custom Python data source (Spark 4 DataSource API) — the SOURCE-side
escape hatch, the way Python UDTFs are the function-side one.

The reference reads only CSV + JDBC (SURVEY §2.1); Spark's
`pyspark.sql.datasource` API (public, Spark 4+) lets a pure-Python
class serve scans to the engine with real partition planning — the
integration point for feeds with no built-in reader (internal APIs,
queue snapshots, bespoke binary logs). The synthetic source here is
deliberately arithmetic (rows are a pure function of row id) so a SQL
oracle can reproduce every value and the parallel-read path is
value-checked, not just smoke-tested.

Scale shape: `partitions()` returns one split per range chunk and Spark
schedules one task per split — the same contract a JDBC partitioned
read or a custom REST paginator would implement. State never crosses
splits; each `read()` regenerates its slice deterministically, so task
retries are exactly-once-equivalent.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticSalesReader(DataSourceReader):
    def __init__(self, options):
        self.n = max(0, int(options.get("n", 1000)))
        self.splits = max(1, int(options.get("splits", 8)))

    def partitions(self):
        # n=0 is a legitimate empty source: one empty split, zero rows —
        # never a planner crash (range() with step 0 / division by 0)
        if self.n == 0:
            return [_RangePartition(0, 0)]
        step = -(-self.n // self.splits)
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            # pure function of row id — any engine can re-derive it
            yield (i, i % 25, round((i * 37 % 10000) / 100.0, 2))


class SyntheticSalesDataSource(DataSource):
    """spark.read.format("synthetic_sales").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sales"

    def schema(self) -> str:
        return "sale_id bigint, store_id bigint, amount double"

    def reader(self, schema) -> SyntheticSalesReader:
        return SyntheticSalesReader(self.options)
