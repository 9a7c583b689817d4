"""Custom Python STREAMING DataSource: the Kinesis replay double as a real
Structured Streaming connector (guide:13 R1) — offset-managed micro-batches
of wire-form records, implemented against `pyspark.sql.datasource`'s
SimpleDataSourceStreamReader so the engine consumes the fixture stream
exactly the way it would consume a third-party service, checkpointable
offsets included.

Offsets are record indices ({"i": n}); each micro-batch serves
BATCH_RECORDS records, and `readBetweenOffsets` replays any committed
range deterministically (the exactly-once recovery contract — the wire
fixture is regenerated on demand, so replays can't drift). The reference's
per-shard ordering guarantee maps to the record order within the fixture's
shard interleave, preserved by the index offsets.

Scale note: a SimpleDataSourceStreamReader serves from the driver — right
for a replay double and for low-volume control streams. The
high-throughput path is the partitioned `streamReader` variant (one
InputPartition per shard, executor-side reads): same offset contract,
q247's partition-planning pattern, and the swap is one method.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

BATCH_RECORDS = 7  # records per micro-batch (3 batches over the 20-record fixture)


class WireReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self):
        # deterministic regeneration: replays serve identical bytes
        from kinesis_customer_sample_spark.fixtures import encode_records

        self._records, _ = encode_records()

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(lo + BATCH_RECORDS, len(self._records))
        return iter(self._records[lo:hi]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._records[start["i"] : end["i"]])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the fixture regenerates


class WireReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kcss_wire_replay"

    def schema(self) -> str:
        return "shard_id string, sequence_number string, data binary"

    def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed wire schema
        return WireReplayStreamReader()
