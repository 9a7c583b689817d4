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


# ---------------------------------------------------------------------------
# Custom Python streaming SINK (R15's foreign-CMS sync as a connector): a
# transactional JSONL writer with a two-phase commit — tasks write
# uncommitted part files and return their paths as commit messages; the
# driver's commit() publishes a per-batch manifest ONLY after every task
# succeeded; abort() removes the orphans. Readers consult the manifests, so
# a replayed/failed batch can never surface twice: exactly-once by
# manifest, the same protocol real table formats use.

import dataclasses
import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage


@dataclasses.dataclass
class _PartMsg(WriterCommitMessage):
    path: str
    n_rows: int


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.base = options.get("path")
        if not self.base:
            raise ValueError("kcss_manifest_jsonl sink requires option 'path'")
        _os.makedirs(_os.path.join(self.base, "_data"), exist_ok=True)
        _os.makedirs(_os.path.join(self.base, "_manifests"), exist_ok=True)

    def write(self, iterator):
        part = _os.path.join(self.base, "_data", f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartMsg(path=part, n_rows=n)

    def commit(self, messages, batchId):
        manifest = _os.path.join(self.base, "_manifests", f"{batchId}.json")
        if _os.path.exists(manifest):
            return  # batch replayed after a successful commit: idempotent
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "batch_id": batchId,
                    "files": [m.path for m in messages if m],
                    "n_rows": sum(m.n_rows for m in messages if m),
                },
                f,
            )
        _os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages, batchId):
        for m in messages:
            if m and _os.path.exists(m.path):
                _os.remove(m.path)


class ManifestJsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kcss_manifest_jsonl"

    def streamWriter(self, schema, overwrite):  # noqa: ARG002
        return ManifestJsonlStreamWriter(self.options)


def read_committed(base: str) -> list[dict]:
    """Reader side of the manifest protocol: only rows in files referenced
    by a published manifest exist."""
    rows: list[dict] = []
    mdir = _os.path.join(base, "_manifests")
    for name in sorted(_os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(_os.path.join(mdir, name)) as f:
            manifest = _json.load(f)
        for path in manifest["files"]:
            with open(path) as f:
                rows.extend(_json.loads(line) for line in f)
    return rows


# ---------------------------------------------------------------------------
# The PARTITIONED stream reader — the scale path promised above: the driver
# only tracks offsets ({"i": n}); each micro-batch's record range is split
# into one InputPartition PER SHARD, and executors regenerate and serve
# their shard's slice independently (no driver funnel, no record bytes on
# the driver). This is the shape a real Kinesis connector has: shard =
# partition, offsets = per-batch sequence ranges.

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition


class WireReplayPartitionedReader(DataSourceStreamReader):
    def __init__(self):
        from kinesis_customer_sample_spark.fixtures import encode_records

        # driver holds COUNTS only; records regenerate executor-side
        self._n = len(encode_records()[0])

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        # serve everything still pending, BATCH_RECORDS per micro-batch
        # (the driver calls this once per batch)
        if not hasattr(self, "_served"):
            self._served = 0
        self._served = min(self._served + BATCH_RECORDS, self._n)
        return {"i": self._served}

    def partitions(self, start: dict, end: dict):
        # one partition per shard within the record range
        return [
            InputPartition((start["i"], end["i"], shard)) for shard in (0, 1)
        ]

    def read(self, partition):
        # executor-side: regenerate deterministically, serve this shard's
        # slice of the range
        from kinesis_customer_sample_spark.fixtures import encode_records

        lo, hi, shard = partition.value
        records, _ = encode_records()
        for rec in records[lo:hi]:
            if rec[0] == f"shard-{shard}":
                yield rec

    def commit(self, end: dict) -> None:
        pass


class WireReplayPartitionedSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kcss_wire_replay_sharded"

    def schema(self) -> str:
        return "shard_id string, sequence_number string, data binary"

    def streamReader(self, schema):  # noqa: ARG002 — fixed wire schema
        return WireReplayPartitionedReader()
