"""Content-operation fixtures (FIXTURES.md §B) — the golden test vectors.

One literal row set, three renderings:
- `content_ops_df(spark)` — decoded-payload DataFrame (batch forms of R6-R13);
- `content_ops_values_sql()` — the same rows as a DuckDB VALUES CTE, so the
  driver's oracle can check the key-semantics queries without extra files;
- `encode_records()` — the wire form: gzip blobs per the record envelope
  (guide:17-19), ~10% spilled to pre-signed-URL pointers (guide:17,32), some
  expired (guide:36-39), for the decode-path operators R2-R5.

The sequence for (story-1, default) reproduces guide:126-134 exactly: what
looks like save→publish→publish→unpublish→republish is two independent
streams — 2 draft updates and 3 published-copy operations (guide:137-139).
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RFC3339 = "%Y-%m-%dT%H:%M:%SZ"
SPARK_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
DUCKDB_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"

# (op_id, organization_id, operation, date, id, branch, published, created,
#  trigger_type, trigger_id, trigger_referent_update, trigger_priority,
#  trigger_app_name, body-json)
CONTENT_OPS: list[tuple] = [
    # --- guide:126-134 interleave for (story-1, default): draft vs published
    (1, "washpost", "insert-story", "2024-05-01T10:00:00Z", "story-1", "default", False, True,
     "story", "story-1", False, "standard", "editor", '{"headline": "draft v1"}'),
    (2, "washpost", "insert-story", "2024-05-01T10:05:00Z", "story-1", "default", True, True,
     "story", "story-1", False, "standard", "editor", '{"headline": "published v1"}'),
    (3, "washpost", "insert-story", "2024-05-01T10:10:00Z", "story-1", "default", True, False,
     "story", "story-1", False, "standard", "editor", '{"headline": "published v2"}'),
    (4, "washpost", "delete-story", "2024-05-01T10:15:00Z", "story-1", "default", True, False,
     "story", "story-1", False, "standard", "editor", "null"),
    (5, "washpost", "insert-story", "2024-05-01T10:20:00Z", "story-1", "default", True, True,
     "story", "story-1", False, "standard", "editor", '{"headline": "published v3"}'),
    (6, "washpost", "insert-story", "2024-05-01T10:25:00Z", "story-1", "default", False, False,
     "story", "story-1", False, "standard", "editor", '{"headline": "draft v2"}'),
    # --- story-2: referent (downstream) updates, guide:90,100-102
    (7, "washpost", "insert-story", "2024-05-01T11:00:00Z", "story-2", "default", True, True,
     "story", "story-2", False, "standard", "composer", '{"headline": "s2 v1"}'),
    (8, "washpost", "insert-story", "2024-05-01T11:30:00Z", "story-2", "default", True, False,
     "image", "img-9", True, "ingestion", "photo-center", '{"headline": "s2 v1 img"}'),
    (9, "washpost", "insert-story", "2024-05-01T12:00:00Z", "story-2", "default", True, False,
     "video", "vid-3", True, "ingestion", "video-center", '{"headline": "s2 v1 vid"}'),
    # --- gallery / video / redirect types (guide:70-72)
    (10, "washpost", "insert-gallery", "2024-05-01T12:30:00Z", "gal-1", "default", True, True,
     "gallery", "gal-1", False, "standard", "editor", '{"items": 3}'),
    (11, "washpost", "insert-video", "2024-05-01T13:00:00Z", "vid-1", "default", True, True,
     "video", "vid-1", False, "ingestion", "video-center", '{"duration": 120}'),
    (12, "washpost", "insert-redirect", "2024-05-01T13:30:00Z", "red-1", "default", True, True,
     "redirect", "red-1", False, "standard", "editor", '{"to": "/new-url"}'),
    (13, "washpost", "delete-gallery", "2024-05-01T14:00:00Z", "gal-1", "default", True, False,
     "gallery", "gal-1", False, "standard", "editor", "null"),
    # --- second branch of story-1 (branch is part of the key, guide:78-82)
    (14, "washpost", "insert-story", "2024-05-01T14:30:00Z", "story-1", "exp-A", True, True,
     "story", "story-1", False, "standard", "ab-test", '{"headline": "exp A"}'),
    # --- late ingestion-priority event (guide:104-106), out of order
    (15, "washpost", "insert-story", "2024-05-01T09:00:00Z", "story-2", "default", True, False,
     "image", "img-2", True, "ingestion", "photo-center", '{"headline": "s2 late"}'),
    # --- another org (guide:66-68)
    (16, "otherorg", "insert-story", "2024-05-01T15:00:00Z", "story-9", "default", True, True,
     "story", "story-9", False, "standard", "editor", '{"headline": "other org"}'),
]

COLUMNS = [
    "op_id", "organization_id", "operation", "date", "id", "branch", "published",
    "created", "trigger_type", "trigger_id", "trigger_referent_update",
    "trigger_priority", "trigger_app_name", "body",
]

_SCHEMA = T.StructType(
    [
        T.StructField("op_id", T.IntegerType()),
        T.StructField("organization_id", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("branch", T.StringType()),
        T.StructField("published", T.BooleanType()),
        T.StructField("created", T.BooleanType()),
        T.StructField("trigger_type", T.StringType()),
        T.StructField("trigger_id", T.StringType()),
        T.StructField("trigger_referent_update", T.BooleanType()),
        T.StructField("trigger_priority", T.StringType()),
        T.StructField("trigger_app_name", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def content_ops_df(spark: SparkSession) -> DataFrame:
    """The decoded content-operation rows as a DataFrame (flat trigger cols)."""
    return spark.createDataFrame(CONTENT_OPS, _SCHEMA)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def content_ops_values_sql() -> str:
    """The same rows as a DuckDB VALUES relation named `content_ops`."""
    rows = ",\n      ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in CONTENT_OPS
    )
    cols = ", ".join(COLUMNS)
    return f"(VALUES\n      {rows}\n    ) AS content_ops({cols})"


# ------------------------------------------------------------- wire encoding

# Kinesis sequence numbers are ~56-digit decimal STRINGS — they overflow
# int64 (and decimal(38,0)), so the wire schema carries them as strings and
# ordering-sensitive consumers sort numerically via (length, value) or a
# zero-padded form. The fixture base makes every generated number the same
# width, so plain lexicographic order is already numeric order.
_SEQ_BASE = 49590338271490256608559692538361571095921575989136588898


def wire_seq(i: int) -> str:
    """The fixture's Kinesis-shaped sequence number for record index i."""
    return str(_SEQ_BASE + i)


def payload_json(row: tuple) -> str:
    """Render one fixture row as the content-operation JSON document
    (nested trigger struct, guide:88-110)."""
    d = dict(zip(COLUMNS, row))
    doc = {
        "type": "content-operation",
        "organization_id": d["organization_id"],
        "operation": d["operation"],
        "date": d["date"],
        "id": d["id"],
        "branch": d["branch"],
        "published": d["published"],
        "created": d["created"],
        "trigger": {
            "type": d["trigger_type"],
            "id": d["trigger_id"],
            "referent_update": d["trigger_referent_update"],
            "priority": d["trigger_priority"],
            "app_name": d["trigger_app_name"],
        },
        "body": json.loads(d["body"]),
    }
    return json.dumps(doc, sort_keys=True)


def encode_records(
    spill_every: int = 5, expire_every: int = 10
) -> tuple[list[tuple[str, int, bytes]], dict[str, bytes]]:
    """Wire-encode the fixture as Kinesis-shaped records (guide:17-19,32).

    Every `spill_every`-th record's data is a gzipped pre-signed-URL pointer
    instead of the payload (the forced random S3 spill, guide:17); every
    `expire_every`-th of those is 'expired' — absent from the returned S3
    store, so a fetch fails and decode must yield NULL (guide:36-39).

    Returns (records, s3_store): records = (shard_id, sequence_number, data);
    sequence numbers are Kinesis-shaped 56-digit decimal strings (wire_seq);
    s3_store maps URL → gzipped payload bytes.
    """
    records: list[tuple[str, str, bytes]] = []
    s3_store: dict[str, bytes] = {}
    for i, row in enumerate(CONTENT_OPS):
        body = payload_json(row).encode("utf-8")
        shard = f"shard-{i % 2}"
        if (i + 1) % spill_every == 0:
            url = f"https://example-bucket.s3.test/ops/{row[0]}?sig=deadbeef"
            if (i + 1) % expire_every != 0:
                s3_store[url] = gzip.compress(body)
            records.append((shard, wire_seq(i), gzip.compress(url.encode("utf-8"))))
        else:
            records.append((shard, wire_seq(i), gzip.compress(body)))
    # a few malformed records: wrong envelope type (guide:62-64) + junk bytes
    records.append(
        ("shard-0", wire_seq(len(CONTENT_OPS)),
         gzip.compress(json.dumps({"type": "not-content-operation"}).encode())),
    )
    records.append(("shard-1", wire_seq(len(CONTENT_OPS) + 1), b"\x00not-gzip"))
    return records, s3_store


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.StringType()),
        # string, NOT long: real Kinesis sequence numbers are ~56-digit
        # decimals that overflow int64 (cast would NULL / throw under ANSI)
        T.StructField("sequence_number", T.StringType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def kinesis_records_df(spark: SparkSession, **kw) -> tuple[DataFrame, dict[str, bytes]]:
    """The wire-form fixture as a DataFrame of raw records + its S3 store."""
    records, s3_store = encode_records(**kw)
    return spark.createDataFrame(records, RECORD_SCHEMA), s3_store
