"""Multimodal column handling: opaque binary media + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched `mapInPandas`
stages (SURVEY.md §2B "multimodal column handling").

The container has no image/audio codecs, so the *codec call* is stubbed:
`decode_image_real` raises NotImplementedError, and the pipeline falls back
to a deterministic byte-level featurizer. Everything around the stub — the
media schema, the binary column, Arrow batch shapes, the mapInPandas
signatures, partition behavior — is real and tested; swapping in PIL/ffmpeg
later changes one function body, not the plan.

Scale posture: media bytes never shuffle. Feature extraction is map-only
(mapInPandas preserves partitioning, no exchange); only the small extracted
feature rows flow into joins/aggs downstream. At 100 TB keep blobs in their
own parquet column so column pruning skips them unless a decode stage runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# typed metadata travels beside the opaque payload — never inside it
MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<mime: string, declared_bytes: bigint>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, content_md5 string, "
    "width int, height int, decoder string"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_off bigint, frame_md5 string"


def decode_image_real(data: bytes) -> tuple[int, int]:
    """Real codec entry point — STUB. The container ships no imaging libs;
    production swaps this body for PIL/libvips and nothing else changes."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "pipeline uses the deterministic byte-level featurizer"
    )


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions (pure function of
    payload size, reproducible in any engine)."""
    return (n_bytes % 640 + 1, n_bytes % 480 + 1)


def attach_media(docs: DataFrame) -> DataFrame:
    """Turn `documents` into a media table: utf-8 text bytes act as the
    opaque payload, with typed metadata assembled alongside."""
    # spread the corpus before the Python featurize stages: one input file
    # would otherwise pin every mapInPandas worker onto a single task
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit("image/x-fixture").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("bigint").alias("declared_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Tries the
    real codec once per batch; on NotImplementedError degrades to the
    deterministic featurizer for the whole batch (mirrors the reference's
    error→null/degrade posture, guide:36-39)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for media_id, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                raw = bytes(data)
                try:
                    width, height = decode_image_real(raw)
                    decoder = "codec"
                except NotImplementedError:
                    width, height = _fake_dims(len(raw))
                    decoder = "fake"
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": len(raw),
                        "content_md5": hashlib.md5(raw).hexdigest(),
                        "width": width,
                        "height": height,
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame(out, columns=[f.split()[0] for f in FEATURE_SCHEMA.split(", ")])

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 64) -> DataFrame:
    """Frame sampling for video-shaped payloads: emit one row per `stride`
    bytes (stand-in for one frame per N ms), each with its offset and a
    content hash of the frame window. One-to-many mapInPandas — the UDTF
    shape — so downstream per-frame ops are ordinary rows."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data)
                for idx, off in enumerate(range(0, len(raw), stride)):
                    window = raw[off : off + stride]
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_off": off,
                            "frame_md5": hashlib.md5(window).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_off", "frame_md5"])

    return media.mapInPandas(sampler, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<mime: string, declared_bytes: bigint>, "
    "width int, height int, resized_md5 string"
)


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 48) -> DataFrame:
    """Resize stage: map each payload to a fixed target size. The real
    codec path (decode → scale → re-encode) is stubbed like
    `decode_image_real`; the deterministic fallback samples every k-th
    byte so output size is exactly target_w×target_h — which keeps the
    Spark-side contract (fixed-size binary out, metadata updated, map-only,
    no shuffle) fully exercised and testable."""

    def resizer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        n_out = target_w * target_h
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = bytes(row.data)
                try:
                    decode_image_real(raw)  # would be decode→scale→encode
                    raise AssertionError("codec path unavailable here")
                except NotImplementedError:
                    if len(raw) >= n_out:
                        step = len(raw) / n_out
                        resized = bytes(raw[int(i * step)] for i in range(n_out))
                    else:  # pad by cycling
                        resized = (raw * (n_out // max(len(raw), 1) + 1))[:n_out]
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "data": resized,
                        "meta": row.meta,
                        "width": target_w,
                        "height": target_h,
                        "resized_md5": hashlib.md5(resized).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "data", "meta", "width", "height", "resized_md5"],
            )

    return media.mapInPandas(resizer, schema=RESIZE_SCHEMA)


TILE_SCHEMA = (
    "media_id bigint, tile_row int, tile_col int, tile_off bigint, "
    "tile_len int, tile_sha string"
)


def tile_grid(media: DataFrame, grid: int = 4) -> DataFrame:
    """ViT-style patch fan-out: split each payload into a grid×grid byte
    grid (row-major equal slices; the codec seam means real images would
    tile pixel blocks — same plumbing, different slicer) and emit one row
    per tile with its offset, length, and sha256 — Arrow-batched
    mapInPandas, map-only (blobs never shuffle; only tile digests leave
    the stage). Tiles of an L-byte payload: row-major index t in
    [0, grid²), byte range [t·L∕g², (t+1)·L∕g²) with integer boundaries
    (t·L div g²) — exactly reproducible in SQL for the oracle."""

    def tiler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        g2 = grid * grid
        for pdf in batches:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                L = len(b)
                for t in range(g2):
                    lo, hi = t * L // g2, (t + 1) * L // g2
                    rows.append(
                        {
                            "media_id": media_id,
                            "tile_row": t // grid,
                            "tile_col": t % grid,
                            "tile_off": lo,
                            "tile_len": hi - lo,
                            "tile_sha": hashlib.sha256(b[lo:hi]).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "tile_row",
                    "tile_col",
                    "tile_off",
                    "tile_len",
                    "tile_sha",
                ],
            )

    return media.mapInPandas(tiler, schema=TILE_SCHEMA)


ENERGY_SCHEMA = "media_id bigint, frame_idx int, energy bigint"


def frame_energy(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Arrow-batched per-frame energy over the binary payload — the
    audio-decode edge of the VAD pipeline (q277). Each full `frame_len`-
    byte window yields one integer energy (sum of byte values): a pure
    function of the blob, computable in SQL over the fixture's utf-8
    payloads, which is what makes the Python stage oracle-checkable.
    Map-only: blobs never shuffle; one output row per frame."""

    def energize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                buf = bytes(data)
                for i in range(len(buf) // frame_len):
                    frame = buf[i * frame_len : (i + 1) * frame_len]
                    out.append((int(mid), i, int(sum(frame))))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "energy"]
            )

    return media.select("media_id", "data").mapInPandas(
        energize, schema=ENERGY_SCHEMA
    )
