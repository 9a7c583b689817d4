"""Structured Streaming: the reference-shaped pipeline (SURVEY.md §2A E3).

The reference is a Kinesis consumer — shards consumed in sequence, per-shard
ordering (guide:13). Here that maps to `readStream` micro-batches: the replay
module file-streams the fixture tables (tests have no Kinesis), the stateful
module carries the keyed document state (R9/R11, guide:143), and sinks apply
upserts for the CMS-sync use case (guide:3). Swapping the file source for
`format("kinesis")` is a one-line change at deploy time; everything
downstream is source-agnostic.
"""
