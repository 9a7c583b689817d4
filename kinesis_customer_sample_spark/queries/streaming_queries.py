"""Streaming operator queries (SURVEY.md §2B "Streaming-only").

q51/q52/q57 genuinely execute Structured Streaming micro-batches inside the
query function (file-source replay → availableNow → memory sink) and return
the final table — so the driver's DuckDB oracle checks the *streaming*
result against an independent batch derivation: stream/batch equivalence as
a first-class correctness gate, not just a unit test.

q53/q56 are the batch twins of session windows and exact publish detection
(same code paths the streaming variants share), oracle-checked directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.fixtures import content_ops_values_sql
from kinesis_customer_sample_spark.queries.content_ops import _ops
from kinesis_customer_sample_spark.registry import query
from kinesis_customer_sample_spark.streaming.replay import events_stream, run_to_completion


@query(
    "q51_stream_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 2)
             AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark (R14 streaming
    form, guide:3): executed as a real micro-batch stream, oracle-checked
    against DuckDB's batch time_bucket — stream/batch equivalence."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")) / 1_000_000.0,
                2,
            ).alias("total_value"),
        )
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "q52_stream_sliding_window",
    oracle="""
    SELECT wstart AS window_start, count(*) AS n
    FROM (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS wstart
      FROM events
    ) t
    GROUP BY wstart
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in two
    overlapping windows; oracle derives the same assignment set-theoretically."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(F.col("window.start").alias("window_start"), "n")


@query(
    "q53_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)                       AS session_start,
           max(ts) + INTERVAL 30 MINUTE  AS session_end,
           count(*)                      AS n_events
    FROM sessions
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "session"),
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via the native session_window
    operator; the oracle recomputes sessions with gaps-and-islands SQL.
    Batch form here; tests assert the streaming variant agrees."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q56_contentops_publish_exact",
    oracle=f"""
    WITH content_ops AS (SELECT * FROM {content_ops_values_sql()}),
    pub AS (
      SELECT op_id, organization_id, id, branch, operation,
             strptime(date, '%Y-%m-%dT%H:%M:%SZ') AS event_time,
             lag(operation) OVER (
               PARTITION BY organization_id, id, branch
               ORDER BY op_id) AS prev_op
      FROM content_ops WHERE published
    )
    SELECT op_id, organization_id, id, branch, event_time,
           CASE WHEN operation LIKE 'insert-%' THEN 'publish'
                ELSE 'unpublish' END AS kind
    FROM pub
    WHERE (operation LIKE 'insert-%' AND (prev_op IS NULL OR prev_op LIKE 'delete-%'))
       OR (operation LIKE 'delete-%' AND prev_op LIKE 'insert-%')
    """,
    tags=("contentops", "publish-detection", "stateful"),
)
def contentops_publish_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 exact (stateful) publish detection, batch form: liveness
    transitions via lag over the per-key published stream (guide:141-145).
    Differs from the q48 proxy on replace-inserts after deletes and double
    deletes; the streaming applyInPandasWithState twin is asserted equal in
    tests/test_streaming.py.

    Ordered by arrival sequence (op_id ≈ shard sequence number, guide:13),
    not event time: the consumer's state machine sees records in shard
    order, so a late ingestion-priority record transitions state when it
    arrives — matching the streaming operator exactly."""
    ops = _ops(spark).filter(F.col("published"))
    w = W.partitionBy("organization_id", "id", "branch").orderBy("op_id")
    prev_op = F.lag("operation").over(w)
    is_insert = F.col("operation").startswith("insert-")
    is_delete = F.col("operation").startswith("delete-")
    return (
        ops.withColumn("prev_op", prev_op)
        .filter(
            (is_insert & (F.col("prev_op").isNull() | F.col("prev_op").startswith("delete-")))
            | (is_delete & F.col("prev_op").startswith("insert-"))
        )
        .select(
            "op_id",
            "organization_id",
            "id",
            "branch",
            "event_time",
            F.when(is_insert, "publish").otherwise("unpublish").alias("kind"),
        )
    )


@query(
    "q57_stream_static_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 2)
             AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch), then aggregated —
    executed as a real stream, oracle-checked against the batch join."""
    ev = events_stream(spark, sf_dir)
    cust = F.broadcast(table(spark, sf_dir, "customer"))
    joined = ev.join(cust, ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")) / 1_000_000.0, 2
        ).alias("total_value"),
    )
    return run_to_completion(agg, output_mode="complete")


@query(
    "q150_stream_corpus_ingest",
    oracle="""
    SELECT doc_id, source, n_chars,
           sha256(lower(trim(text))) AS content_hash,
           (n_chars BETWEEN 200 AND 2000) AS keep
    FROM documents
    """,
    tags=("streaming", "curation", "ingest", "dedup"),
)
def stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingest — the curation pipeline's front door as a
    real micro-batch stream: crawl shards arrive as files, every record
    is delivered at-least-once (the stream unioned with a second replay
    of itself), `dropDuplicates` on doc_id restores exactly-once, and the
    ingest map computes the content hash (the exact-dedup key the batch
    pipeline groups on later) plus a length quality gate — all map-side,
    so each micro-batch does scan-shaped work. The dedup state is keyed
    by doc_id over a finite availableNow replay; the production unbounded
    form attaches an ingest-time watermark and
    dropDuplicatesWithinWatermark, exactly as q117 demonstrates on
    events. Oracle: the batch documents table with the same hash + gate —
    stream/batch equivalence, hash-checked."""
    from kinesis_customer_sample_spark.streaming.replay import (
        documents_stream,
        run_to_completion,
    )

    d1 = documents_stream(spark, sf_dir)
    d2 = documents_stream(spark, sf_dir)
    ingested = (
        d1.unionByName(d2)
        .dropDuplicates(["doc_id"])
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.sha2(F.lower(F.trim("text")), 256).alias("content_hash"),
            F.col("n_chars").between(200, 2000).alias("keep"),
        )
    )
    return run_to_completion(ingested, output_mode="append")


@query(
    "q170_dynamic_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             ts + CASE WHEN event_type = 'error'
                       THEN INTERVAL 5 MINUTE ELSE INTERVAL 30 MINUTE END
               AS ev_end
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, ev_end,
             CASE WHEN max(ev_end) OVER wprev IS NULL
                    OR ts > max(ev_end) OVER wprev
                  THEN 1 ELSE 0 END AS new_sess
      FROM g
      WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    sessions AS (
      SELECT user_id, ts, ev_end,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, ev_end
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts)          AS session_start,
           max(ev_end)      AS session_end,
           count(*)::BIGINT AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    tags=("streaming", "session", "dynamic-gap"),
)
def dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows (Spark 3.2+): the session gap is an
    EXPRESSION over each event — error events close their session after
    5 minutes, normal activity after 30 — the per-event-type timeout
    shape static gaps can't express. The oracle generalizes q53's
    gaps-and-islands to interval-union semantics: a new session starts
    when an event's start exceeds the running max of previous event ends
    (a running max, not lag — with variable gaps an earlier event can end
    LATER than a closer one). Batch form of the same operator the
    streaming engine runs incrementally; one shuffle on the session key."""
    ev = table(spark, sf_dir, "events")
    # make_interval, not an INTERVAL literal: session_window's dynamic-gap
    # argument requires CalendarIntervalType (ANSI interval literals are
    # DayTimeIntervalType and are rejected)
    gap = F.when(
        F.col("event_type") == "error", F.expr("make_interval(0, 0, 0, 0, 0, 5, 0)")
    ).otherwise(F.expr("make_interval(0, 0, 0, 0, 0, 30, 0)"))
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q213_stream_ewma_stateful",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_obs,
           round(list_reduce(
             list_prepend(0.0::DOUBLE, list(value::DOUBLE ORDER BY ts, event_id)),
             (acc, v) -> acc * 0.9 + v * 0.1), 4) AS ewma
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "timeseries"),
)
def stream_ewma_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user EWMA via `applyInPandasWithState` — the O(1)-state
    recurrence twin of q206's batch fold, executed as a real micro-batch
    stream and oracle-checked against the batch derivation (stream/batch
    equivalence as the correctness gate, like q51/q52). State per key is
    two numbers (ewma, n_obs); each batch sorts its rows by (ts, event_id)
    before folding so within-batch disorder can't change the result. The
    memory sink accumulates one update row per (key, batch); the final
    value per key is the one with the highest n_obs (monotone per batch),
    selected with max_by — with availableNow over the single-file fixture
    there is exactly one batch, and with many batches the recurrence
    carries across them unchanged. Rounding happens HERE, not in the
    worker (Python round is banker's)."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import ewma_stream

    ev = events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    updates = run_to_completion(ewma_stream(ev), output_mode="update")
    return updates.groupBy("user_id").agg(
        F.max("n_obs").alias("n_obs"),
        F.round(F.max_by("ewma", "n_obs"), 4).alias("ewma"),
    )


@query(
    "q222_stream_ohlc",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL 15 MINUTE, ts) AS bucket_start,
           first(value ORDER BY ts, event_id) AS open,
           max(value)                         AS high,
           min(value)                         AS low,
           last(value ORDER BY ts, event_id)  AS close,
           count(*)::BIGINT                   AS n_obs
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "timeseries", "resample"),
)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bars — q205's downsampler as a real micro-batch
    stream: windowed min_by/max_by/min/max aggregation under a watermark,
    complete-mode memory sink, oracle-checked against the batch ordered-
    aggregate derivation (stream/batch equivalence, the q51/q52 gate).
    The aggregation state per (window, event_type) is the same four
    numbers as the batch partial agg, so a billion-tick bucket still
    holds constant state in the store."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )

    ev = events_stream(spark, sf_dir)
    key = F.struct("ts", "event_id")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        "event_type",
        F.col("window.start").cast("timestamp_ntz").alias("bucket_start"),
        "open",
        "high",
        "low",
        "close",
        "n_obs",
    )


@query(
    "q233_contentops_streaming_e2e",
    oracle=f"""
    WITH content_ops AS (SELECT * FROM {content_ops_values_sql()}),
    survived AS (
      -- the wire replay loses exactly the expired S3-pointer record:
      -- every 5th record spills to a pointer, every 10th of ALL records
      -- is the expired one (encode_records(spill_every=5, expire_every=10)
      -- with sequential op_ids), so op_id % 10 == 0 never decodes
      SELECT * FROM content_ops WHERE op_id % 10 != 0
    ),
    pub AS (
      SELECT op_id, organization_id, id, branch, operation,
             epoch_us(strptime(date, '%Y-%m-%dT%H:%M:%SZ'))::BIGINT AS event_us,
             lag(operation) OVER (
               PARTITION BY organization_id, id, branch
               ORDER BY op_id) AS prev_op
      FROM survived WHERE published
    )
    SELECT organization_id, id, branch, event_us,
           CASE WHEN operation LIKE 'insert-%' THEN 'publish'
                ELSE 'unpublish' END AS kind
    FROM pub
    WHERE (operation LIKE 'insert-%' AND (prev_op IS NULL OR prev_op LIKE 'delete-%'))
       OR (operation LIKE 'delete-%' AND prev_op LIKE 'insert-%')
    """,
    tags=("contentops", "streaming", "e2e", "stateful"),
)
def contentops_streaming_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline END-TO-END as one real stream (guide:3's
    third use case, wire to analytics): gzip wire records (with S3-pointer
    spills, one expired) are replayed as a file-source micro-batch stream,
    decoded by the production pandas-UDF chain (R2-R6: gunzip → pointer
    deref against the fake store → error→NULL → envelope validation),
    then run through the EXACT stateful publish detector
    (applyInPandasWithState, R11) — and the emitted publish/unpublish
    events are oracle-checked against the fixture's closed-form
    derivation, which must account for the decode-dropped record (the
    expired pointer, op_id % 10 == 0; q204's accounting states the drop
    set, this query proves the state machine runs correctly on the
    SURVIVING sequence). Composes q46 + q56 + q204's guarantees into one
    driver-checked streaming row."""
    import os
    import tempfile

    from kinesis_customer_sample_spark.fixtures import RECORD_SCHEMA, kinesis_records_df
    from kinesis_customer_sample_spark.sources.decode import decode_records
    from kinesis_customer_sample_spark.streaming.replay import run_to_completion
    from kinesis_customer_sample_spark.streaming.stateful import publish_events_stream

    records, s3_store = kinesis_records_df(spark)
    td = tempfile.mkdtemp(prefix="kcss_wire_stream_")
    records.coalesce(1).write.mode("overwrite").parquet(td)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(td)
    decoded = decode_records(stream, fetch=s3_store.__getitem__)
    events = publish_events_stream(decoded)
    out = run_to_completion(events, output_mode="append")
    return out.select("organization_id", "id", "branch", "event_us", "kind")


@query(
    "q245_stream_session_timeout",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)                       AS session_start,
           max(ts) + INTERVAL 30 MINUTE  AS session_end,
           count(*)::BIGINT              AS n_events
    FROM sessions
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "stateful", "session", "timeout"),
)
def stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization where sessions close ONLY via EventTimeTimeout —
    the applyInPandasWithState timeout API run as a real multi-batch
    stream: events replay in two time-ordered batches, then a far-future
    sentinel batch pushes the watermark so every open session's timeout
    fires (an unbounded stream's only correct way to close a session —
    the watermark must prove no more members can arrive). Sentinel
    sessions are dropped by their start time; the oracle is q53's
    gaps-and-islands derivation. Proves the timeout path end-to-end
    under the driver's gate, complementing q53 (native session_window)
    and the inline-emission test suite.

    Replay prep is fully Spark-side (write_ordered_shards): events split
    into two time-ordered arrival shards at the midpoint timestamp plus a
    per-user far-future sentinel shard — no driver-side table
    materialization (the r4-verdict q245 toPandas fix). Driver state is
    two scalar timestamps."""
    import os
    import tempfile

    from kinesis_customer_sample_spark.streaming.replay import (
        run_to_completion,
        write_ordered_shards,
    )
    from kinesis_customer_sample_spark.streaming.stateful import session_timeout_stream

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = (lo + hi) // 2
    # batches must be time-monotone (events older than the post-batch
    # watermark would be dropped as late): shard 0 = first half of the
    # time range, shard 1 = second half, shard 2 = sentinels
    real = ev.withColumn(
        "batch_id",
        F.when(F.unix_micros("ts") <= F.lit(mid), F.lit(0)).otherwise(F.lit(1)),
    )
    sentinel = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "ts", F.timestamp_micros(F.lit(hi + 365 * 86_400 * 1_000_000))
        )
        .withColumn("event_id", F.lit(-1).cast("long"))
        .withColumn("batch_id", F.lit(2))
    )
    src_dir = os.path.join(tempfile.mkdtemp(prefix="kcss_sess_timeout_"), "src")
    write_ordered_shards(real.unionByName(sentinel), src_dir, 3, "batch_id")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = run_to_completion(session_timeout_stream(stream), output_mode="append")
    return out.filter(
        F.col("session_start") <= F.timestamp_micros(F.lit(hi))
    ).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


@query(
    "q248_python_stream_source_e2e",
    oracle=f"""
    WITH content_ops AS (SELECT * FROM {content_ops_values_sql()}),
    survived AS (
      SELECT * FROM content_ops WHERE op_id % 10 != 0
    ),
    pub AS (
      SELECT op_id, organization_id, id, branch, operation,
             epoch_us(strptime(date, '%Y-%m-%dT%H:%M:%SZ'))::BIGINT AS event_us,
             lag(operation) OVER (
               PARTITION BY organization_id, id, branch
               ORDER BY op_id) AS prev_op
      FROM survived WHERE published
    )
    SELECT organization_id, id, branch, event_us,
           CASE WHEN operation LIKE 'insert-%' THEN 'publish'
                ELSE 'unpublish' END AS kind
    FROM pub
    WHERE (operation LIKE 'insert-%' AND (prev_op IS NULL OR prev_op LIKE 'delete-%'))
       OR (operation LIKE 'delete-%' AND prev_op LIKE 'insert-%')
    """,
    tags=("contentops", "streaming", "python-datasource", "e2e"),
)
def python_stream_source_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q233's wire→analytics pipeline fed by a CUSTOM PYTHON STREAMING
    DATASOURCE instead of file replay: the Kinesis double is now a real
    offset-managed connector (sources/python_stream.py — initialOffset /
    read / readBetweenOffsets / commit, checkpointable), serving the wire
    fixture in three micro-batches; decode and the exact stateful publish
    detector run downstream unchanged, and the emitted events hash-match
    the same closed-form oracle. This is R1 without the Kinesis jar: the
    connector contract itself is implemented, not just stubbed."""
    from kinesis_customer_sample_spark.fixtures import encode_records
    from kinesis_customer_sample_spark.sources.decode import decode_records
    from kinesis_customer_sample_spark.sources.python_stream import WireReplayDataSource
    from kinesis_customer_sample_spark.streaming.replay import run_until_caught_up
    from kinesis_customer_sample_spark.streaming.stateful import publish_events_stream

    _, s3_store = encode_records()
    try:
        spark.dataSource.register(WireReplayDataSource)
    except Exception:
        pass  # already registered in this session
    stream = spark.readStream.format("kcss_wire_replay").load()
    decoded = decode_records(stream, fetch=s3_store.__getitem__)
    events = publish_events_stream(decoded)
    out = run_until_caught_up(events, output_mode="append")
    return out.select("organization_id", "id", "branch", "event_us", "kind")


@query(
    "q251_stream_pit_enrichment",
    oracle="""
    WITH nonp AS (
      SELECT user_id, event_id, ts, event_type
      FROM events WHERE event_type != 'purchase'
    ),
    g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w != event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM nonp
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *, sum(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)::BIGINT AS version_seq
      FROM g
    ),
    runs AS (
      SELECT user_id, version_seq,
             min(event_type)           AS state,
             min(epoch_us(ts))::BIGINT AS valid_from_us
      FROM v GROUP BY user_id, version_seq
    ),
    hist AS (
      SELECT user_id, version_seq, state, valid_from_us,
             lead(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY version_seq) AS valid_to_us
      FROM runs
    ),
    p AS (
      SELECT user_id, event_id, epoch_us(ts)::BIGINT AS p_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           h.state        AS state_at_purchase,
           h.version_seq  AS state_version
    FROM p LEFT JOIN hist h
      ON h.user_id = p.user_id
     AND h.valid_from_us <= p.p_us
     AND (h.valid_to_us IS NULL OR p.p_us < h.valid_to_us)
    """,
    tags=("streaming", "scd2", "point-in-time", "stream-static"),
)
def stream_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension enrichment ON A STREAM: purchases replay as
    micro-batches and stream-static-join the SCD2 state history (q118's
    gaps-and-islands build, a static table) on the user key plus the
    validity-interval predicate — each fact picks the dimension version
    valid AT ITS EVENT TIME, the as-was contract q188 proves batch-side,
    here proven through the streaming join path (fan-out ≤ 1 because
    versions tile time, so append mode needs no watermark on the static
    side). The canonical stream-enrichment shape: static dim broadcast
    per micro-batch, stream side never buffered."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )

    ev = table(spark, sf_dir, "events")
    nonp = ev.filter(F.col("event_type") != "purchase")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = nonp.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("event_type").over(wseq).isNull()
            | (F.lag("event_type").over(wseq) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_change"),
    )
    v = g.withColumn(
        "version_seq",
        F.sum("is_change").over(wseq.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    runs = v.groupBy("user_id", "version_seq").agg(
        F.min("event_type").alias("state"),
        F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).cast("long").alias("valid_from_us"),
    )
    wver = W.partitionBy("user_id").orderBy("version_seq")
    hist = runs.withColumn("valid_to_us", F.lead("valid_from_us").over(wver)).select(
        F.col("user_id").alias("h_user_id"), "version_seq", "state", "valid_from_us", "valid_to_us"
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").cast("long").alias("p_us"),
        )
    )
    joined = purchases.join(
        hist,
        (F.col("h_user_id") == F.col("user_id"))
        & (F.col("valid_from_us") <= F.col("p_us"))
        & (F.col("valid_to_us").isNull() | (F.col("p_us") < F.col("valid_to_us"))),
        "left",
    )
    out = run_to_completion(
        joined.select(
            "event_id",
            "user_id",
            F.col("state").alias("state_at_purchase"),
            F.col("version_seq").alias("state_version"),
        ),
        output_mode="append",
    )
    return out


@query(
    "q254_stream_chained_aggs",
    oracle="""
    WITH minutely AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS m_start,
             event_type,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 HOUR, m_start) AS h_start,
           event_type,
           max(n)::BIGINT   AS peak_10min,
           sum(n)::BIGINT   AS total,
           count(*)::BIGINT AS n_buckets
    FROM minutely GROUP BY 1, 2
    """,
    tags=("streaming", "chained-aggregation", "window"),
)
def stream_chained_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful aggregations chained in ONE streaming query (the
    multiple-stateful-operators capability, Spark 3.4+): 10-minute
    windowed counts feed an hourly rollup computing the peak 10-minute
    burst per hour — the burst-detection shape that previously needed two
    jobs and an intermediate sink. Both operators share the event-time
    watermark; the second agg windows over the first's window-start.
    Oracle = the batch two-level rollup; stream == batch through BOTH
    state stores. Chained stateful operators REQUIRE append mode
    (finalized-on-watermark emission), so a far-future sentinel event
    pushes the watermark past every real window at end of replay (the
    q245 pattern) and sentinel windows are filtered by start time.

    Replay prep is fully Spark-side (write_ordered_shards): all real
    events in arrival shard 0, then one single-row sentinel shard per
    chained stateful level (+1 to flush the final level — the watermark
    for batch N comes from data through N-1). No driver-side table
    materialization (the r4-verdict q254 toPandas fix); driver state is
    one scalar timestamp."""
    import os
    import tempfile

    from kinesis_customer_sample_spark.streaming.replay import (
        run_to_completion,
        write_ordered_shards,
    )

    ev_b = table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    hi = ev_b.agg(F.max(F.unix_micros("ts"))).first()[0]
    real = ev_b.withColumn("batch_id", F.lit(0))
    sentinels = spark.range(1, 4).select(
        F.timestamp_micros(
            F.lit(hi) + F.col("id") * F.lit(3 * 86_400 * 1_000_000)
        ).alias("ts"),
        F.lit("click").alias("event_type"),
        F.col("id").cast("int").alias("batch_id"),
    )
    src_dir = os.path.join(tempfile.mkdtemp(prefix="kcss_chain_aggs_"), "src")
    write_ordered_shards(real.unionByName(sentinels), src_dir, 4, "batch_id")
    ev = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    minutely = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = (
        # chain via window_time() over the PRESERVED window struct — the
        # only column form that carries the event-time watermark into the
        # second stateful operator (selecting window.start strips it)
        minutely.groupBy(
            F.window(F.window_time("window"), "1 hour"), "event_type"
        )
        .agg(
            F.max("n").alias("peak_10min"),
            F.sum("n").alias("total"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("h_start"),
            "event_type",
            "peak_10min",
            "total",
            "n_buckets",
        )
    )
    out = run_to_completion(hourly, output_mode="append")
    return out.filter(
        F.col("h_start") <= F.timestamp_micros(F.lit(hi)).cast("timestamp_ntz")
    )


_HH_SHARDS = 8
_HH_TOPK = 20


@query(
    "q267_stream_heavy_hitters",
    oracle=f"""
    SELECT user_id, count(*)::BIGINT AS cnt, 0::BIGINT AS err
    FROM events
    GROUP BY user_id
    ORDER BY cnt DESC, user_id
    LIMIT {_HH_TOPK}
    """,
    tags=("streaming", "stateful", "sketch", "heavy-hitters"),
)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k heavy hitters via sharded SPACE-SAVING summaries
    (applyInPandasWithState): each of 8 shards keeps at most 1024
    (user, count, err) counters — O(shards × capacity) state total no
    matter how long the stream runs, the property that makes frequency
    tracking feasible on an unbounded 100 TB stream where per-key counting
    state would grow with the keyspace. Shard summaries merge trivially
    (each key lives in exactly one shard) and the final top-20 is a
    TakeOrderedAndProject over ≤ 8×1024 rows. In the fixture regime
    (distinct users per shard < capacity) the sketch is provably exact —
    every err is 0 and the oracle is the batch GROUP BY — while the
    eviction path (counts inherit the evicted minimum as err) is
    exercised by a small-capacity unit test. Capacity bounds exactness up
    to ~8k distinct users (≈ sf0.5); past that the operator stays correct
    as a sketch (count ≤ true + err), which is its production contract."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import heavy_hitters_stream

    ev = events_stream(spark, sf_dir).select(
        (F.col("user_id") % _HH_SHARDS).alias("shard"), "user_id"
    )
    updates = run_to_completion(heavy_hitters_stream(ev), output_mode="update")
    # latest summary row per (shard, user): counts are monotone per batch
    final = updates.groupBy("shard", "user_id").agg(
        F.max("cnt").alias("cnt"), F.max_by("err", "cnt").alias("err")
    )
    return (
        final.select("user_id", "cnt", "err")
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_HH_TOPK)
    )


# importing the module registers q262 (no import cycle: alerting_ops does
# not import streaming_queries)
from kinesis_customer_sample_spark.queries import alerting_ops as _alerting  # noqa: E402,F401
from kinesis_customer_sample_spark.registry import REGISTRY as _REG_SO_FAR

_Q262_ORACLE = _REG_SO_FAR["q262_hysteresis_alert_state"].oracle


@query(
    "q276_stream_hysteresis_alerts",
    oracle=_Q262_ORACLE,
    tags=("streaming", "stateful", "alerting", "state-machine"),
)
def stream_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q262's hysteresis alerting as a REAL stateful stream: per-key
    applyInPandasWithState carries the cumulative hourly rollup (never raw
    rows) and re-runs the two-threshold fold over it each micro-batch —
    the natural sequential form of the state machine, where the batch twin
    uses the declarative last-crossing window. The oracle IS q262's
    oracle, so the driver hash-checks that the sequential fold and the
    window trick agree timeline-for-timeline (stream/batch equivalence
    for alerting). State per key is O(hours observed) pairs of integers —
    bounded by the retention window in production, and the reason the fn
    re-aggregates before storing. Late rows land in their hour's partial
    and correctly flip any downstream crossings on the next emit."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import (
        hysteresis_alert_stream,
    )

    ev = events_stream(spark, sf_dir).select("event_type", "ts", "value")
    updates = run_to_completion(hysteresis_alert_stream(ev), output_mode="update")
    latest = updates.withColumn(
        "max_b", F.max("batch_no").over(W.partitionBy("event_type"))
    ).filter(F.col("batch_no") == F.col("max_b"))
    return latest.select(
        "event_type",
        F.timestamp_seconds(F.col("hour_epoch") * 3600)
        .cast("timestamp_ntz")
        .alias("hour"),
        F.round(F.col("sum_cents").cast("double") / F.col("n") / 100, 6).alias(
            "mean_value"
        ),
        "alert_on",
        "is_transition",
    )


_KMVS_K = 32
_KMVS_P = 1_000_000_007
from kinesis_customer_sample_spark.functions import tok_hash_expr as _tok_hash  # noqa: E402

_KMVS_DUCK_H = (
    f"(({_tok_hash('''Q280KEY''', dialect='duckdb')}) * 2654435761 % {_KMVS_P})"
).replace("Q280KEY", "'kmvu-' || user_id::VARCHAR")
_KMVS_SPARK_H = (
    f"(({_tok_hash('''Q280KEY''', dialect='spark')}) * 2654435761 % {_KMVS_P})"
).replace("Q280KEY", "'kmvu-' || CAST(user_id AS STRING)")


@query(
    "q280_stream_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT ts::DATE AS day, {_KMVS_DUCK_H} AS h FROM events
    ),
    r AS (
      SELECT day, h,
             row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY day) AS nd
      FROM h
    )
    SELECT day,
           least(any_value(nd), {_KMVS_K})::BIGINT AS sketch_size,
           round(CASE WHEN any_value(nd) < {_KMVS_K} THEN any_value(nd)::DOUBLE
                 ELSE ({_KMVS_K} - 1) * {_KMVS_P}::DOUBLE
                      / min(CASE WHEN rn = {_KMVS_K} THEN h END) END, 3)
             AS est_distinct
    FROM r GROUP BY day
    """,
    tags=("streaming", "stateful", "sketch", "kmv"),
)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user KMV sketches maintained IN STREAM STATE: the
    per-day state is the k-min distinct-hash set itself — merging a
    micro-batch is set-union + re-truncate, the same associative merge
    q271 proves shard-invariant, so the streaming sketch's CONTENTS (and
    therefore its estimate) are bit-identical to the batch sketch the
    oracle computes. This is the sketch-in-state pattern that gives an
    unbounded stream O(k) distinct-counting state per key where exact
    counting state grows with the keyspace; unlike q267's counters it
    answers CARDINALITY, and unlike HLL (q191) its stream/batch equality
    is hash-checkable, not rows-only. Element hashes are computed
    JVM-side before the stateful op (the worker only set-unions
    integers); the estimator and its rounding run JVM-side after. Days
    with fewer than k distinct users report exactly (sketch not full ⇒
    estimate = true count)."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import kmv_sketch_stream

    ev = events_stream(spark, sf_dir).select(
        F.col("ts").cast("date").alias("day"), F.expr(_KMVS_SPARK_H).alias("h")
    )
    updates = run_to_completion(kmv_sketch_stream(ev), output_mode="update")
    latest = updates.withColumn(
        "max_b", F.max("batch_no").over(W.partitionBy("day"))
    ).filter(F.col("batch_no") == F.col("max_b"))
    return latest.select(
        "day",
        F.col("sketch_size").cast("bigint").alias("sketch_size"),
        F.round(
            F.when(
                F.col("sketch_size") < _KMVS_K,
                F.col("sketch_size").cast("double"),
            ).otherwise(
                F.lit((_KMVS_K - 1) * float(_KMVS_P)) / F.col("kth_hash")
            ),
            3,
        ).alias("est_distinct"),
    )


_ROUTER_PRED = "value >= 1.0"


@query(
    "q285_stream_split_router",
    oracle=f"""
    SELECT CASE WHEN {_ROUTER_PRED} THEN 'valid' ELSE 'quarantine' END AS route,
           count(*)::BIGINT AS n_events,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "sink", "router", "exactly-once"),
)
def stream_split_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ROUTER: one stream fans out to two sinks (valid /
    quarantine, split on a predicate) with a SINGLE atomic manifest
    commit covering both — the transactional multi-table publish a
    valid/dead-letter splitter needs, because committing the two halves
    independently lets a crash between them surface an epoch where
    records exist in neither or both. Readers consult manifests only;
    a retried epoch (manifest absent) rewrites both directories then
    re-publishes, so the read-back is exactly-once per record across
    BOTH sinks (retry-idempotence unit-tested in tests/test_streaming).
    The oracle tags each event with its route in batch — equality proves
    no record was lost, duplicated, or mis-routed through the split."""
    import os
    import shutil
    import tempfile

    from kinesis_customer_sample_spark.streaming.replay import events_stream
    from kinesis_customer_sample_spark.streaming.sinks import (
        foreach_batch_split_router,
        read_routed,
    )

    # Stable scratch path: Python's str hash is salted per process, so
    # hash(sf_dir) would mint a fresh /tmp dir every run and leak the old
    # ones (each run cleans only its own path). md5 is run-stable, so reruns
    # reuse — and first rmtree — the same directory (q268's zone-map layout
    # uses the same convention).
    import hashlib

    sf_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"kcss_router_{sf_tag}")
    shutil.rmtree(base, ignore_errors=True)
    ckpt = os.path.join(base, "_ckpt")
    ev = events_stream(spark, sf_dir)
    q = (
        ev.writeStream.foreachBatch(foreach_batch_split_router(base, _ROUTER_PRED))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    routed = read_routed(spark, base)
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


@query(
    "q324_stream_dedup_within_watermark",
    oracle="""
    SELECT event_type,
           count(DISTINCT event_id)::BIGINT AS n_unique,
           min(event_id)::BIGINT            AS min_event_id,
           max(event_id)::BIGINT            AS max_event_id
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "dedup", "watermark", "exactly-once"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicatesWithinWatermark` (Spark 3.5+) — the at-least-once →
    effectively-once repair operator: the replay feeds every event TWICE
    (two arrival shards carrying the same rows — the duplicate delivery a
    Kinesis consumer sees after a shard reader restart, guide:13), and
    the stream-side dedup keyed on event_id drops the second copy while
    expiring its state by watermark — unlike plain dropDuplicates, whose
    key state grows forever on an unbounded stream. The deduped stream
    then rolls up per event type in batch; the oracle aggregates the
    ORIGINAL (unduplicated) table, so the hash match proves every
    duplicate died in-stream and no original was lost.

    Scale posture (100 TB): state is one entry per key within the
    watermark horizon — bounded by arrival rate × delay, not stream
    length; the dedup shuffle is keyed on event_id (uniform), and the
    downstream rollup reuses the standard agg shape. Replay prep is
    Spark-side (write_ordered_shards, q245 convention)."""
    import os
    import tempfile

    from kinesis_customer_sample_spark.streaming.replay import (
        run_to_completion,
        write_ordered_shards,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    doubled = ev.withColumn("batch_id", F.lit(0)).unionByName(
        ev.withColumn("batch_id", F.lit(1))  # the duplicate delivery
    )
    src_dir = os.path.join(tempfile.mkdtemp(prefix="kcss_dedup_wm_"), "src")
    write_ordered_shards(doubled, src_dir, 2, "batch_id")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_completion(deduped, output_mode="append")
    # plain count(*) vs the oracle's count(DISTINCT): a duplicate that
    # survived the stream-side dedup would inflate the row count and
    # hash-mismatch — a batch countDistinct here would mask exactly the
    # failure this query exists to prove absent
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.min("event_id").cast("bigint").alias("min_event_id"),
        F.max("event_id").cast("bigint").alias("max_event_id"),
    )


def _sprt_oracle() -> str:
    from kinesis_customer_sample_spark.queries.stats_tests import SPRT_ORACLE

    return SPRT_ORACLE


@query(
    "q339_stream_sprt_sequential",
    oracle=None,  # set below — shares q317's oracle text verbatim
    tags=("streaming", "stateful", "sprt", "sequential-test"),
)
def stream_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q317's SPRT as a REAL stream — the promise q317's docstring makes,
    kept: per-arm integer LLR walks run in `applyInPandasWithState`
    (four-integer state per arm), events replay in two time-ordered
    arrival shards (q245 Spark-side prep — global time split ⇒ per-arm
    monotone batches), and each micro-batch re-emits the arm's walk
    state in update mode. The final row per arm (max n) is formatted to
    q317's exact output contract and checked against q317's ORACLE TEXT
    VERBATIM — hash equality proves the incremental stateful walk is
    bit-identical to the batch window derivation, including the frozen
    first boundary crossing (SPRT stops sampling at the crossing; later
    data must not move the decision point).

    Scale posture: state is 4 integers per arm; the stream shuffles once
    on the arm key per batch; within-batch disorder is sorted inside the
    group function, cross-batch order is the replay contract (on a real
    bus, shard ordering per key — guide:13)."""
    import os
    import tempfile

    from kinesis_customer_sample_spark.streaming.replay import (
        run_to_completion,
        write_ordered_shards,
    )
    from kinesis_customer_sample_spark.streaming.stateful import sprt_stream

    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    mid = (lo + hi) // 2
    sharded = ev.withColumn(
        "batch_id",
        F.when(F.unix_micros("ts") <= F.lit(mid), F.lit(0)).otherwise(F.lit(1)),
    )
    src_dir = os.path.join(tempfile.mkdtemp(prefix="kcss_sprt_stream_"), "src")
    write_ordered_shards(sharded, src_dir, 2, "batch_id")
    stream = (
        spark.readStream.schema("arm long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = run_to_completion(sprt_stream(stream), output_mode="update")
    w = W.partitionBy("arm").orderBy(F.col("n").desc())
    final = (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    from kinesis_customer_sample_spark.streaming.stateful import SPRT_THR

    return final.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.when(F.col("decided_n") > 0, F.col("decided_n"))
        .otherwise(F.col("n"))
        .cast("bigint")
        .alias("n_at_decision"),
        F.when(F.col("decided_n") > 0, F.col("decided_llr"))
        .otherwise(F.col("llr_mu"))
        .cast("bigint")
        .alias("llr_mu"),
        F.when(
            (F.col("decided_n") > 0) & (F.col("decided_llr") >= SPRT_THR), "accept_h1"
        )
        .when(
            (F.col("decided_n") > 0) & (F.col("decided_llr") <= -SPRT_THR), "accept_h0"
        )
        .otherwise("continue")
        .alias("decision"),
    )


# share q317's oracle text verbatim (one definition, two engines' paths;
# set post-registration because stats_tests imports after this module)
import dataclasses as _dc  # noqa: E402

from kinesis_customer_sample_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["q339_stream_sprt_sequential"] = _dc.replace(
    _REG["q339_stream_sprt_sequential"], oracle=_sprt_oracle().strip()
)


@query(
    "q348_stream_stream_semi_join",
    oracle="""
    SELECT p.user_id,
           count(*)::BIGINT AS n_preceded,
           sum(CAST(round(p.value * 100) AS BIGINT))::BIGINT AS preceded_cents
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'view' AND c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 72 HOUR AND p.ts
      )
    GROUP BY p.user_id
    """,
    tags=("streaming", "join", "stream-stream", "left-semi"),
)
def stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI join — the existence-check member of the
    streaming-join family (q111 inner, q183 left outer): emit each
    purchase AT MOST ONCE if the same user had ≥ 1 view in the preceding
    72 h. Semi is the right tool when only the fact of a preceding event
    matters: unlike q111's inner join it never multiplies a purchase by
    its N matching views, so the output (and every downstream agg) stays
    purchase-sized. Both sides are real file-replay streams with 1 h
    watermarks; the event-time range bounds join state exactly as in
    q111. The oracle is the equivalent batch EXISTS — the driver
    hash-match proves stream/batch semi-join equivalence.

    State posture at 100 TB: keyed by user_id, expired by watermark +
    range — steady-state ≈ one 72 h view window per active user; the
    semi form additionally drops each matched purchase from state at
    first match instead of buffering for more matches."""
    ev = events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", "1 hour")
    )
    kept = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 72 HOURS"))
        & (F.col("view_ts") <= F.col("purchase_ts")),
        "left_semi",
    )
    rows = run_to_completion(kept, output_mode="append")
    return rows.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_preceded"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("preceded_cents"),
    )



@query(
    "q439_stream_histogram_quantiles",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             least(CAST(round(value * 100) AS BIGINT) // 2500, 19) AS bin
      FROM events
    ),
    cnt AS (
      SELECT event_type, bin, count(*)::BIGINT AS c FROM binned GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM cnt
    ),
    qs AS (SELECT unnest([5000, 9000, 9900]) AS p_bp),
    hit AS (
      SELECT c.event_type, q.p_bp, min(c.bin) AS qbin,
             min(c.n)::BIGINT AS n
      FROM cum c CROSS JOIN qs q
      WHERE c.cum >= (c.n * q.p_bp + 9999) // 10000
      GROUP BY 1, 2
    )
    SELECT event_type, min(n)::BIGINT AS n_obs,
           max(CASE WHEN p_bp = 5000 THEN qbin * 2500 END)::BIGINT AS p50_lo_c,
           max(CASE WHEN p_bp = 9000 THEN qbin * 2500 END)::BIGINT AS p90_lo_c,
           max(CASE WHEN p_bp = 9900 THEN qbin * 2500 END)::BIGINT AS p99_lo_c
    FROM hit GROUP BY 1
    ORDER BY event_type
    """,
    tags=("streaming", "stateful", "quantile", "sketch"),
)
def stream_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming histogram quantiles — q211's mergeable fixed-bin
    histogram carried as keyed STREAM STATE (`applyInPandasWithState`):
    per event type the state is a constant 20-bin count vector over
    value cents, each micro-batch folds its rows in by vector addition
    (associative + commutative — retry- and repartition-safe), and the
    emitted p50/p90/p99 are the bin floors at ceil(n·p) rank. The batch
    oracle derives identical quantiles from a windowed cumulative over
    the same bins — stream/batch equivalence is the correctness gate
    (the q51/q52 discipline), and the final row per key is the max-n_obs
    update.

    Scale posture: state is 20 longs per key REGARDLESS of stream
    length — the sketch property that lets a billion-event key hold
    constant store size (RocksDB-ready like every stateful op here);
    quantile extraction is O(bins) at emit time."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import (
        hist_quantile_stream,
    )

    ev = events_stream(spark, sf_dir).select("event_type", "value")
    updates = run_to_completion(hist_quantile_stream(ev), output_mode="update")
    return (
        updates.groupBy("event_type")
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max_by("p50_lo_c", "n_obs").alias("p50_lo_c"),
            F.max_by("p90_lo_c", "n_obs").alias("p90_lo_c"),
            F.max_by("p99_lo_c", "n_obs").alias("p99_lo_c"),
        )
        .orderBy("event_type")
    )


_PSI_LN6 = "CAST(floor(1000000.0 * ln(CAST({a} AS DOUBLE))) AS BIGINT)"


@query(
    "q457_stream_psi_drift",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             least(CAST(round(value * 100) AS BIGINT) // 2500, 19) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    cnt AS (
      SELECT event_type, bin,
             sum(is_ref)::BIGINT AS ref_c,
             sum(1 - is_ref)::BIGINT AS cur_c
      FROM binned GROUP BY 1, 2
    ),
    dense AS (
      SELECT t.event_type, b.bin,
             coalesce(c.ref_c, 0) + 1 AS r,
             coalesce(c.cur_c, 0) + 1 AS a
      FROM (SELECT DISTINCT event_type FROM binned) t
      CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) b
      LEFT JOIN cnt c ON c.event_type = t.event_type AND c.bin = b.bin
    ),
    tot AS (
      SELECT event_type, sum(r)::BIGINT AS rr, sum(a)::BIGINT AS aa
      FROM dense GROUP BY 1
    )
    SELECT d.event_type,
           (t.rr - 20)::BIGINT AS n_ref,
           (t.aa - 20)::BIGINT AS n_cur,
           (sum((d.a * t.rr - d.r * t.aa)
                 * ({_PSI_LN6.format(a='d.a * t.rr')}
                    - {_PSI_LN6.format(a='d.r * t.aa')}))::BIGINT
             // (t.aa * t.rr))::BIGINT AS psi_mu
    FROM dense d JOIN tot t ON t.event_type = d.event_type
    GROUP BY d.event_type, t.rr, t.aa
    ORDER BY d.event_type
    """,
    tags=("streaming", "stateful", "psi", "drift"),
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI drift monitor — q419's Population Stability Index
    carried as keyed STREAM STATE: per event type the state is a pair
    of constant 20-bin histograms (frozen reference = rows before the
    2024-01-15 boundary, current = rows after), each micro-batch folds
    in by vector addition (commutative — order-, retry- and
    repartition-safe, the q439 discipline), and PSI is computed AFTER
    the stream in Spark SQL over the final emitted vectors with the
    +1-smoothed integer micro-nat algebra — no transcendental ever
    runs in Python, so the stream and the batch oracle share the exact
    ln-of-integers terms.

    Scale posture: state is 2×20 longs per key regardless of stream
    length; the monitor pattern at 100 TB is this exact shape with the
    reference frozen by a deployment timestamp and PSI alerts read off
    each micro-batch emit."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import psi_drift_stream

    ev = events_stream(spark, sf_dir).select("event_type", "ts", "value")
    updates = run_to_completion(psi_drift_stream(ev), output_mode="update")
    final = (
        updates.withColumn("n_tot", F.col("n_ref") + F.col("n_cur"))
        .groupBy("event_type")
        .agg(
            F.max_by("ref_bins", "n_tot").alias("ref_bins"),
            F.max_by("cur_bins", "n_tot").alias("cur_bins"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
        )
    )
    ln6 = "CAST(floor(1000000.0 * ln(CAST({a} AS DOUBLE))) AS BIGINT)"
    dense = final.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.posexplode(F.arrays_zip("ref_bins", "cur_bins")).alias("bin", "z"),
    ).select(
        "event_type",
        "n_ref",
        "n_cur",
        (F.col("z.ref_bins") + 1).alias("r"),
        (F.col("z.cur_bins") + 1).alias("a"),
        (F.col("n_ref") + 20).alias("rr"),
        (F.col("n_cur") + 20).alias("aa"),
    )
    return (
        dense.groupBy("event_type", "n_ref", "n_cur", "rr", "aa")
        .agg(
            F.sum(
                F.expr(
                    f"(a * rr - r * aa) * ({ln6.format(a='a * rr')} "
                    f"- {ln6.format(a='r * aa')})"
                )
            ).alias("psi_sum")
        )
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            # exact integer µ-PSI: psi_sum/(aa·rr)/1e6 rounded 6dp WAS the
            # banned round-on-quotient shape; psi_sum div (aa·rr) is the
            # identical µ-quantity with zero float arithmetic (both terms
            # non-negative, so truncating div == floor div on both engines)
            F.expr("psi_sum div (aa * rr)").cast("bigint").alias("psi_mu"),
        )
        .orderBy("event_type")
    )
