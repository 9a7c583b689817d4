"""Event-sequence pattern matching — round-3 wave (SURVEY.md §2B): the
MATCH_RECOGNIZE-shaped operator a clickstream pipeline needs and q132's
min/max funnel cannot express (a funnel checks *existence and order of
first occurrences*; a sequence pattern constrains the *whole ordered
string* of a user's day — e.g. "views, then clicks, then a purchase, with
no error in between").

Scale posture (100 TB): one shuffle on (user_id, day). Each group reduces
to a compact string of one-char event codes (array_sort of collected
structs → codegen transform/join — bounded by events-per-user-per-day, the
same per-key-bounded-series assumption as q206/q76), then the regex runs
once per group, JVM-side. No window, no join, no Python. For pathological
keys (bots with millions of events/day) the collect is capped upstream by
q185's group-cap sampler; the pattern verdict on a capped prefix is the
standard monitoring trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

# one char per event type: click→c, error→e, purchase→p, signup→s, view→v
_PATTERN = "v+c+[^e]*p"  # views, then clicks, then a purchase with no error between


@query(
    "q212_event_sequence_match",
    oracle=f"""
    SELECT user_id,
           ts::DATE                                     AS day,
           count(*)::BIGINT                             AS n_events,
           string_agg(substr(event_type, 1, 1), ''
                      ORDER BY ts, event_id)            AS seq,
           regexp_matches(string_agg(substr(event_type, 1, 1), ''
                      ORDER BY ts, event_id), '{_PATTERN}') AS matched
    FROM events
    GROUP BY 1, 2
    """,
    tags=("sequence", "pattern", "clickstream"),
)
def event_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day): encode the ordered event stream as a one-char-per-
    event string (deterministic (ts, event_id) order) and match the
    conversion pattern `v+c+[^e]*p` — at least one view, then at least one
    click, then a purchase with no error in between. Spark side sorts the
    collected (ts, event_id, code) structs and joins the codes; DuckDB uses
    its ordered string_agg — same string, same regex, exact match."""
    ev = table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("code"))
                )
            ),
            lambda x: x["code"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            seq.alias("seq"),
        )
        .withColumn("matched", F.col("seq").rlike(_PATTERN))
    )
