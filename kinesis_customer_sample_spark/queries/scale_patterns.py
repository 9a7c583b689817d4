"""Scale-pattern operators: Variant semi-structured access (the Spark 4
upgrade path for the reference's open-ended ANS `body`, SURVEY.md §1.3) and
explicit two-stage salted aggregation for skewed keys (SURVEY.md §4.2 —
AQE handles skewed *joins*; pre-shuffle salting is the standing pattern for
skewed high-cardinality aggregation input)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.functions import duck_fixed_sum, fixed_sum
from kinesis_customer_sample_spark.registry import query


@query(
    "q85_variant_json",
    oracle="""
    SELECT event_type,
           count(*)                                    AS n,
           -- ::BIGINT: sum(INT) is HUGEINT → float64 (driver hash trap)
           sum(json_extract(props, '$.k')::INT)::BIGINT AS k_sum,
           max(json_extract(props, '$.k')::INT)        AS k_max,
           count(json_extract(props, '$.missing'))     AS n_missing
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "variant"),
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through VariantType (Spark 4): parse the JSON
    column once into a variant, extract typed paths with variant_get.
    Variant keeps a binary-encoded tree — repeated path access avoids
    re-parsing the string per extraction, the upgrade path for the
    reference's unbounded ANS `body` documents (guide:112-114) where a 100
    TB scan cannot afford string re-parsing per projected field. Missing
    paths yield NULL via try_variant_get (the R4 error→null posture)."""
    ev = table(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("variant_get(v, '$.k', 'int')")).alias("k_sum"),
        F.max(F.expr("variant_get(v, '$.k', 'int')")).alias("k_max"),
        F.count(F.expr("try_variant_get(v, '$.missing', 'string')")).alias("n_missing"),
    )


_N_SALTS = 16


@query(
    "q86_salted_skew_agg",
    oracle=f"""
    SELECT event_type,
           count(*)               AS n,
           {duck_fixed_sum("value", scale=6)}   AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "salting", "aggregation"),
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups by (key, salt) — the
    hot key's rows spread over 16 reducers — stage 2 merges the partials by
    key. `event_type` has cardinality 5 over millions of rows, the classic
    skewed-agg shape. Results are provably identical to the direct group-by
    (the oracle IS the direct group-by); count/sum decompose losslessly.
    Note Spark's own partial aggregation already covers this case when the
    map side can combine — explicit salting is for when stage-1 state per
    key is too big to combine map-side (e.g. distinct sets), and this query
    is the pattern's executable documentation."""
    ev = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS))
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        # integer micro-unit partials: the two-stage re-sum stays exact
        # under any salt partitioning (fixed_units convention)
        F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv") / 1_000_000.0, 2).alias("total_value"),
    )


@query(
    "q94_time_hierarchy_rollup",
    oracle=f"""
    SELECT 'week'::VARCHAR AS grain, date_trunc('week', ts) AS bucket,
           count(*) AS n, {duck_fixed_sum("value", scale=6)} AS total_value
    FROM events GROUP BY bucket
    UNION ALL
    SELECT 'day', date_trunc('day', ts), count(*), {duck_fixed_sum("value", scale=6)}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts), count(*), {duck_fixed_sum("value", scale=6)}
    FROM events GROUP BY 2
    """,
    tags=("rollup", "timeseries", "grouping-sets"),
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: one pass over events producing
    week/day/hour aggregate grains via GROUPING SETS — the continuous-
    aggregate materialization a time-series store keeps. Spark computes all
    three grains in a single scan + expand (the oracle unions three
    group-bys; same result, our plan reads the fact table once). At 100 TB
    these grains are materialized incrementally by the streaming path
    (q51's windows) and this batch form backfills them."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    g = ev.groupingSets(
        [["week"], ["day"], ["hour"]],
        F.col("week"), F.col("day"), F.col("hour"),
    ).agg(F.count(F.lit(1)).alias("n"), fixed_sum(F.col("value"), scale=6).alias("total_value"))
    grain = (
        F.when(F.col("week").isNotNull(), "week")
        .when(F.col("day").isNotNull(), "day")
        .otherwise("hour")
    )
    return g.select(
        grain.alias("grain"),
        F.coalesce("week", "day", "hour").alias("bucket"),
        "n",
        "total_value",
    )


@query(
    "q95_pivot",
    oracle="""
    SELECT user_id % 10 AS cohort,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events
    GROUP BY cohort
    """,
    tags=("pivot", "aggregation"),
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): event counts per user cohort, one column per
    event type. The pivot values are declared explicitly — at scale an
    undeclared pivot needs an extra distinct-scan to discover columns, and
    unbounded-cardinality pivots belong in maps, not columns."""
    ev = table(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return (
        ev.groupBy("cohort")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


@query(
    "q253_bitmap_distinct",
    oracle="""
    WITH words AS (
      SELECT ts::DATE AS day, user_id // 63 AS word_idx,
             bit_or((1::BIGINT << (user_id % 63))::BIGINT) AS bits
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           sum(bit_count(bits))::BIGINT AS n_distinct_users,
           count(*)::BIGINT             AS n_words
    FROM words GROUP BY day
    """,
    tags=("scale", "bitmap", "distinct", "sketch"),
)
def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT daily distinct-user counts via bitmap aggregation (the
    roaring-bitmap pattern for bounded integer domains): each user sets
    one bit in a (word_idx, 63-bit word) pair (63, not 64: DuckDB
    range-checks a signed shift into bit 63), words merge with bit_or —
    associative and commutative, so map-side partial aggregation does the
    merge and ANY re-sharding yields the same bitmap (split-invariant
    like q191/q211, but EXACT, not approximate). popcount over the words
    gives the count. Shuffle volume is |days|·⌈domain/63⌉ words however
    many events arrive — the distinct-count shape that beats
    count(DISTINCT) (which shuffles every distinct value) whenever ids
    are dense integers. The oracle runs the identical bitmap algebra."""
    ev = table(spark, sf_dir, "events")
    words = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.expr("user_id div 63").alias("word_idx"),
    ).agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))").alias("bits"))
    return words.groupBy("day").agg(
        F.expr("CAST(sum(bit_count(bits)) AS BIGINT)").alias("n_distinct_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


# join-strategy advisor: Spark's default autoBroadcastJoinThreshold
_ADVISOR_BROADCAST_BYTES = 10 * 1024 * 1024
# declared per-table average row widths (bytes) — in production these come
# from file statistics; shared literals keep the advice oracle-checkable
_ADVISOR_WIDTHS = {
    "region": 40,
    "nation": 44,
    "customer": 96,
    "supplier": 88,
    "part": 104,
    "orders": 72,
    "lineitem": 112,
}


@query(
    "q391_join_strategy_advisor",
    oracle=f"""
    WITH sizes AS (
      SELECT 'region' AS tbl, count(*)::BIGINT AS n_rows,
             (count(*) * {_ADVISOR_WIDTHS["region"]})::BIGINT AS est_bytes
        FROM region
      UNION ALL SELECT 'nation', count(*), count(*) * {_ADVISOR_WIDTHS["nation"]} FROM nation
      UNION ALL SELECT 'customer', count(*), count(*) * {_ADVISOR_WIDTHS["customer"]} FROM customer
      UNION ALL SELECT 'supplier', count(*), count(*) * {_ADVISOR_WIDTHS["supplier"]} FROM supplier
      UNION ALL SELECT 'part', count(*), count(*) * {_ADVISOR_WIDTHS["part"]} FROM part
      UNION ALL SELECT 'orders', count(*), count(*) * {_ADVISOR_WIDTHS["orders"]} FROM orders
      UNION ALL SELECT 'lineitem', count(*), count(*) * {_ADVISOR_WIDTHS["lineitem"]} FROM lineitem
    )
    SELECT tbl, n_rows, est_bytes,
           (est_bytes <= {_ADVISOR_BROADCAST_BYTES})        AS broadcastable,
           CASE WHEN est_bytes <= {_ADVISOR_BROADCAST_BYTES}
                THEN 'broadcast-hash'
                ELSE 'shuffle-hash-or-sort-merge' END       AS advice,
           rank() OVER (ORDER BY est_bytes, tbl)::BIGINT    AS size_rank
    FROM sizes
    """,
    tags=("scale", "advisor", "join-strategy", "statistics"),
)
def join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy advisor — the cost-based decision Catalyst makes
    from table statistics, surfaced as a queryable artifact (the
    companion to q235's fanout preflight): estimated bytes = rows ×
    declared avg width per table, compared against the broadcast
    threshold (Spark's 10 MB default). Sub-threshold tables get
    broadcast-hash advice — exactly the hint a query author (or an
    auto-tuner) applies with `broadcast()`; the rest shuffle. The plan
    audits elsewhere in this repo (test_plans.py) verify the engine
    AGREES with this advice wherever we assert BroadcastHashJoin.

    Scale posture (100 TB): seven count-star scans (metadata-answerable
    from parquet footers) and a 7-row grid — the advisor costs nothing
    and runs before any join is planned."""
    parts = []
    for tbl, width in _ADVISOR_WIDTHS.items():
        parts.append(
            table(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) * width).cast("bigint").alias("est_bytes"),
            )
        )
    sizes = parts[0]
    for p in parts[1:]:
        sizes = sizes.unionByName(p)
    bc = F.col("est_bytes") <= _ADVISOR_BROADCAST_BYTES
    return sizes.select(
        "tbl",
        "n_rows",
        "est_bytes",
        bc.alias("broadcastable"),
        F.when(bc, "broadcast-hash")
        .otherwise("shuffle-hash-or-sort-merge")
        .alias("advice"),
        F.rank().over(W.orderBy("est_bytes", "tbl")).cast("bigint").alias("size_rank"),
    )


# consistent-hashing dials: virtual nodes per server, before/after server
# counts, and the shared mix constants
_CH_VNODES = 16
_CH_SERVERS = 8
_CH_MIX = 2_654_435_761
_CH_P = 1_000_000_007


@query(
    "q404_consistent_hash_rebalance",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS k, ((o_orderkey * {_CH_MIX}) % {_CH_P}) AS h
      FROM orders
    ),
    ring AS (
      SELECT (s.i % {_CH_SERVERS + 1}) AS server,
             ((s.i * 48271 + 11) * {_CH_MIX}) % {_CH_P} AS p,
             (s.i % {_CH_SERVERS + 1}) < {_CH_SERVERS} AS in_before
      FROM generate_series(0, {(_CH_SERVERS + 1) * _CH_VNODES - 1}) AS s(i)
    ),
    assigned AS (
      SELECT k.k,
             coalesce(min_by(r.server, r.p) FILTER (r.in_before AND r.p >= k.h),
                      (SELECT min_by(server, p) FROM ring WHERE in_before))
               AS server_before,
             coalesce(min_by(r.server, r.p) FILTER (r.p >= k.h),
                      (SELECT min_by(server, p) FROM ring)) AS server_after
      FROM keys k CROSS JOIN ring r
      GROUP BY k.k, k.h
    )
    SELECT server_before::BIGINT AS server_before,
           count(*)::BIGINT AS n_keys,
           count(*) FILTER (server_after != server_before)::BIGINT AS n_moved,
           (count(*) FILTER (server_after != server_before) * 10000
              // count(*))::BIGINT AS moved_bp
    FROM assigned
    GROUP BY 1
    """,
    tags=("scale", "consistent-hashing", "sharding", "rebalance"),
)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring assignment + rebalance audit — the
    sharding mechanic under every distributed cache/store: keys map to
    the first virtual node clockwise on the hash ring (min ring point ≥
    key hash, wrapping to the global min), and adding server
    {_CH_SERVERS} must move only ≈ 1/(n+1) of keys — the property that
    makes consistent hashing worth it vs mod-N (which moves ≈ all). Both
    the before and after assignments fold in ONE pass over one ring
    fan-out (two conditional min_bys in the same aggregation), so the
    audit needs no key-keyed self-join at all. All hashes are the shared
    integer mix.

    Scale posture (100 TB): the ring is {(_CH_SERVERS + 1) * _CH_VNODES}
    points of pure literal integer arithmetic, so it is embedded as a
    SORTED ARRAY LITERAL and each key's successor lookup is one map-side
    `filter(ring, x -> x.p >= h)[1]` — zero joins, zero key-grain
    aggregation. (The original fanned every key out ring-width through a
    BroadcastNestedLoopJoin into a key-grain hash agg: |keys|·ring rows
    shuffled into |keys| groups to compute what a per-row expression
    answers — optimization r15, guide §2.4/§2.3: the placement decision
    needs only row-local data.) This is also the routing layer
    q86/q129's salting strategies assume."""
    keys = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        ((F.col("o_orderkey") * _CH_MIX) % _CH_P).alias("h"),
    )
    n_ring = (_CH_SERVERS + 1) * _CH_VNODES
    # the ring is deterministic literal arithmetic — materialize it in
    # Python, sorted by point, exactly as the oracle's generate_series
    # derivation does
    ring_pts = [
        (((i * 48271 + 11) * _CH_MIX) % _CH_P, i % (_CH_SERVERS + 1))
        for i in range(n_ring)
    ]
    assert len({p for p, _ in ring_pts}) == n_ring  # unique ⇒ min_by total
    before_pts = sorted((p, s) for p, s in ring_pts if s < _CH_SERVERS)
    all_pts = sorted(ring_pts)

    def _arr(pts: list) -> str:
        return (
            "array("
            + ", ".join(f"named_struct('p', {p}L, 's', {s}L)" for p, s in pts)
            + ")"
        )

    def _lookup(pts: list) -> str:
        # first ring point clockwise (p >= h), wrapping to the global min;
        # the array is sorted by p so element 1 of the filter IS min_by
        # try_element_at: an empty filter result (h beyond the last ring
        # point) must yield NULL → coalesce to the wrap-around server
        return (
            f"coalesce(try_element_at(filter({_arr(pts)}, x -> x.p >= h), 1).s, "
            f"{pts[0][1]}L)"
        )

    assigned = keys.select(
        "k",
        F.expr(_lookup(before_pts)).alias("server_before"),
        F.expr(_lookup(all_pts)).alias("server_after"),
    )
    return assigned.groupBy(F.col("server_before").cast("bigint")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(
            F.when(F.col("server_after") != F.col("server_before"), 1)
        ).alias("n_moved"),
        F.expr(
            "count_if(server_after != server_before) * 10000 div count(1)"
        ).cast("bigint").alias("moved_bp"),
    )


# partition-sizing advisor targets (Spark defaults: 128 MB input splits;
# shuffle-partition target sized so post-shuffle partitions land near it)
_PS_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_PS_SHUFFLE_TARGET_BYTES = 64 * 1024 * 1024


@query(
    "q407_partition_sizing_advisor",
    oracle=f"""
    WITH sizes AS (
      SELECT 'customer' AS tbl, count(*)::BIGINT AS n_rows,
             (count(*) * {_ADVISOR_WIDTHS["customer"]})::BIGINT AS est_bytes
        FROM customer
      UNION ALL SELECT 'orders', count(*), count(*) * {_ADVISOR_WIDTHS["orders"]} FROM orders
      UNION ALL SELECT 'lineitem', count(*), count(*) * {_ADVISOR_WIDTHS["lineitem"]} FROM lineitem
    )
    SELECT tbl, n_rows, est_bytes,
           greatest(1, (est_bytes + {_PS_MAX_PARTITION_BYTES} - 1)
                        // {_PS_MAX_PARTITION_BYTES})::BIGINT   AS scan_partitions,
           greatest(1, (est_bytes + {_PS_SHUFFLE_TARGET_BYTES} - 1)
                        // {_PS_SHUFFLE_TARGET_BYTES})::BIGINT  AS shuffle_partitions,
           (est_bytes // greatest(1,
              (est_bytes + {_PS_SHUFFLE_TARGET_BYTES} - 1)
                // {_PS_SHUFFLE_TARGET_BYTES}))::BIGINT         AS bytes_per_task
    FROM sizes
    """,
    tags=("scale", "advisor", "partitioning", "sizing"),
)
def partition_sizing_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-sizing advisor — the other half of q391's join advice:
    from rows × declared width, derive the scan partition count at the
    128 MB `maxPartitionBytes` default and the shuffle partition count
    that lands post-shuffle tasks near a 64 MB spill-safe target — the
    two knobs (`spark.sql.files.maxPartitionBytes`,
    `spark.sql.shuffle.partitions`) this repo's own session builder
    sizes, now computed instead of guessed. Ceiling-division integer
    rationals on shared constants keep it exact cross-engine.

    Scale posture (100 TB): count-stars (footer-answerable) + a 3-row
    grid; at 100 TB the same arithmetic says ~800k scan tasks and why
    AQE coalescing matters — the advisor IS the sizing argument
    SCALE.md makes in prose."""
    parts = []
    for tbl in ("customer", "orders", "lineitem"):
        width = _ADVISOR_WIDTHS[tbl]
        parts.append(
            table(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) * width).cast("bigint").alias("est_bytes"),
            )
        )
    sizes = parts[0]
    for p_ in parts[1:]:
        sizes = sizes.unionByName(p_)
    scan_p = F.expr(
        f"greatest(1, (est_bytes + {_PS_MAX_PARTITION_BYTES} - 1) "
        f"div {_PS_MAX_PARTITION_BYTES})"
    )
    shuf_p = F.expr(
        f"greatest(1, (est_bytes + {_PS_SHUFFLE_TARGET_BYTES} - 1) "
        f"div {_PS_SHUFFLE_TARGET_BYTES})"
    )
    return sizes.select(
        "tbl",
        "n_rows",
        "est_bytes",
        scan_p.cast("bigint").alias("scan_partitions"),
        shuf_p.cast("bigint").alias("shuffle_partitions"),
        F.expr(
            f"est_bytes div greatest(1, (est_bytes + {_PS_SHUFFLE_TARGET_BYTES} - 1) "
            f"div {_PS_SHUFFLE_TARGET_BYTES})"
        ).cast("bigint").alias("bytes_per_task"),
    )
