"""Scalar function families (SURVEY.md §2B "Scalar functions").

Each family gets one oracle-checked query exercising several functions.
Cross-engine alignment notes (they bite): Spark `floor`/`ceil` return BIGINT
where DuckDB returns DOUBLE (cast in SQL); Spark `dayofweek` is 1-based
Sunday=1 vs DuckDB 0-based (shift in SQL); Spark `log` is natural vs DuckDB
`log`=log10 (use ln/log10 explicitly); Spark arrays are 0-indexed via getItem
but `element_at` is 1-based like DuckDB's `[i]`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query


@query(
    "q36_fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_brand)                                   AS brand_lc,
           trim(upper(p_type))                              AS type_uc,
           substring(p_name, 1, 5)                          AS name5,
           length(p_type)                                   AS type_len,
           concat_ws('|', p_brand, p_type)                  AS brand_type,
           string_split(p_type, ' ')[1]                     AS type_head,
           regexp_extract(p_type, '([A-Z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
           lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
           p_name LIKE '%a%'                                AS has_a
    FROM part
    """,
    tags=("functions", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, trim, substring, length, concat, split,
    regexp_extract/replace, lpad, LIKE."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.trim(F.upper("p_type")).alias("type_uc"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_type").alias("type_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "q37_fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                  AS yr,
           month(o_orderdate)                                 AS mo,
           dayofweek(o_orderdate) + 1                         AS dow,
           date_trunc('month', o_orderdate)                   AS month_start,
           last_day(o_orderdate::DATE)::TIMESTAMP             AS month_end,
           datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
           date_trunc('day', o_orderdate + INTERVAL 3 MONTH)  AS plus3mo,
           make_date(year(o_orderdate), 1, 1)::TIMESTAMP      AS year_start
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    tags=("functions", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, last_day, datediff,
    add_months, make_date (RFC3339 event-time handling per guide:74-76)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.add_months("o_orderdate", 3).cast("timestamp_ntz").alias("plus3mo"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1))
        .cast("timestamp_ntz")
        .alias("year_start"),
    )


@query(
    "q38_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice + 0.5) / 100         AS price_h,
           CAST(floor(l_quantity) AS BIGINT)          AS qty_floor,
           CAST(ceil(l_discount * 100) AS BIGINT)     AS disc_pct_ceil,
           abs(l_quantity - 25)                       AS qty_dev,
           round(pow(l_discount, 2), 6)               AS disc_sq,
           round(sqrt(l_quantity), 6)                 AS qty_sqrt,
           round(ln(l_extendedprice), 6)              AS price_ln,
           round(log10(l_extendedprice), 6)           AS price_log10,
           greatest(l_tax, l_discount)                AS max_rate,
           least(l_tax, l_discount)                   AS min_rate,
           CAST(l_quantity AS BIGINT) % 7             AS qty_mod
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    """,
    tags=("functions", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/sqrt/ln/log10/greatest/least/mod."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # NOT round(x/100, 2): extendedprice/100 lands EXACTLY on .xx5 ties,
        # where Spark rounds the shortest-decimal repr (HALF_UP on "x.xx5")
        # but DuckDB rounds the binary double — 20 rows diverged at sf0.1.
        # floor(x + 0.5)/100 is tie-safe identical arithmetic in both.
        (F.floor(F.col("l_extendedprice") + 0.5) / 100).alias("price_h"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@query(
    "q39_fn_array_higher_order",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           round(embedding[1]::DOUBLE, 6)                        AS first_val,
           round(list_aggregate(
             list_transform(list_slice(embedding, 1, 8),
                            x -> x::DOUBLE * x::DOUBLE), 'sum'), 6) AS sumsq8,
           len(list_filter(embedding, x -> x > 0))               AS n_pos,
           round(list_sort(list_transform(embedding, x -> x::DOUBLE))[1], 6) AS min_val
    FROM embeddings
    """,
    tags=("functions", "array", "higher-order"),
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions: size, element_at, slice, transform,
    filter, aggregate, array_sort — all JVM-side, no UDFs (the vector-math
    substrate for the similarity operators)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = lambda c: c.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(F.slice("embedding", 1, 8), lambda x: dbl(x) * dbl(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sumsq8"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.element_at(F.array_sort(F.transform("embedding", dbl)), 1), 6
        ).alias("min_val"),
    )


@query(
    "q40_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')              AS k_str,
           json_extract_string(props, '$.k')::INTEGER     AS k_int,
           json_extract_string(props, '$.k')::INTEGER * 2 AS k_doubled,
           json_extract_string(props, '$.missing')        AS k_missing
    FROM events
    WHERE event_id % 11 = 0
    """,
    tags=("functions", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the `props` column (stand-in for the reference's ANS
    `body`, guide:112-114): path extraction kept lazy — the JSON string is
    never parsed until projected, which is what keeps 100 TB wide documents
    cheap (SURVEY.md §4.2 column pruning)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
    )


@query(
    "q41_fn_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')  AS seg_masked,
           nullif(c_mktsegment, 'BUILDING') IS NULL             AS was_building,
           coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS bal_nonneg,
           isnan(CASE WHEN c_acctbal < 0 THEN 'NaN'::DOUBLE
                      ELSE c_acctbal END)                       AS bal_is_nan
    FROM customer
    """,
    tags=("functions", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL family: coalesce/nullif/nvl/isnan — the R4 error→null semantics
    (guide:36-39) expressed as column functions."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.nullif("c_mktsegment", F.lit("BUILDING")).isNull().alias("was_building"),
        F.nvl(F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")), F.lit(0.0)).alias(
            "bal_nonneg"
        ),
        F.isnan(
            F.when(F.col("c_acctbal") < 0, F.lit(float("nan"))).otherwise(F.col("c_acctbal"))
        ).alias("bal_is_nan"),
    )


@query(
    "q42_fn_hash_portable",
    oracle="""
    SELECT c_custkey,
           md5(c_name)               AS name_md5,
           sha256(c_name)            AS name_sha256
    FROM customer WHERE c_custkey % 5 = 0
    """,
    tags=("functions", "hash"),
)
def fn_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hashes (md5/sha2) — the dedup-key primitives."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@query(
    "q43_fn_hash_native",
    oracle=None,  # xxhash64 / hash are Spark-native algorithms; rows-only
    tags=("functions", "hash"),
)
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hash functions (xxhash64, murmur3 hash, crc32) — used for
    shuffle-friendly dedup keys and MinHash seeds; engine-specific values so
    the driver runs the weaker rows-only check."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("name_xxh64"),
        F.hash("c_name").alias("name_murmur3"),
        F.crc32("c_name").alias("name_crc32"),
    )


@query(
    "q44_fn_explode",
    oracle="""
    SELECT tok, pos, count(*) AS n
    FROM (
      SELECT unnest(string_split(lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g')), ' ')) AS tok,
             generate_subscripts(string_split(lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g')), ' '), 1) AS pos
      FROM documents
    ) t
    WHERE tok <> '' AND pos <= 3
    GROUP BY tok, pos
    """,
    tags=("functions", "explode"),
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral array flatten with position) over tokenized text;
    positions 1-aligned to DuckDB's generate_subscripts."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.regexp_replace("text", "[^a-zA-Z ]", "")), " ")
    return (
        d.select(F.posexplode(toks).alias("pos0", "tok"))
        .withColumn("pos", F.col("pos0") + 1)
        .filter((F.col("tok") != "") & (F.col("pos") <= 3))
        .groupBy("tok", "pos")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q45_fn_map_struct",
    oracle="""
    SELECT lang, n_docs, round(avg_chars, 2) AS avg_chars
    FROM (
      SELECT lang, count(*) AS n_docs, avg(n_chars) AS avg_chars
      FROM documents GROUP BY lang
    ) t
    """,
    tags=("functions", "map"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + struct round-trip: per-lang stats packed into a map column
    (map_from_entries ← collect_list(struct)), then exploded back out.
    The map machinery is the Spark side under test; the oracle checks the
    values that survive the round-trip."""
    d = table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("n_chars").alias("avg_chars")
    )
    packed = per_lang.agg(
        F.map_from_entries(
            F.collect_list(F.struct("lang", F.struct("n_docs", "avg_chars").alias("v")))
        ).alias("m")
    )
    return (
        packed.select(F.explode(F.col("m")).alias("lang", "v"))
        .select(
            "lang",
            F.col("v.n_docs").alias("n_docs"),
            F.round(F.col("v.avg_chars"), 2).alias("avg_chars"),
        )
    )


@query(
    "q89_fn_map_json_zip",
    oracle="""
    SELECT event_id,
           'event_type·user' AS meta_keys,
           event_type || '·' || CAST(user_id AS VARCHAR)  AS meta_values,
           json_extract_string(props, '$.k')              AS k_str,
           floor(epoch(ts))::BIGINT                       AS ts_epoch,
           to_json(struct_pack(id := event_id, t := event_type)) AS packed_json
    FROM events
    WHERE event_id < 1000
    """,
    tags=("functions", "map", "json"),
)
def fn_map_json_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leftover function-family corners: create_map → map_keys/map_values
    (joined to strings for the oracle — map ordering follows insertion in
    both engines here), json_tuple single-path extraction, unix_timestamp,
    and to_json over a struct (Spark and DuckDB agree on compact JSON
    formatting for string/int fields)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.create_map(
        F.lit("event_type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.concat_ws("·", F.map_keys(m)).alias("meta_keys"),
        F.concat_ws("·", F.map_values(m)).alias("meta_values"),
        F.json_tuple("props", "k").alias("k_str"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_epoch"),
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("t"))).alias(
            "packed_json"
        ),
    )
