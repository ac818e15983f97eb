"""Extended operator coverage: multi-dimensional aggregates (rollup /
cube / grouping sets), exact percentiles, the full window-function
suite, scalar string/datetime function suites, approximate distinct
counting, and the temporal joins (as-of, bounded range).

These generalize the reference's aggregation/serving surface (SURVEY
§2.4-2.6 — the reference itself ships only group-by-count, README.md:
130-134, and scalar timestamp repairs, transform.py:8-97) into the
operator set a warehouse-grade engine over the same data needs. Every
query is oracle-paired except the approximate sketch (bounded-error by
design, rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import joins
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Multi-dimensional aggregates: ROLLUP / CUBE / GROUPING SETS
# ---------------------------------------------------------------------------


@register(
    "rollup_pricing",
    "ROLLUP aggregate over (returnflag, linestatus) with grouping_id — "
    "subtotals + grand total in one pass (partial-agg friendly; one shuffle).",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "cube_order_stats",
    "CUBE over (orderstatus, orderpriority): all 4 grouping combinations "
    "with exact decimal totals.",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@register(
    "groupingsets_flag_status",
    "Explicit GROUPING SETS ((returnflag), (linestatus), ()) — the general "
    "form rollup/cube specialize; one shuffle via Expand.",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_groupingsets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Percentiles & approximate aggregates
# ---------------------------------------------------------------------------


@register(
    "percentiles_by_event_type",
    "Exact continuous percentiles (p25/p50/p75) + min/max of event value "
    "per type — Spark percentile() ≡ DuckDB quantile_cont (verified "
    "bit-identical interpolation).",
    """
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           min(value) AS v_min,
           max(value) AS v_max
    FROM events
    GROUP BY event_type
    """,
)
def q_percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


@register(
    "approx_distinct_users",
    "HyperLogLog++ approximate distinct users per event type beside the "
    "exact count — the sketch path for 100 TB cardinalities where exact "
    "distinct would shuffle every key. Oracle-checkable despite the "
    "bounded-error sketch: the output carries the exact columns plus a "
    "derived approx_within_bounds flag (|approx−exact|/exact ≤ 3·rsd, the "
    "HLL++ guarantee), which the oracle asserts as TRUE.",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           count(*) AS n_events,
           TRUE AS approx_within_bounds
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.01
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("n_users_approx"),
        F.count_distinct("user_id").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_events"),
    )
    within = (
        F.abs(F.col("n_users_approx") - F.col("n_users_exact")).cast("double")
        / F.col("n_users_exact").cast("double")
        <= F.lit(3 * rsd)
    )
    return agg.select(
        "event_type", "n_users_exact", "n_events", within.alias("approx_within_bounds")
    )


# ---------------------------------------------------------------------------
# Window-function suite (SURVEY §2.5 W1 — additive capability)
# ---------------------------------------------------------------------------


@register(
    "window_rank_suite",
    "Full ranking/navigation window suite per customer order history: "
    "row_number, lag, lead, ntile, percent_rank, cume_dist over a "
    "deterministic order, rank/dense_rank over a tie-heavy order.",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w1 AS rn,
           -- COALESCE: NULL-free output — pandas turns nullable doubles
           -- into NaN, which hash-compares differently from Spark's None
           COALESCE(LAG(o_totalprice) OVER w1, -1.0) AS prev_price,
           COALESCE(LEAD(o_totalprice) OVER w1, -1.0) AS next_price,
           NTILE(4) OVER w1 AS quartile,
           PERCENT_RANK() OVER w1 AS prank,
           CUME_DIST() OVER w1 AS cdist,
           RANK() OVER w2 AS status_rank,
           DENSE_RANK() OVER w2 AS status_dense_rank
    FROM orders
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderstatus)
    """,
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w1).alias("rn"),
        F.coalesce(F.lag("o_totalprice").over(w1), F.lit(-1.0)).alias("prev_price"),
        F.coalesce(F.lead("o_totalprice").over(w1), F.lit(-1.0)).alias("next_price"),
        F.ntile(4).over(w1).alias("quartile"),
        F.percent_rank().over(w1).alias("prank"),
        F.cume_dist().over(w1).alias("cdist"),
        F.rank().over(w2).alias("status_rank"),
        F.dense_rank().over(w2).alias("status_dense_rank"),
    )


# ---------------------------------------------------------------------------
# Scalar function suites (SURVEY §2.6 generalized)
# ---------------------------------------------------------------------------


@register(
    "string_funcs_suite",
    "String scalar-function suite over part names: case, substring, pad, "
    "concat, translate, position, split — all JVM-side Catalyst "
    "expressions inside one codegen stage.",
    """
    SELECT p_partkey,
           upper(p_name) AS uname,
           substr(p_name, 1, 5) AS prefix5,
           lpad(p_brand, 12, '*') AS brand_pad,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
           CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
           CAST(len(list_filter(string_split(p_name, ' '), x -> x <> '')) AS INTEGER) AS n_words,
           reverse(p_name) AS rname,
           CAST(length(p_name) AS INTEGER) AS name_len
    FROM part
    """,
)
def q_string_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("p_name", "a").alias("first_a"),
        F.size(F.filter(F.split("p_name", " "), lambda x: x != "")).alias("n_words"),
        F.reverse("p_name").alias("rname"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "datetime_funcs_suite",
    "Datetime scalar-function suite over order dates: field extraction, "
    "truncation, month arithmetic, day deltas (Spark dayofweek is "
    "1=Sunday; oracle maps DuckDB dow accordingly).",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
    FROM orders
    """,
)
def q_datetime_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE→TIMESTAMP on both sides: pandas widens DATE columns to
        # datetime64 anyway, so compare as timestamps
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 1).cast("timestamp").alias("next_month"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_user_event_matrix",
    "Pivot: per-user event-type count matrix (long → wide). Spark plans "
    "pivot as one partial+final hash aggregation — the oracle spells out "
    "the equivalent conditional aggregation.",
    f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@register(
    "unpivot_order_amounts",
    "Unpivot/melt (wide → long): order price and per-item aggregates as "
    "(orderkey, measure, value) rows via the native unpivot operator.",
    """
    SELECT o_orderkey, measure, value FROM (
      SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    )
    """,
)
def q_unpivot_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", F.col("o_totalprice"), F.col("o_custkey").cast("double")
    ).unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "o_totalprice", "totalprice").otherwise("custkey"),
    )


# ---------------------------------------------------------------------------
# Join variants and classic analytics shapes
# ---------------------------------------------------------------------------


@register(
    "semi_join_urgent_customers",
    "Left-semi join: customers with ≥1 urgent order — the EXISTS shape "
    "(complement of the reference's lone anti-join, transform.py:138-143); "
    "plans as a broadcast/shuffled hash semi join, no row duplication.",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def q_semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q3_shipping_priority",
    "TPC-H-Q3-style 3-way join + revenue top-10: customer⋈orders⋈lineitem, "
    "decimal-exact revenue, deterministic (revenue DESC, orderkey) order.",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
    return (
        F.broadcast(c).join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "json_extract_props",
    "JSON-path extraction from the event props payload (the streaming "
    "path's from_json sibling, SURVEY S10) aggregated per event type.",
    """
    SELECT event_type,
           COUNT(*) AS n,
           -- CAST: DuckDB SUM(BIGINT) → HUGEINT → pandas float64
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(props->>'k' AS BIGINT)) AS k_min,
           MAX(CAST(props->>'k' AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@register(
    "array_funcs_suite",
    "Array scalar-function suite over embedding vectors: size, element "
    "access, min/max, bounded slice-sum — scalar outputs (driver-hash "
    "friendly), exact float32→double widening on both engines.",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_min(embedding) AS DOUBLE) AS v_min,
           CAST(list_max(embedding) AS DOUBLE) AS v_max,
           CAST(list_sum(list_transform(embedding[1:8],
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS head8_qsum
    FROM embeddings
    """,
)
def q_array_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    q8 = F.transform(F.slice(e, 1, 8), lambda x: F.round(x.cast("double") * 1000).cast("long"))
    return emb.select(
        "vec_id",
        F.size(e).alias("n_dims"),
        F.element_at(e, 1).cast("double").alias("first_val"),
        F.element_at(e, F.size(e)).cast("double").alias("last_val"),
        F.array_min(e).cast("double").alias("v_min"),
        F.array_max(e).cast("double").alias("v_max"),
        F.aggregate(q8, F.lit(0).cast("long"), lambda a, x: a + x).alias("head8_qsum"),
    )


# ---------------------------------------------------------------------------
# Temporal joins: as-of and bounded range (operators/joins.py)
# ---------------------------------------------------------------------------


@register(
    "asof_last_click_before_purchase",
    "Backward as-of join: for each purchase event, the user's most recent "
    "click at-or-before it (ties → max event_id) — union+window plan, one "
    "shuffle on user_id, no inequality join (operators/joins.py).",
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.purchase_id, p.user_id, c.click_id,
             CAST(floor(epoch(p.p_ts)) - floor(epoch(c.c_ts)) AS BIGINT) AS gap_s,
             ROW_NUMBER() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.c_ts DESC NULLS LAST, c.click_id DESC) AS rn
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.p_ts
    )
    -- COALESCE: unmatched purchases → -1 sentinel, keeping the output
    -- NULL-free (pandas widens nullable BIGINT to float64)
    SELECT purchase_id, user_id,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(gap_s, -1) AS gap_s
    FROM j WHERE rn = 1
    """,
)
def q_asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    j = joins.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        tie_col="event_id",
        right_payload=["event_id", "ts"],
        prefix="click_",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.coalesce(F.col("click_event_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp("click_ts"), F.lit(-1)
        ).alias("gap_s"),
    )


@register(
    "range_clicks_10min_before_purchase",
    "Bounded range join: clicks in the 10 minutes before each purchase, "
    "counted per purchase (zero-match purchases kept) — time-bucket "
    "equi-join rewrite, constant fan-out, no theta join "
    "(operators/joins.py).",
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id, p.user_id, count(c.c_us) AS n_clicks
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.c_us >= p.p_us - 600000000
     AND c.c_us < p.p_us
    GROUP BY 1, 2
    """,
)
def q_range_clicks_10min_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    counted = joins.range_join_count(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_offset_s=-600,
        upper_offset_s=0,
        left_id="event_id",
        count_alias="n_clicks",
    )
    return counted.select(F.col("event_id").alias("purchase_id"), "user_id", "n_clicks")


@register(
    "regression_value_by_hour",
    "Per-group exact OLS: slope/intercept of (quantized) event value vs "
    "hours-since-epoch-start, computed from exact integer moment sums "
    "(n, Σx, Σy, Σxy, Σx²) in one partial-agg shuffle — the closed form "
    "engines' regr_slope uses, but with bit-deterministic accumulation "
    "(float sums would hash-differ across engines/partition orders).",
    """
    WITH m AS (
      SELECT event_type,
             (CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200) // 3600 AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM m GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                ELSE 0.0 END AS slope_q,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN (CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)
                ELSE 0.0 END AS intercept_q
    FROM s
    """,
)
def q_regression_value_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.floor((F.col("ts").cast("long") - F.lit(1704067200)) / F.lit(3600)).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    m = ev.select("event_type", x.alias("x"), y.alias("y"))
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    numer = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = numer.cast("double") / denom.cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.when(denom != 0, slope).otherwise(F.lit(0.0)).alias("slope_q"),
        F.when(
            denom != 0,
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("intercept_q"),
    )


@register(
    "timeseries_gapfill_locf",
    "Time-series gap filling: a dense (user × day) spine generated with "
    "sequence+explode, left-joined against daily aggregates, missing "
    "days filled by last-observation-carried-forward (ignore-nulls "
    "last() window). The spine is generated, never materialized as a "
    "source: rows = users × horizon regardless of event sparsity, and "
    "the LOCF window is one shuffle on user.",
    """
    WITH spine AS (
      SELECT u.user_id, CAST(d.d AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS d
      ) d
    ),
    daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS day_avg
      FROM events GROUP BY 1, 2
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           daily.day_avg IS NOT NULL AS observed,
           COALESCE(last_value(daily.day_avg IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS filled_avg
    FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.day = daily.day
    """,
)
def q_timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("day_avg")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, on=["user_id", "day"], how="left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("day_avg").isNotNull().alias("observed"),
            F.coalesce(
                F.last("day_avg", ignorenulls=True).over(w), F.lit(-1.0)
            ).alias("filled_avg"),
        )
    )
