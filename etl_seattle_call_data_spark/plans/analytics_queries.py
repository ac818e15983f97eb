"""Second-wave relational coverage: deep multi-join aggregation (TPC-H
Q5 shape), time-range rolling windows, deterministic hash/stratified
sampling, histogram binning, single-pass table profiling, sketch
percentiles with a checkable bound, and skew-salted join parity.

Every query is oracle-paired; the cross-engine arithmetic rules from
plans/queries.py apply (decimal sums cast to double at the end, BIGINT
casts on DuckDB integer functions, md5-prefix integers as the portable
hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import cdc, joins, profile, sampling
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


@register(
    "q5_local_supplier_volume",
    "TPC-H-Q5-style 6-table join: revenue by nation where the customer "
    "and supplier share the nation, region-filtered. The dim chain "
    "(region→nation→supplier) and customer broadcast; only "
    "lineitem⋈orders shuffles — the canonical deep-star plan.",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "rolling_revenue_30d",
    "Time-RANGE rolling window: per customer, each order's trailing-30-day "
    "order count and revenue (frame on epoch seconds, not row counts — "
    "value-based frames are deterministic under ties).",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_revenue,
           COUNT(*) OVER w AS roll_n
    FROM (SELECT *, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_epoch FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_epoch
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_revenue_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_epoch", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_epoch")
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("roll_revenue"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@register(
    "sample_hash_orders",
    "Deterministic 10% sample of orders via the portable md5-prefix hash "
    "— reproducible across engines/runs/partitionings (df.sample is "
    "not), pure narrow filter, no shuffle (operators/sampling.py).",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
    """,
)
def q_sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return sampling.hash_sample(o, "o_orderkey", percent=10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "sample_stratified_events",
    "EXACT stratified sample: ceil(10%) of every event_type stratum, "
    "members chosen by lowest portable hash — per-stratum counts are "
    "guaranteed, unlike sampleBy (operators/sampling.py).",
    """
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM (SELECT event_id, event_type,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                     % 2147483648 AS h
            FROM events)
    ) WHERE rn <= (n + 9) // 10
    """,
)
def q_sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sampling.stratified_sample(
        ev, stratum_col="event_type", key_col="event_id", fraction_denom=10
    ).select("event_id", "event_type")


@register(
    "histogram_order_totals",
    "Numeric histogram: fixed-width (50k) binning of order totals with "
    "per-bin count and bounds — one groupBy on the computed bin, "
    "map-side partial aggregation.",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS bin_min,
           MAX(o_totalprice) AS bin_max
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("bin", F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
    )


@register(
    "profile_orders",
    "Single-pass table profile (null counts / exact distincts / min-max) "
    "— the data-quality gate as one aggregation over one scan "
    "(operators/profile.py).",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS o_orderpriority_nulls,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS o_orderdate_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS o_custkey_distinct,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS o_orderstatus_distinct,
           MIN(o_totalprice) AS o_totalprice_min,
           MAX(o_totalprice) AS o_totalprice_max,
           MIN(o_orderdate) AS o_orderdate_min,
           MAX(o_orderdate) AS o_orderdate_max
    FROM orders
    """,
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return profile.profile_table(
        o,
        null_cols=["o_orderpriority", "o_orderdate"],
        distinct_cols=["o_custkey", "o_orderstatus"],
        minmax_cols=["o_totalprice", "o_orderdate"],
    )


@register(
    "approx_percentile_rank_bounds",
    "Sketch median (percentile_approx, accuracy 1000) per event type, "
    "validated by its rank guarantee: the count of values ≤ the sketch "
    "median must sit within n/100 of n/2. Exact columns + the derived "
    "bound flag make the sketch oracle-checkable (same device as "
    "approx_distinct_users).",
    """
    SELECT event_type, COUNT(*) AS n, TRUE AS rank_ok
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_percentile_rank_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sketch = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("ap50"),
        F.count(F.lit(1)).alias("n"),
    )
    ranked = (
        ev.join(F.broadcast(sketch), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when(F.col("value") <= F.col("ap50"), 1).otherwise(0)).alias("cnt_le"),
        )
    )
    rank_ok = (
        F.abs(F.col("cnt_le").cast("double") - F.col("n").cast("double") / 2)
        <= F.col("n").cast("double") / 100 + 1
    )
    return ranked.select("event_type", "n", rank_ok.alias("rank_ok"))


@register(
    "q14_promo_revenue_share",
    "TPC-H-Q14-style conditional-aggregate ratio: promo part types' share "
    "of one month's revenue — part broadcast against the date-pruned "
    "lineitem scan, decimal-exact numerator/denominator, one divide.",
    """
    SELECT CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             * 100.0 AS DOUBLE) AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q_q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double") * F.lit(100.0))
            .cast("double")
            .alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_orders",
    "TPC-H-Q18-style: orders whose total line quantity exceeds a "
    "threshold (aggregate-driven HAVING filter), semi-joined back and "
    "re-aggregated with the customer name — the agg→filter→semi-join "
    "shape where the qualifying-key set, not the fact, drives the join.",
    """
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(qualifying, F.col("o_orderkey") == qualifying.l_orderkey, "left_semi")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
    )


@register(
    "snapshot_diff_orders",
    "CDC snapshot diff: added/removed/changed keys between two extracts "
    "of the orders table (synthesized as modular slices with a price bump "
    "on a sub-slice) — one full-outer key join, unchanged rows dropped "
    "(operators/cdc.py).",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_totalprice")
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return cdc.snapshot_diff(old, new, key_cols=["o_orderkey"])


@register(
    "window_value_suite",
    "Value-navigation window suite per customer order history: "
    "first/last/nth value over a running frame plus a 3-row moving "
    "average (decimal-summed, one divide — cross-engine exact).",
    """
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w_run AS first_price,
           LAST_VALUE(o_totalprice) OVER w_run AS latest_price,
           COALESCE(NTH_VALUE(o_totalprice, 2) OVER w_run, -1.0) AS second_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_mov AS DOUBLE)
             / (COUNT(*) OVER w_mov) AS moving_avg_3,
           MAX(o_totalprice) OVER w_mov AS moving_max_3
    FROM orders
    WINDOW
      w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = base.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w_run).alias("first_price"),
        F.last("o_totalprice").over(w_run).alias("latest_price"),
        F.coalesce(F.nth_value("o_totalprice", 2).over(w_run), F.lit(-1.0)).alias("second_price"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w_mov).cast("double")
            / F.count(F.lit(1)).over(w_mov)
        ).alias("moving_avg_3"),
        F.max("o_totalprice").over(w_mov).alias("moving_max_3"),
    )


@register(
    "salted_join_parity",
    "Skew-salted equi-join (deterministic fact-side salt, dim replicated "
    "n_salts ways) — result-identical to the plain join, hot keys spread "
    "over n_salts tasks (operators/joins.py::salted_join).",
    """
    SELECT o_orderkey, o_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return joins.salted_join(o, c, on=["o_custkey"], salt_by="o_orderkey", n_salts=8).select(
        "o_orderkey", "o_custkey", "c_name"
    )


@register(
    "hot_salted_join_parity",
    "Differentiated (hot-key-only) salted join — result-identical to "
    "the plain inner join on a key with a MANUFACTURED 30%-hot head "
    "(3 of every 10 orders remapped to custkey 1) plus a NULL stripe "
    "(1 in 10 — inner-join-dropped on both engines, exercising the "
    "null-FK skew path). Only detected heavy hitters are salted, so "
    "dim replication is n_salts x |hot keys| rows, not n_salts x |dim| "
    "(operators/joins.py::hot_salted_join; measured 15.6 s unsalted vs "
    "10.6 s at sf10/50%-hot, tools/skew_bench.py).",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 9 THEN NULL
                WHEN o_orderkey % 10 < 3 THEN 1
                ELSE o_custkey END AS hot_custkey,
           c_name
    FROM orders JOIN customer
      ON (CASE WHEN o_orderkey % 10 = 9 THEN NULL
               WHEN o_orderkey % 10 < 3 THEN 1
               ELSE o_custkey END) = c_custkey
    """,
)
def q_hot_salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "hot_custkey",
        F.when(F.col("o_orderkey") % 10 == 9, F.lit(None).cast("long"))
        .when(F.col("o_orderkey") % 10 < 3, F.lit(1).cast("long"))
        .otherwise(F.col("o_custkey")),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("hot_custkey"), "c_name"
    )
    return joins.hot_salted_join(
        o, c, on=["hot_custkey"], salt_by="o_orderkey", n_salts=8
    ).select("o_orderkey", "hot_custkey", "c_name")


# ---------------------------------------------------------------------------
# Subquery shapes: EXISTS / NOT IN / disjunctive join predicates / top-k
# report — the decorrelation patterns (TPC-H Q4/Q16/Q19/Q10 shapes) the
# reference's serving layer would need as it grows beyond group-by-count
# (SURVEY §2.4; reference ships only flat aggregates, README.md:130-134).
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority_exists",
    "TPC-H-Q4-style EXISTS decorrelation: orders with at least one line "
    "shipped ≥60 days after the order date, counted by priority. The "
    "EXISTS becomes a left-semi join with a mixed equi + non-equi "
    "condition — lineitem never fans out the order rows.",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q16_supplier_cnt_not_in",
    "TPC-H-Q16-style NOT IN + COUNT(DISTINCT): per (brand, size) count of "
    "distinct suppliers shipping the part, excluding negative-balance "
    "suppliers. NOT IN over a non-null key compiles to a broadcast "
    "anti-join; the distinct agg is the only shuffle.",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_size <= 10
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
)
def q_q16_supplier_cnt_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    "TPC-H-Q19-style disjunctive join: three OR'd (brand, size-band, "
    "quantity-band) predicate groups over a single broadcast part join — "
    "Catalyst extracts the common equi-key so the OR never forces a "
    "nested-loop join.",
    """
    SELECT COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 0.0)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#34", 15, 20, 30))
        .agg(
            # COALESCE: at tiny SFs all three arms can be empty, and an
            # empty SUM is NULL — which canonicalizes as None in Spark
            # but NaN through DuckDB->pandas; 0.0 is the empty-revenue
            F.coalesce(F.sum(rev).cast("double"), F.lit(0.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    "TPC-H-Q10-style returned-item report: quarter of orders, lines "
    "flagged 'R', revenue per customer with nation, top 20. Dim joins "
    "broadcast; the orders⋈lineitem shuffle carries only the quarter.",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q17_small_quantity_revenue",
    "TPC-H-Q17-style correlated scalar subquery, decorrelated: lines of "
    "one brand's parts with quantity under 20% of that part's average. "
    "The per-part average is a partial-agg shuffle on the (filtered, "
    "broadcast-small) part set, joined back broadcast — the correlation "
    "never re-scans lineitem per row.",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # decorrelate: per-part avg over ALL lineitem (the subquery is not
    # brand-filtered — it correlates only on partkey), then join back.
    brand_lines = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    part_avg = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("__pk"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("__qty_cap"))
    )
    return (
        brand_lines.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cap"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_dormant_high_balance",
    "TPC-H-Q22-style: above-average-balance customers with no recent "
    "orders — an uncorrelated scalar subquery (global avg, one tiny "
    "broadcast row) + NOT EXISTS anti-join against the date-pruned "
    "orders scan, grouped by nation.",
    """
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q_q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # uncorrelated scalar subquery: a 1-row aggregate joined as a
    # broadcast cross (every engine plans this as a reusable scalar)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, on="c_custkey", how="left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
    )


@register(
    "q6_forecast_revenue_change",
    "TPC-H-Q6-style fully-pushed-down predicate aggregate: one year of "
    "shipments in a discount/quantity band, revenue = Σ price·discount. "
    "Every predicate reaches the parquet scan (PushedFilters); the plan "
    "is scan → partial agg → 1-row exchange — the cheapest possible "
    "shape, and the benchmark's canonical scan-efficiency probe.",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_q6_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_bi_nation_volume",
    "TPC-H-Q7-style bi-nation trade flow: revenue between one nation pair "
    "(customer side × supplier side, both directions) by ship "
    "year. Both nation dims broadcast twice under different aliases; "
    "the only shuffles are lineitem⋈orders and the final group-by.",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), on="s_nationkey")
        .join(F.broadcast(n2), on="c_nationkey")
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
