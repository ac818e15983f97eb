"""Third-wave relational coverage: the remaining TPC-H decorrelation
shapes expressible over the driver's tables — market-share ratio (Q8),
min/max-cost supplier per group (Q2), scalar-subquery threshold (Q11),
conditional two-stream counts (Q12), left-outer count distribution
(Q13), view-max top supplier (Q15), and the exists/not-exists
sole-failing-supplier shape (Q21).

The testdata has no ``partsupp`` table and ``lineitem`` carries no
``l_shipmode``/``l_commitdate``/``l_receiptdate``, so Q2/Q11/Q12/Q21 are
*adapted*: the shape (correlation structure, join graph, agg pattern) is
preserved while the filter columns come from what exists (supplier
acctbal for supplycost, quantity buckets for shipmode, ``l_returnflag =
'R'`` as the late-delivery marker). Each docstring states the mapping.

Cross-engine rules from plans/queries.py apply: decimal-exact sums cast
to DOUBLE at the end; ratios divide two already-identical DOUBLEs (one
IEEE op on bit-identical inputs) rather than dividing decimals, whose
scale/rounding rules differ between engines; ``year()`` is cast to
INTEGER on both sides (DuckDB returns BIGINT, Spark INT).

Scale notes: nation/region/supplier are broadcast explicitly (true dims
— 25/5/100 rows at any SF in this schema). customer and part join
without a hint: they grow with SF, so the plan must survive them
shuffling; AQE promotes them to broadcast at test scale on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

_DEC = "decimal(18,2)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )


@register(
    "q8_market_share",
    "TPC-H-Q8 shape: of STANDARD-type part revenue sold to ASIA-region "
    "customers, the share supplied by NATION_7, per order year. The "
    "ratio divides two DOUBLE sums (bit-identical on both engines) "
    "instead of decimals. Supplier/nation/region broadcast; part and "
    "customer join unhinted (they scale with SF — AQE decides).",
    """
    WITH sold AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey AND p_type = 'STANDARD'
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM sold
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    sold = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_regionkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(_DEC)
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero)
    ).cast("double")
    tot = F.sum("volume").cast("double")
    return sold.groupBy("o_year").agg(
        nat.alias("nation_volume"),
        tot.alias("total_volume"),
        (nat / tot).alias("mkt_share"),
    )


@register(
    "q2_best_supplier_per_part",
    "TPC-H-Q2 shape (adapted: no partsupp table — the part↔supplier "
    "relation is the DISTINCT (l_partkey, l_suppkey) projection of "
    "lineitem, and 'min supplycost' becomes 'max s_acctbal'). The "
    "correlated subquery SELECT max(..) WHERE same part decorrelates "
    "to a window-max + equality filter — one shuffle on partkey, no "
    "self-join. Ties keep all tied suppliers, as in the original.",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
             MAX(s_acctbal) OVER (PARTITION BY p_partkey) AS best_bal
      FROM part
      JOIN ps ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_size < 10
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM cand WHERE s_acctbal = best_bal
    """,
)
def q_q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    # Semi-join the raw pair stream against the filtered part keys BEFORE
    # the distinct: the dedup shuffle then carries only the ~1/5 of pairs
    # that survive the p_size predicate, and the later inner join (for
    # p_name) is against the same filtered side.
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey")
    return (
        p.join(ps, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("best_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q11_important_parts",
    "TPC-H-Q11 shape (adapted: part 'value' is discounted revenue from "
    "NATION_3 suppliers instead of supplycost*availqty). The scalar "
    "subquery (global total * threshold) is a 1-row aggregate cross-"
    "joined back as a broadcast — Catalyst's decorrelation for scalar "
    "subqueries, written explicitly. Both sides compare DOUBLEs cast "
    "from exact decimal sums, so the threshold cut is bit-identical.",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(value_dec AS DOUBLE)
          > (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM pv) * 0.001
    """,
)
def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value_dec"))
    )
    total = pv.agg(F.sum("value_dec").cast("double").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("total_value") * 0.001)
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q12_priority_by_quantity_class",
    "TPC-H-Q12 shape (adapted: no l_shipmode — lines are classed BULK/"
    "SMALL by quantity >= 25). Join + dual conditional counts grouped "
    "by the derived class, one shuffle on the tiny class key after a "
    "map-side partial agg; the year filter pushes to the parquet scan.",
    """
    SELECT CASE WHEN l_quantity >= 25 THEN 'BULK' ELSE 'SMALL' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_q12_priority_by_quantity_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(F.col("l_quantity") >= 25, "BULK")
            .otherwise("SMALL")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    "TPC-H-Q13: distribution of per-customer order counts, with a "
    "join-condition filter (priority <> 4-NOT SPECIFIED) that must NOT "
    "drop order-less customers — a left outer join with the predicate "
    "on the join's right side, then two aggregations. COUNT(o_orderkey) "
    "counts non-null matches only, so customers with zero qualifying "
    "orders land in the c_count=0 bucket.",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    "TPC-H-Q15: the revenue view (supplier revenue over one quarter) "
    "joined against its own MAX — the decimal sums make the equality "
    "exact on both engines, so ties (all suppliers at the max) are "
    "deterministic. The max is a 1-row broadcast, not a rescan.",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev_dec")
    )
    best = rev.agg(F.max("total_rev_dec").alias("best_rev"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev_dec") == F.col("best_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q21_sole_failing_supplier",
    "TPC-H-Q21 shape (adapted: l_returnflag='R' marks the failing line "
    "— no receipt/commit dates exist). Per supplier, the number of "
    "finished multi-supplier orders where THAT supplier is the only one "
    "with a failing line. The EXISTS / NOT-EXISTS pair decorrelates to "
    "one per-order aggregate (distinct suppliers, distinct failing "
    "suppliers) joined back — two scans of lineitem total, no "
    "correlated re-scans per row, which is the 100-TB-safe plan.",
    """
    WITH stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_fail
      FROM lineitem GROUP BY l_orderkey
    ),
    failing AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM failing
    JOIN stats USING (l_orderkey)
    JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp > 1 AND n_fail = 1
    GROUP BY s_name
    """,
)
def q_q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    # One aggregation tree instead of two lineitem scans: collapse to
    # (orderkey, suppkey, failed) first — COUNT(*)/SUM(failed) over that
    # equals the two COUNT(DISTINCT)s, without the expand operator a
    # multi-distinct agg plans, and the two consumers below share the
    # same exchange (AQE reuses it).
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("failed")
    )
    stats = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("failed").alias("n_fail"),
    )
    failing = per_supp.filter(F.col("failed") == 1).select("l_orderkey", "l_suppkey")
    return (
        failing.join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_fail") == 1))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q9_product_type_profit",
    "TPC-H-Q9 shape (adapted: the testdata has no partsupp, so unit "
    "cost is p_retailprice — the join graph, LIKE-filtered part dim, "
    "and nation×year profit rollup are preserved). All arithmetic in "
    "DECIMAL until the final DOUBLE cast: (18,2)×(19,2) products stay "
    "exact at scale 4 on both engines, so the sums hash identically. "
    "supplier+nation broadcast (fixed-size dims); part joins unhinted "
    "(scales with SF); the one shuffle aggregates (nation, year).",
    """
    WITH profit AS (
      SELECT sn.n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
    )
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM profit GROUP BY nation, o_year
    """,
)
def q_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = _revenue() - F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q20_dominant_part_suppliers",
    "TPC-H-Q20 shape (adapted: no partsupp availqty, so 'has excess "
    "stock' becomes 'shipped more than 10% of the part's total' — the "
    "nested aggregate-within-semi-join structure is intact: an inner "
    "per-(supplier,part) aggregate compared against a per-part scalar "
    "aggregate, the qualifiers feeding an IN-subquery on supplier, "
    "itself filtered to two nations via a broadcast dim). The shipped "
    "totals reuse ONE aggregation (part totals re-aggregate the "
    "(supp,part) rollup, not lineitem) and the 10% threshold compares "
    "two DOUBLEs derived from exact DECIMAL sums — cross-engine-stable. "
    "At scale: lineitem shuffles once on (suppkey,partkey); everything "
    "downstream is dim-sized.",
    """
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem JOIN red_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
      SELECT l_partkey AS tp, SUM(qty) AS total_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part_total ON l_partkey = tp
        WHERE CAST(qty AS DOUBLE) > 0.1 * CAST(total_qty AS DOUBLE)
      )
      AND s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_3', 'NATION_7')
      )
    """,
)
def q_q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    shipped = (
        li.join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )
    # Part totals as a window over the ALREADY-aggregated rollup, not a
    # second aggregation re-joined: the oracle's part_total CTE would
    # otherwise make Spark scan lineitem twice (shipped feeds two
    # consumers; exchange reuse across an agg+join is not guaranteed).
    # One fact scan, one extra shuffle over the (supp,part)-sized table.
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("qty").cast("double") > F.lit(0.1) * F.col("total_qty").cast("double"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
