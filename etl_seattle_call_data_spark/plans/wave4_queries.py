"""Round-4 wave: distributed exact ranking applications (Gini
concentration), recursive CTEs run as ONE ANSI string on both engines
(Spark 4 WITH RECURSIVE), schema-evolution unions, binned interval
overlap joins, association-rule mining, deterministic weighted
sampling, and fixed-point iterative graph/cluster algorithms.

Cross-engine rules per docs/CROSS_ENGINE.md: exact integer/decimal math
until one final IEEE op per ratio; fixed-point DIV instead of libm;
every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import ranking
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Gini coefficient of revenue concentration (exact distributed ranking)


@register(
    "gini_revenue_concentration",
    "Gini coefficient of customer revenue concentration — the standard "
    "inequality measure over per-customer order totals, computed from "
    "the EXACT global revenue rank: G = (2·Σ(rank·rev) − (n+1)·Σrev) / "
    "(n·Σrev). The rank comes from operators/ranking.py's two-phase "
    "global rank (coarse revenue buckets + broadcast prefix offsets — "
    "no single-partition sort), every Σ is an exact decimal aggregate, "
    "and the final expression is ONE double division of identical "
    "integers/decimals on both engines. Ties in revenue break on the "
    "unique custkey, so rank·rev sums are cross-engine identical.",
    """
    WITH r AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk
      FROM r
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rev) AS s0,
             SUM(rnk * rev) AS s1
      FROM ranked
    )
    SELECT n AS n_customers,
           CAST(s0 AS DOUBLE) AS total_revenue,
           CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / CAST(n * s0 AS DOUBLE)
             AS gini
    FROM s
    """,
)
def q_gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    ranked, n = ranking.two_phase_rank(
        rev,
        order_by=["rev", "o_custkey"],
        coarse=F.floor(F.col("rev") / F.lit(10000)),
        rank_name="rnk",
    )
    s = ranked.agg(
        F.sum("rev").alias("s0"),
        F.sum(F.col("rnk") * F.col("rev")).alias("s1"),
    )
    num = F.lit(2) * F.col("s1") - F.lit(n + 1) * F.col("s0")
    den = F.lit(n) * F.col("s0")
    return s.select(
        F.lit(n).cast("bigint").alias("n_customers"),
        F.col("s0").cast("double").alias("total_revenue"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — one ANSI string, both engines


_RECURSIVE_SQL = """
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    edges AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM seq
      WHERE prev_type IS NOT NULL AND prev_type <> event_type
    ),
    reach(node, hops) AS (
      SELECT CAST('view' AS STRING) AS node, 0 AS hops
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.hops < 3
    )
    SELECT node, CAST(MIN(hops) AS BIGINT) AS min_hops
    FROM reach GROUP BY node
"""


@register(
    "recursive_reachability",
    "Recursive CTE as a first-class surface: breadth-first reachability "
    "(minimum hops from 'view') over the distinct event-type transition "
    "graph, expressed as ONE ANSI WITH RECURSIVE string executed "
    "verbatim by BOTH engines — Spark 4's recursive CTE support makes "
    "the iterative-union plan native (each recursion step is a join "
    "against the frontier; the depth guard bounds it). Scale: the edge "
    "set is TYPE-level (distinct transitions, ~25 rows regardless of "
    "SF) derived from one windowed pass over events, so recursion "
    "iterates over a broadcast-sized frontier while the heavy lifting "
    "(LAG + DISTINCT) is one shuffle of the event stream.",
    _RECURSIVE_SQL,
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# Schema evolution: union of snapshots with differing columns


@register(
    "schema_evolution_union",
    "Schema-evolution union — the every-warehouse migration moment when "
    "a column (o_orderpriority) exists only in post-upgrade data: the "
    "pre-1995 snapshot (2 columns) and the post-1995 snapshot (3 "
    "columns) combine by NAME with missing columns null-filled "
    "(unionByName(allowMissingColumns=True) ≡ DuckDB's UNION ALL BY "
    "NAME), then roll up per priority with the null bucket labelled. "
    "Positional UNION would silently misalign or reject; by-name union "
    "is the append-only schema-on-read contract. One scan per snapshot "
    "arm (disjoint pushed date predicates), one agg shuffle.",
    """
    WITH old_snap AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1995-01-01'
    ),
    new_snap AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    ),
    u AS (
      SELECT * FROM old_snap UNION ALL BY NAME SELECT * FROM new_snap
    )
    SELECT COALESCE(o_orderpriority, '(pre-upgrade)') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue
    FROM u GROUP BY COALESCE(o_orderpriority, '(pre-upgrade)')
    """,
)
def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1995-01-01").cast("timestamp")
    old_snap = o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_totalprice"
    )
    new_snap = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    u = old_snap.unionByName(new_snap, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("(pre-upgrade)")).alias(
            "priority"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# Interval overlap join via time-bucket blocking (band join)


@register(
    "interval_overlap_pairs",
    "Band (interval-overlap) join: count cross-type event pairs within "
    "±2 minutes of each other. The naive theta-join is O(n²); the Spark "
    "plan BINS time into 2-minute buckets and equi-joins bucket keys — "
    "the probe side explodes to its bucket ±1 (any pair within the band "
    "spans at most adjacent buckets, and exactly one probe value hits "
    "the build bucket, so nothing double-counts) — turning the band "
    "predicate into a hash join with fan-out bounded by per-bucket "
    "density. type_a < type_b orients each unordered pair once. The "
    "oracle states the same semantics as a direct range join (DuckDB "
    "IEJoin handles oracle-scale data).",
    """
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.event_type < b.event_type
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 120000000
    GROUP BY a.event_type, b.event_type
    """,
)
def q_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    us = F.unix_micros(F.col("ts"))
    bucket = F.floor(us / F.lit(120_000_000)).cast("long")
    build = ev.select(
        F.col("event_type").alias("type_a"), us.alias("us_a"), bucket.alias("bk")
    )
    probe = ev.select(
        F.col("event_type").alias("type_b"),
        us.alias("us_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    pairs = build.join(probe, "bk").filter(
        (F.col("type_a") < F.col("type_b"))
        & (F.abs(F.col("us_a") - F.col("us_b")) <= F.lit(120_000_000))
    )
    return pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
