"""Fourteenth-wave coverage: forecasting-baseline eval (naive MAE),
QQ distribution comparison, per-source n-gram exclusivity, and
bag-of-words (order-insensitive) dedup.

docs/CROSS_ENGINE.md rules apply: discrete percentiles (rule 7),
exact integer cents, rule-24 tokenization, rule-21 ordered
aggregation for the sorted-token fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Naive next-week forecast MAE
# ---------------------------------------------------------------------------


@register(
    "naive_ltv_forecast_mae",
    "Forecasting-baseline eval at the user grain: predict each "
    "user's next-week spend as this week's spend (the naive "
    "persistence model every fancier LTV model must beat) and "
    "measure MAE and bias in exact cents over all (user, week) "
    "pairs with a successor week — including zero-spend weeks, "
    "which a join that drops absent users would silently skip (the "
    "user x week grid is built explicitly from the bounded week "
    "range). Errors are |y_{w+1} - y_w| in BIGINT cents; MAE is one "
    "exact division per week row. The grid fan-out is users x "
    "weeks (bounded small multiple of the user dimension).",
    """
    WITH bounds AS (
      SELECT MIN(epoch_us(ts) // 604800000000) AS wmin,
             MAX(epoch_us(ts) // 604800000000) AS wmax
      FROM events
    ),
    weeks AS (
      SELECT unnest(range(wmin, wmax + 1)) AS week FROM bounds
    ),
    u AS (SELECT DISTINCT user_id FROM events),
    spend AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS week,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, epoch_us(ts) // 604800000000
    ),
    grid AS (
      SELECT u.user_id, w.week, COALESCE(s.cents, 0) AS cents
      FROM u CROSS JOIN weeks w
      LEFT JOIN spend s ON s.user_id = u.user_id AND s.week = w.week
    ),
    paired AS (
      SELECT a.week, a.cents AS y_now, b.cents AS y_next
      FROM grid a JOIN grid b
        ON b.user_id = a.user_id AND b.week = a.week + 1
    )
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(abs(y_next - y_now)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0 AS mae_dollars,
           CAST(SUM(y_next - y_now) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0 AS bias_dollars
    FROM paired
    GROUP BY week
    """,
)
def q_naive_ltv_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("unix_micros(ts) DIV 604800000000")
    bounds = ev.agg(F.min(wk).alias("wmin"), F.max(wk).alias("wmax"))
    weeks = bounds.select(
        F.explode(F.sequence(F.col("wmin"), F.col("wmax"))).alias("week")
    )
    u = ev.select("user_id").distinct()
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", wk.alias("week"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    grid = (
        u.crossJoin(F.broadcast(weeks))
        .join(spend, ["user_id", "week"], "left")
        .select("user_id", "week", F.coalesce(F.col("cents"), F.lit(0)).alias("cents"))
    )
    b = grid.select(
        F.col("user_id").alias("user_id"),
        (F.col("week") - 1).alias("week"),
        F.col("cents").alias("y_next"),
    )
    paired = grid.join(b, ["user_id", "week"]).select(
        "week", F.col("cents").alias("y_now"), "y_next"
    )
    return paired.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (
            F.sum(F.abs(F.col("y_next") - F.col("y_now"))).cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100.0
        ).alias("mae_dollars"),
        (
            F.sum(F.col("y_next") - F.col("y_now")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100.0
        ).alias("bias_dollars"),
    )


# ---------------------------------------------------------------------------
# QQ table between customer segments
# ---------------------------------------------------------------------------


@register(
    "qq_table_segments",
    "Quantile-quantile comparison table: order totals of BUILDING-"
    "segment customers vs all other segments at the 9 deciles, as "
    "discrete percentiles (order statistics — rule 7's "
    "interpolation-proof form) plus their exact-cent difference — "
    "the distribution-shift readout that says WHERE two segments "
    "diverge, complementing the single-number KS/CvM statistics. "
    "Two grouped percentile aggregates over one fact-dim join; "
    "9-row output.",
    """
    WITH x AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    qa AS (
      SELECT CAST(quantile_disc(cents, 0.1) AS BIGINT) AS a1,
             CAST(quantile_disc(cents, 0.2) AS BIGINT) AS a2,
             CAST(quantile_disc(cents, 0.3) AS BIGINT) AS a3,
             CAST(quantile_disc(cents, 0.4) AS BIGINT) AS a4,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS a5,
             CAST(quantile_disc(cents, 0.6) AS BIGINT) AS a6,
             CAST(quantile_disc(cents, 0.7) AS BIGINT) AS a7,
             CAST(quantile_disc(cents, 0.8) AS BIGINT) AS a8,
             CAST(quantile_disc(cents, 0.9) AS BIGINT) AS a9
      FROM x WHERE grp = 1
    ),
    qb AS (
      SELECT CAST(quantile_disc(cents, 0.1) AS BIGINT) AS b1,
             CAST(quantile_disc(cents, 0.2) AS BIGINT) AS b2,
             CAST(quantile_disc(cents, 0.3) AS BIGINT) AS b3,
             CAST(quantile_disc(cents, 0.4) AS BIGINT) AS b4,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS b5,
             CAST(quantile_disc(cents, 0.6) AS BIGINT) AS b6,
             CAST(quantile_disc(cents, 0.7) AS BIGINT) AS b7,
             CAST(quantile_disc(cents, 0.8) AS BIGINT) AS b8,
             CAST(quantile_disc(cents, 0.9) AS BIGINT) AS b9
      FROM x WHERE grp = 0
    ),
    wide AS (SELECT * FROM qa CROSS JOIN qb),
    long AS (
      SELECT 1 AS decile, a1 AS q_building, b1 AS q_other FROM wide
      UNION ALL
      SELECT 2 AS decile, a2 AS q_building, b2 AS q_other FROM wide
      UNION ALL
      SELECT 3 AS decile, a3 AS q_building, b3 AS q_other FROM wide
      UNION ALL
      SELECT 4 AS decile, a4 AS q_building, b4 AS q_other FROM wide
      UNION ALL
      SELECT 5 AS decile, a5 AS q_building, b5 AS q_other FROM wide
      UNION ALL
      SELECT 6 AS decile, a6 AS q_building, b6 AS q_other FROM wide
      UNION ALL
      SELECT 7 AS decile, a7 AS q_building, b7 AS q_other FROM wide
      UNION ALL
      SELECT 8 AS decile, a8 AS q_building, b8 AS q_other FROM wide
      UNION ALL
      SELECT 9 AS decile, a9 AS q_building, b9 AS q_other FROM wide
    )
    SELECT decile, q_building, q_other,
           q_building - q_other AS diff_cents
    FROM long
    """,
)
def q_qq_table_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    x = o.join(c, o.o_custkey == c.c_custkey).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def side(grp: int, out: str) -> DataFrame:
        per_q = [
            F.expr(
                f"CAST(percentile_disc({d / 10.0}) WITHIN GROUP (ORDER BY cents)"
                f" AS BIGINT)"
            ).alias(f"q{d}")
            for d in range(1, 10)
        ]
        wide = x.filter(F.col("grp") == grp).agg(*per_q)
        rows = [
            wide.select(
                F.lit(d).cast("int").alias("decile"), F.col(f"q{d}").alias(out)
            )
            for d in range(1, 10)
        ]
        out_df = rows[0]
        for r in rows[1:]:
            out_df = out_df.unionByName(r)
        return out_df

    qa = side(1, "q_building")
    qb = side(0, "q_other")
    return qa.join(qb, "decile").select(
        "decile",
        "q_building",
        "q_other",
        (F.col("q_building") - F.col("q_other")).alias("diff_cents"),
    )


# ---------------------------------------------------------------------------
# Per-source n-gram exclusivity
# ---------------------------------------------------------------------------


@register(
    "source_ngram_exclusivity",
    "Content-overlap diagnostic for mixture design: per source, how "
    "many of its distinct 3-gram shingles appear in NO other source "
    "(exclusivity in ppm) — high exclusivity = the source adds "
    "genuinely new text; low = it mostly restates the pool and its "
    "mixture weight should reflect that (the n-gram-level companion "
    "to the MinHash source-similarity matrix). One (shingle, source) "
    "distinct pass; a shingle's source count joins back on the "
    "shingle key — shuffle on shingle hash, linear in corpus "
    "shingle volume, never a source x source pairing.",
    """
    WITH sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source,
               unnest(list_transform(
                 range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingle
        FROM (SELECT source,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents)
        WHERE len(t) >= 3
      )
    ),
    df AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM sh GROUP BY shingle
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exclusive,
           CAST(SUM(CASE WHEN d.n_sources = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS exclusivity_ppm
    FROM sh s JOIN df d ON d.shingle = s.shingle
    GROUP BY s.source
    """,
)
def q_source_ngram_exclusivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text")).alias("t")
    base = docs.select("source", toks)
    grams = F.when(
        F.size(F.col("t")) >= 3,
        F.expr(
            "transform(sequence(0, size(t) - 3),"
            " i -> array_join(slice(t, i + 1, 3), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select("source", F.explode(grams).alias("shingle")).distinct()
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"))
    return (
        sh.join(df, "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exclusive"),
            F.expr(
                "CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) * 1000000"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("exclusivity_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Bag-of-words (order-insensitive) dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_bag_of_words",
    "Order-insensitive dedup census: fingerprint = md5 of the SORTED "
    "token multiset (deterministic total order, rule 21), catching "
    "documents that are word shuffles of each other, which exact "
    "canonical-text dedup misses by design. Output is a one-row "
    "corpus summary (docs, bag groups, dup groups/docs, and the "
    "order-only groups that merged distinct exact fingerprints) — "
    "always non-empty, so the oracle compares real values at every "
    "scale factor (the synthetic corpus only grows bag-dups at "
    "sf0.1+; a groups-only output would be vacuously green below "
    "that). Same hash-groupBy scale shape as exact dedup.",
    """
    WITH f AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(
               list_filter(string_split(lower(trim(regexp_replace(text,
                 '\\s+', ' ', 'g'))), ' '), x -> x <> '')), ' '))
               AS bag_fp,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS exact_fp
      FROM documents
    ),
    g AS (
      SELECT bag_fp,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(COUNT(DISTINCT exact_fp) AS BIGINT) AS n_exact_groups
      FROM f GROUP BY bag_fp
    )
    SELECT CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bags,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN n_copies > 1 THEN n_copies ELSE 0 END)
                AS BIGINT) AS n_docs_in_dups,
           CAST(SUM(CASE WHEN n_copies > n_exact_groups THEN 1 ELSE 0 END)
                AS BIGINT) AS n_order_only_groups
    FROM g
    """,
)
def q_dedup_bag_of_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.text import canonical_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    canon = canonical_text(F.col("text"))
    f = docs.select(
        "doc_id",
        F.md5(F.array_join(F.sort_array(tokens(canon)), " ")).alias("bag_fp"),
        F.md5(canon).alias("exact_fp"),
    )
    g = f.groupBy("bag_fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.countDistinct("exact_fp").cast("bigint").alias("n_exact_groups"),
    )
    return g.agg(
        F.sum("n_copies").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bags"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_in_dups"),
        F.sum(F.when(F.col("n_copies") > F.col("n_exact_groups"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_order_only_groups"),
    )
