"""Round-3 wave: warehouse CDC, built-in session windows, semantic
dedup, scalar quantization, Gopher-style quality filtering, and the
skew-resistant exact-distinct shape.

Cross-engine rules as plans/queries.py: exact integer/decimal math until
one final IEEE op; ``floor`` instead of ``round`` where a half-way rule
could diverge; every computed column aliased identically on both sides.

Scale notes per query in the docstrings — the shared theme: every new
operator is one equi-join or one window shuffle over the delta/corpus,
never an all-pairs product or a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.operators import cdc, ranking, similarity, text
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

_DEC = "decimal(18,6)"

# ---------------------------------------------------------------------------
# CDC MERGE (insert/update/delete application)


@register(
    "cdc_apply_changes",
    "Batch CDC MERGE: the per-customer state table as of 1999-01-01 "
    "(latest order priority) has the post-cutoff order stream applied "
    "as a change feed — status-F orders are deletes, others upserts, "
    "latest change per key wins by (date, orderkey). Exercises the "
    "MERGE INTO WHEN MATCHED DELETE/UPDATE/INSERT shape via "
    "operators/cdc.py::apply_changes: one window over the delta, one "
    "anti-join against touched keys; the base is never re-shuffled.",
    """
    WITH pre AS (
      SELECT o_custkey, o_orderpriority AS state, o_orderdate AS updated_at,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ),
    base AS (SELECT o_custkey, state, updated_at FROM pre WHERE rn = 1),
    chg AS (
      SELECT o_custkey,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             o_orderpriority AS state, o_orderdate AS updated_at,
             o_orderkey
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY updated_at DESC, o_orderkey DESC) AS rn
        FROM chg
      ) WHERE rn = 1
    )
    SELECT o_custkey, state, updated_at
    FROM base WHERE o_custkey NOT IN (SELECT o_custkey FROM latest)
    UNION ALL
    SELECT o_custkey, state, updated_at FROM latest WHERE op <> 'D'
    """,
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    base = (
        o.filter(F.col("o_orderdate") < cutoff)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("state"),
            F.col("o_orderdate").alias("updated_at"),
        )
    )
    changes = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("o_orderpriority").alias("state"),
        F.col("o_orderdate").alias("updated_at"),
        "o_orderkey",
    )
    return cdc.apply_changes(
        base, changes, key="o_custkey", seq_cols=["updated_at", "o_orderkey"]
    )


# ---------------------------------------------------------------------------
# Built-in session windows (F.session_window) vs the gaps-and-islands oracle


@register(
    "session_window_counts",
    "Spark's BUILT-IN session_window operator (30-minute inactivity "
    "gap) — the batch face of the streaming session aggregation; the "
    "oracle proves it equals the classic gaps-and-islands SQL "
    "(lag → new-session flag → running sum → group). session_start is "
    "the first event, session_end = last event + gap (Spark's window "
    "end), value summed in DECIMAL. One shuffle on user_id either way; "
    "session_window does it without a window function pass.",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM islands
    GROUP BY user_id, sid
    """,
)
def q_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_dec"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.col("sum_dec").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-resistant exact distinct (two-phase aggregation)


@register(
    "distinct_users_two_phase",
    "Exact COUNT(DISTINCT) written as the two-phase aggregation that "
    "survives key skew at 100 TB: phase 1 collapses (event_type, "
    "user_id) — partial-aggregated map-side, so a hot event_type "
    "arrives at the shuffle already deduplicated per mapper; phase 2 "
    "counts the collapsed pairs. No Expand operator, no single-reducer "
    "hot key carrying every distinct value.",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup one-pass, sign-cell blocked)


@register(
    "dedup_semantic",
    "SemDeDup-style semantic dedup over embeddings: docs are blocked "
    "into 16 deterministic cells (sign bits of the first 4 quantized "
    "dims — axis-aligned LSH, so the oracle can recompute it in SQL), "
    "and any doc with a LOWER-id in-cell neighbor at cosine ≥ 0.35 is "
    "dropped in favour of that representative. Integer-quantized "
    "cosine (exact cross-engine); the candidate join is the salted "
    "in-cell equi-join — never all-pairs.",
    """
    WITH w AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ),
    cells AS (
      SELECT vec_id, qv,
             CAST(list_sum(list_transform(range(1, 5),
                  p -> CASE WHEN qv[p] > 0 THEN CAST(2 ** (p - 1) AS BIGINT)
                            ELSE 0 END)) AS INTEGER) AS cell,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
      FROM w
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                 i -> a.qv[i] * b.qv[i])) AS DOUBLE)
            / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) >= 0.35
    )
    SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
    FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.35, n_bits=4)


# ---------------------------------------------------------------------------
# Scalar quantization (int8 vector-index compression)


@register(
    "embedding_scalar_quantize",
    "Vector-index scalar quantization: per-dimension [min,max] over the "
    "corpus maps every value to an integer code floor((x-mn)/(mx-mn)"
    "·255) clamped to [0,255]; parity evidence per vector is the exact "
    "integer code sum plus the max absolute reconstruction error "
    "(order-free aggregates; floor sidesteps round-half divergence; a "
    "corpus-constant dimension pins to code 0 on both engines rather "
    "than hitting 0/0 — NaN on Spark, a CAST error in DuckDB). "
    "Scale: one posexplode (×dims), a dims-sized stats broadcast, one "
    "re-aggregation — no collect, no driver state.",
    """
    WITH x AS (
      SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ),
    stats AS (
      SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY dim
    ),
    coded AS (
      SELECT vec_id, x.x, mn, mx,
             CASE WHEN mx = mn THEN 0
                  ELSE LEAST(GREATEST(
                         CAST(floor((x.x - mn) / (mx - mn) * 255) AS BIGINT),
                         0), 255)
             END AS code
      FROM x JOIN stats USING (dim)
    )
    SELECT vec_id,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           MAX(abs(x - (mn + CAST(code AS DOUBLE) / 255 * (mx - mn)))) AS max_abs_err
    FROM coded
    GROUP BY vec_id
    """,
)
def q_embedding_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.scalar_quantize_stats(emb)


# ---------------------------------------------------------------------------
# Gopher-style document quality filter


_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that")


@register(
    "corpus_gopher_filter",
    "Gopher-rule quality gate over documents (the pre-training corpus "
    "filter family): word count in [5, 100000], mean word length in "
    "[2, 12], ≥80% of words contain an alphabetic character, and ≥2 "
    "stopword hits. All counts are exact integers; each ratio is ONE "
    "IEEE division of identical inputs — bit-stable cross-engine. Pure "
    "Catalyst expressions over the token array (no UDF, no shuffle "
    "until the caller aggregates).",
    f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT)))
                  AS BIGINT) AS char_sum,
             CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks,
                  t -> list_contains({list(_STOPWORDS)}, lower(t)))) AS BIGINT)
               AS n_stopwords
      FROM tok
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(char_sum AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
           CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) AS frac_alpha,
           n_stopwords,
           (n_words BETWEEN 5 AND 100000
            AND CAST(char_sum AS DOUBLE) / CAST(n_words AS DOUBLE)
                  BETWEEN 2.0 AND 12.0
            AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
            AND n_stopwords >= 2) AS keep
    FROM m
    """,
)
def q_corpus_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens("text")
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("char_sum"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("long").alias("n_alpha"),
        F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*_STOPWORDS))
        ).cast("long").alias("n_stopwords"),
    )
    mean_len = F.col("char_sum").cast("double") / F.col("n_words").cast("double")
    frac_alpha = F.col("n_alpha").cast("double") / F.col("n_words").cast("double")
    return m.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha"),
        "n_stopwords",
        (
            F.col("n_words").between(5, 100000)
            & mean_len.between(2.0, 12.0)
            & (frac_alpha >= 0.8)
            & (F.col("n_stopwords") >= 2)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Latest-row-per-key WITHOUT a window sort (max_by / arg_max aggregation)


@register(
    "latest_order_maxby",
    "Latest order per customer via max_by aggregation instead of a "
    "row_number window: one hash aggregate with map-side partials — no "
    "per-partition SORT of the whole fact table, which is the window "
    "approach's hidden cost at 100 TB (sort spills dominate long before "
    "the shuffle does). The ordering tuple (o_orderdate, o_orderkey) is "
    "encoded as one collision-free BIGINT (epoch_seconds·10^9 + key, "
    "key < 10^9 at any plausible SF) because DuckDB's arg_max takes "
    "scalar ordering values; the same encoding runs on both engines.",
    """
    SELECT o_custkey,
           arg_max(o_orderkey,
                   (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 1000000)
                     * 1000000000 + o_orderkey)
             AS last_orderkey,
           arg_max(o_orderpriority,
                   (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 1000000)
                     * 1000000000 + o_orderkey)
             AS state,
           MAX(o_orderdate) AS updated_at
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_latest_order_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    seq = (
        F.unix_timestamp("o_orderdate").cast("long") * F.lit(1000000000).cast("long")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", seq).alias("last_orderkey"),
        F.max_by("o_orderpriority", seq).alias("state"),
        F.max("o_orderdate").alias("updated_at"),
    )


# ---------------------------------------------------------------------------
# Financial-style OHLC resampling (min_by/max_by, no window sort)


@register(
    "ohlc_resample_hourly",
    "OHLC time-series resampling: per (event_type, hour) the opening "
    "value (first by time), closing value (last by time), high, low, "
    "and tick count — the financial-bar downsample, computed as ONE "
    "hash aggregate with min_by/max_by instead of a window sort over "
    "the full stream. Ordering ties broken by the unique event_id via "
    "the same collision-free BIGINT encoding as latest_order_maxby; "
    "values pass through untouched (no float arithmetic to diverge). "
    "The oracle's epoch term is epoch_us//1000000 — TRUNCATION, like "
    "Spark's unix_timestamp — because DuckDB's epoch() ROUNDS "
    "fractional seconds (CROSS_ENGINE rule 11; rounding only masked "
    "by monotone event ids in the generated data).",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bar_hour,
           arg_min(value, (epoch_us(ts) // 1000000) * 1000000000 + event_id)
             AS open_value,
           arg_max(value, (epoch_us(ts) // 1000000) * 1000000000 + event_id)
             AS close_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM events
    GROUP BY event_type, bar_hour
    """,
)
def q_ohlc_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = (
        F.unix_timestamp("ts").cast("long") * F.lit(1000000000).cast("long")
        + F.col("event_id")
    )
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bar_hour")
    ).agg(
        F.min_by("value", seq).alias("open_value"),
        F.max_by("value", seq).alias("close_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency (the O(n log n) alternative to overlap joins)


@register(
    "peak_concurrency_sweepline",
    "Peak interval concurrency per event type, each event held open 5 "
    "minutes: the sweep-line rewrite — explode every interval into a "
    "(+1 start, -1 end) point, running-sum the deltas in time order, "
    "take the max — versus the naive self-join on range overlap which "
    "is O(n²) candidates and unusable at 100 TB. The running sum is "
    "TWO-PHASE so parallelism scales with the timeline, not the ~5-"
    "value type key: points window locally inside (type, day) chunks "
    "(#types × #days partitions), per-day delta totals roll into "
    "broadcast prefix offsets via a window over the tiny daily "
    "aggregate, and open_now = local_prefix + offset — no task ever "
    "serializes more than one type-day of points. End points sort "
    "before coincident starts (delta ASC in the tie), so back-to-back "
    "intervals never count as concurrent; the per-row running sum is "
    "tie-order-sensitive but its MAX is not (delta groups at one "
    "instant are sign-homogeneous), so only the aggregate is emitted.",
    """
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS d FROM events
    ),
    sweep AS (
      SELECT event_type,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS open_now
      FROM pts
    )
    SELECT event_type, CAST(MAX(open_now) AS BIGINT) AS peak_concurrency
    FROM sweep GROUP BY event_type
    """,
)
def q_peak_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # both sweep points of every interval from ONE pruned (type, ts) scan
    # — a UNION of start/end projections would scan events once per arm
    # per consumer (4 scans here: the window branch and the daily-total
    # branch each read both arms)
    pts = (
        ev.select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(F.col("ts").alias("t"), F.lit(1).alias("d")),
                    F.struct(
                        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("p"),
        )
        .select("event_type", F.col("p.t").alias("t"), F.col("p.d").alias("d"))
        .withColumn("__day", F.date_trunc("day", F.col("t")))
    )
    w_local = (
        Window.partitionBy("event_type", "__day")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("__local", F.sum("d").over(w_local))
    # per-(type, day) delta totals -> prefix offsets; a map-side partial
    # aggregate over the same point stream (tiny shuffle: #types x #days)
    daily = pts.groupBy("event_type", "__day").agg(F.sum("d").alias("__dd"))
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = daily.select(
        "event_type",
        "__day",
        F.coalesce(F.sum("__dd").over(w_off), F.lit(0)).alias("__offset"),
    )
    sweep = local.join(F.broadcast(offsets), ["event_type", "__day"]).withColumn(
        "open_now", F.col("__local") + F.col("__offset")
    )
    return sweep.groupBy("event_type").agg(
        F.max("open_now").cast("bigint").alias("peak_concurrency")
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection (median / MAD, outlier-immune)


@register(
    "robust_anomaly_mad",
    "Median-absolute-deviation anomaly screen per event type — the "
    "robust counterpart of the z-score flags (medians don't move when "
    "the outliers they're hunting poison the mean/stddev). Two exact "
    "percentile passes (per-type median, then median of |x−median|; "
    "Spark percentile() ≡ DuckDB quantile_cont, bit-identical "
    "interpolation — same contract percentiles_by_event_type proves) "
    "and an integer count of |x−median| > 3·MAD rows. Two shuffles on "
    "the 5-key type column, both map-side partialed.",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS median_value
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.median_value,
             abs(e.value - m.median_value) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, median_value, quantile_cont(adev, 0.5) AS mad_value
      FROM dev GROUP BY event_type, median_value
    )
    SELECT d.event_type, d.median_value, m.mad_value,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad_value THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.median_value, m.mad_value
    """,
)
def q_robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("median_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("median_value"))
    )
    mad = dev.groupBy("event_type", "median_value").agg(
        F.percentile("adev", 0.5).alias("mad_value")
    )
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad_value")), "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_value"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (self-join bounded by basket size)


@register(
    "copurchase_part_pairs",
    "Market-basket analysis: the 20 part pairs most often bought in the "
    "same order. Self-equi-join of lineitem on orderkey with id "
    "inequality — candidate count is Σ(basket²) and baskets are ~7 "
    "lines, so the fan-out is bounded per order (never corpus²); one "
    "shuffle on the pair key with map-side partials, then TakeOrdered "
    "top-20 (ties broken by the pair ids, no global sort).",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pair-count table is shared (token-memoized) with the whole
    # market-basket family: association rules, PageRank, triangles
    from etl_seattle_call_data_spark.plans.shared import memo_copurchase_pairs

    prs = memo_copurchase_pairs(spark, sf_dir)
    return (
        prs.select("part_a", "part_b", F.col("n_ab").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Domain-shift divergence per source (fixed-point chi-squared, log-free)


@register(
    "source_divergence_chi2",
    "Per-source domain-shift score: chi-squared divergence between each "
    "source's unigram distribution and the whole-corpus distribution, "
    "in exact fixed-point (p,q = count·10⁶ DIV total; term = (p−q)² "
    "DIV q — integer floor division, bit-identical on every engine; a "
    "log-based KL would hinge on libm rounding). Summed over the "
    "tokens PRESENT in the source (absent-token mass excluded by "
    "definition). The corpus distribution derives from the per-source "
    "counts by re-aggregation — the token stream is scanned once.",
    """
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS tok
      FROM documents
    ),
    sc AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
    st AS (SELECT source, SUM(c) AS t FROM sc GROUP BY source),
    cc AS (SELECT tok, SUM(c) AS c FROM sc GROUP BY tok),
    ct AS (SELECT SUM(c) AS t FROM cc),
    terms AS (
      SELECT sc.source,
             (sc.c * 1000000) // st.t AS p,
             (cc.c * 1000000) // ct.t AS q
      FROM sc
      JOIN st ON sc.source = st.source
      JOIN cc ON sc.tok = cc.tok
      CROSS JOIN ct
    )
    SELECT source,
           CAST(SUM(CASE WHEN q > 0 THEN ((p - q) * (p - q)) // q
                         ELSE 0 END) AS BIGINT) AS chi2_fp,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM terms
    GROUP BY source
    """,
)
def q_source_divergence_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(text.tokens("text")).alias("tok"))
    sc = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("t"))
    cc = sc.groupBy("tok").agg(F.sum("c").alias("cc_c"))
    ct = cc.agg(F.sum("cc_c").alias("ct_t"))
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(cc, "tok")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            F.expr("(c * 1000000) DIV t").alias("p"),
            F.expr("(cc_c * 1000000) DIV ct_t").alias("q"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum(
            F.when(F.col("q") > 0, F.expr("((p - q) * (p - q)) DIV q")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("chi2_fp"),
        F.count(F.lit(1)).alias("n_terms"),
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics (what the salting/AQE knobs are tuned FROM)


@register(
    "skew_report_lineitem_orderkey",
    "Join-key skew report for lineitem.l_orderkey: the top-10 hottest "
    "keys with their row share, plus each key's multiple of a perfectly "
    "uniform key (share·n_keys in fixed-point) — the diagnostic that "
    "decides between plain shuffle, AQE skew-join, and explicit "
    "salting. One count aggregation + a 10-row TakeOrdered; the scalar "
    "totals ride along via a broadcast single-row cross join.",
    """
    WITH kc AS (SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey),
    tot AS (SELECT SUM(c) AS n_rows, COUNT(*) AS n_keys FROM kc)
    SELECT l_orderkey, CAST(c AS BIGINT) AS n_rows_key,
           CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS row_share,
           CAST((c * n_keys * 1000000) // n_rows AS BIGINT) AS uniform_multiple_fp
    FROM kc CROSS JOIN tot
    ORDER BY c DESC, l_orderkey
    LIMIT 10
    """,
)
def q_skew_report_lineitem_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    tot = kc.agg(
        F.sum("c").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        kc.crossJoin(F.broadcast(tot))
        .select(
            "l_orderkey",
            F.col("c").cast("bigint").alias("n_rows_key"),
            (F.col("c").cast("double") / F.col("n_rows").cast("double")).alias(
                "row_share"
            ),
            F.expr("CAST((c * n_keys * 1000000) DIV n_rows AS BIGINT)").alias(
                "uniform_multiple_fp"
            ),
        )
        .orderBy(F.desc("n_rows_key"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Data-quality audit (constraint checks as one aggregated report)


@register(
    "dq_audit_orders_lineitem",
    "Warehouse data-quality gate as one report row: orphan lineitems "
    "(no parent order), orders with a dangling customer key, duplicate "
    "order keys, null-key rows, and the total row counts the rates are "
    "judged against. Built ENTIRELY from operators/dq.py's lazy scalar "
    "primitives — key-only anti-joins, a duplicate-key aggregate, and "
    "one multi-aggregate pass over orders — stitched with broadcast "
    "one-row joins into a single Catalyst plan: ONE Spark action "
    "materializes all six numbers (the round-3 version ran six driver-"
    "side jobs and scanned orders four times). Anti-join build sides "
    "are the pruned key sets — broadcastable at any SF.",
    """
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
         (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
         (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
        AS dangling_customer_fk,
      (SELECT COUNT(*) FROM
         (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
        AS duplicate_orderkeys,
      (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS null_orderkeys,
      (SELECT COUNT(*) FROM orders) AS n_orders,
      (SELECT COUNT(*) FROM lineitem) AS n_lineitems
    """,
)
def q_dq_audit_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators import dq

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    orphans = dq.fk_orphan_count(
        li, "l_orderkey", o.select(F.col("o_orderkey")), "o_orderkey",
        "orphan_lineitems",
    )
    dangling = dq.fk_orphan_count(
        o, "o_custkey", c.select(F.col("c_custkey")), "c_custkey",
        "dangling_customer_fk",
    )
    dupes = dq.duplicate_key_count(
        o, "o_orderkey", "duplicate_orderkeys", count_keys=True
    )
    o_stats = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_orderkeys"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    li_stats = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    return dq.scalar_join(orphans, dangling, dupes, o_stats, li_stats).select(
        "orphan_lineitems",
        "dangling_customer_fk",
        "duplicate_orderkeys",
        "null_orderkeys",
        "n_orders",
        "n_lineitems",
    )


# ---------------------------------------------------------------------------
# Ratio-to-report window (share-of-parent rollup)


@register(
    "nation_revenue_share",
    "Ratio-to-report: each nation's share of its REGION's revenue via a "
    "window SUM over the 25-row nation rollup — the share computation "
    "never touches fact-table granularity (aggregate first, window the "
    "tiny rollup). Revenue decimal-exact; the share is one double "
    "division of identical inputs.",
    """
    WITH nat AS (
      SELECT r_name AS region, n_name AS nation,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      GROUP BY r_name, n_name
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)
             AS region_share
    FROM nat
    """,
)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    nat = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("rev"))
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("region")
    ).cast("double")
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        share.alias("region_share"),
    )


# ---------------------------------------------------------------------------
# Time-zone-aware local-time analytics (IANA rules incl. DST)


@register(
    "tz_local_hour_activity",
    "Wall-clock activity profile: events bucketed by their "
    "America/Los_Angeles LOCAL hour-of-day — UTC-stored timestamps "
    "shifted through real IANA rules, so DST transitions move the "
    "bucket boundary (UTC−7 summer, UTC−8 winter; the Spark "
    "from_utc_timestamp ≡ DuckDB timezone(tz, timezone('UTC', ts)) "
    "equivalence is itself what the oracle certifies, session-tz-"
    "independent on both engines). Value sums decimal-exact; one "
    "shuffle on the 24×5 bucket key.",
    """
    SELECT event_type,
           CAST(hour(timezone('America/Los_Angeles', timezone('UTC', ts)))
                AS INTEGER) AS local_hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, local_hour
    """,
)
def q_tz_local_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "America/Los_Angeles")
    return (
        ev.groupBy(
            "event_type", F.hour(local).cast("int").alias("local_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_dec"),
        )
        .select(
            "event_type",
            "local_hour",
            "n",
            F.col("sum_dec").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Period-over-period growth (the BI WoW/MoM report shape)


@register(
    "revenue_wow_growth",
    "Week-over-week revenue growth per order priority: weekly decimal-"
    "exact revenue, lag(1) over the week sequence, growth = one double "
    "division (sentinel -999.0 for each priority's first week — a "
    "NULL would canonicalize as NaN on one engine and None on the "
    "other, and growth is structurally > -1 so the sentinel is "
    "unambiguous). "
    "Aggregate first (the window runs over the ~priority×weeks rollup, "
    "never fact granularity); one fact shuffle, one tiny window sort.",
    """
    WITH weekly AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      GROUP BY o_orderpriority, week
    )
    SELECT priority, week,
           CAST(rev AS DOUBLE) AS revenue,
           COALESCE(CAST(rev AS DOUBLE)
             / CAST(lag(rev) OVER (PARTITION BY priority ORDER BY week) AS DOUBLE)
             - 1.0, -999.0) AS wow_growth
    FROM weekly
    """,
)
def q_revenue_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy("priority").orderBy("week")
    return weekly.select(
        "priority",
        "week",
        F.col("rev").cast("double").alias("revenue"),
        F.coalesce(
            F.col("rev").cast("double") / F.lag("rev").over(w).cast("double")
            - F.lit(1.0),
            F.lit(-999.0),
        ).alias("wow_growth"),
    )


# ---------------------------------------------------------------------------
# Funnel conversion latency (how long each converting user took)


@register(
    "funnel_latency_quantiles",
    "Conversion-latency distribution for the ordered view→purchase "
    "funnel: per user, first view then first purchase AT OR AFTER it "
    "(order-enforced, same discipline as the stepwise funnel); the "
    "view→purchase gap in whole seconds feeds exact p25/p50/p75 "
    "(quantile_cont ≡ Spark percentile, the proven cross-engine "
    "interpolation contract). Gaps diff exact MICROSECOND integers "
    "(epoch_us ≡ unix_micros) floor-divided to seconds — DuckDB's "
    "epoch() keeps fractional seconds and its double→int cast ROUNDS "
    "where Spark truncates, so second-level math must never pass "
    "through doubles. Two narrow per-user aggregates, one global quantile "
    "over ~n_users rows.",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT p.user_id,
             (epoch_us(p.first_purchase) - epoch_us(v.first_view)) // 1000000
               AS latency_s
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           quantile_cont(CAST(latency_s AS DOUBLE), 0.25) AS p25_s,
           quantile_cont(CAST(latency_s AS DOUBLE), 0.50) AS p50_s,
           quantile_cont(CAST(latency_s AS DOUBLE), 0.75) AS p75_s,
           CAST(MAX(latency_s) AS BIGINT) AS max_s
    FROM lat
    """,
)
def q_funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = p.join(v, "user_id").select(
        F.expr("(unix_micros(first_purchase) - unix_micros(first_view)) DIV 1000000")
        .alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile(F.col("latency_s").cast("double"), 0.25).alias("p25_s"),
        F.percentile(F.col("latency_s").cast("double"), 0.50).alias("p50_s"),
        F.percentile(F.col("latency_s").cast("double"), 0.75).alias("p75_s"),
        F.max("latency_s").cast("bigint").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# User-journey path mining (ordered sequence aggregation)


@register(
    "top_event_paths",
    "Top user journeys: each user's first five events in (ts, event_id) "
    "order joined into a path string, counted, top-15 by frequency. "
    "The ordered sequence comes from sort_array over collected "
    "(ts, event_id, type) structs — struct order is total because the "
    "id is unique, so the path is deterministic on any partitioning "
    "(a bare collect_list would be partition-order-dependent and "
    "irreproducible). The aggregation buffer is HARD-bounded before "
    "collect_list ever runs: a row_number window keeps only each "
    "user's first five events, so a hot user with millions of events "
    "costs a (spillable) window sort, never an unbounded in-memory "
    "array. One shuffle on user_id (window + agg share it), one on "
    "the path key, TakeOrdered top-k.",
    """
    WITH paths AS (
      SELECT user_id,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '->')
               AS path
      FROM events GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 15
    """,
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first5 = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("__rn") <= 5)
    )
    seq = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(F.transform(seq, lambda s: s["event_type"]), "->")
    return (
        first5.groupBy("user_id")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Bitmap presence sketch (bit_or aggregation + popcount)


@register(
    "event_user_bitmap",
    "Bitmap presence sketch per event type: users hash into 62 bucket "
    "bits of one BIGINT (63 would shift into the sign bit — DuckDB "
    "raises, Spark silently wraps negative), presence folds with bit_or (commutative/associative — "
    "map-side partials compose exactly like any monoid agg), "
    "bit_count reads occupancy. The 64-bit fixed-width cousin of a "
    "roaring bitmap index: O(1) state per group regardless of user "
    "count, mergeable across partitions/segments without resorting to "
    "distinct shuffles. Bucket = pmod(xxhash64(user_id), 64) — the "
    "engine's portable hash is not DuckDB-reproducible, so the bucket "
    "uses user_id % 62 here to stay oracle-exact (documented swap).",
    """
    SELECT event_type,
           CAST(bit_or(1 << CAST(user_id % 62 AS BIGINT)) AS BIGINT)
             AS presence_bitmap,
           CAST(bit_count(CAST(bit_or(1 << CAST(user_id % 62 AS BIGINT)) AS BIGINT))
                AS INTEGER) AS buckets_occupied,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact
    FROM events
    GROUP BY event_type
    """,
)
def q_event_user_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # PySpark's shiftleft helper takes only a literal bit count; the SQL
    # form accepts a column expression
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))")
    bm = F.bit_or(mask)
    return ev.groupBy("event_type").agg(
        bm.cast("long").alias("presence_bitmap"),
        F.bit_count(bm).cast("int").alias("buckets_occupied"),
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users_exact"),
    )


# ---------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)


@register(
    "null_safe_segment_join",
    "Null-safe equi-join: two halves of the event stream aggregate by a "
    "NULLABLE segment key (low-value events lose their segment — the "
    "missing-dimension model) and join with <=> so the NULL segments "
    "MATCH each other instead of silently dropping — the semantic gap "
    "between ON a=b (nulls never join) and IS NOT DISTINCT FROM that "
    "reconciliation pipelines hit constantly. Null-safe equality still "
    "plans as a hash join (the key is hashable); counts exact.",
    """
    WITH tagged AS (
      SELECT event_id,
             CASE WHEN value < 0.5 THEN NULL ELSE event_type END AS seg
      FROM events
    ),
    a AS (SELECT seg, COUNT(*) AS n_a FROM tagged WHERE event_id % 2 = 0 GROUP BY seg),
    b AS (SELECT seg, COUNT(*) AS n_b FROM tagged WHERE event_id % 2 = 1 GROUP BY seg)
    SELECT a.seg, CAST(a.n_a AS BIGINT) AS n_a, CAST(b.n_b AS BIGINT) AS n_b
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def q_null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id",
        F.when(F.col("value") < 0.5, F.lit(None)).otherwise(F.col("event_type")).alias("seg"),
    )
    a = (
        tagged.filter(F.col("event_id") % 2 == 0)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        tagged.filter(F.col("event_id") % 2 == 1)
        .groupBy(F.col("seg").alias("seg_b"))
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, a["seg"].eqNullSafe(b["seg_b"]))
        .select("seg", "n_a", "n_b")
    )


# ---------------------------------------------------------------------------
# DAU/WAU via mergeable bitmap rollup (sketch once, roll up many ways)


@register(
    "wau_dau_bitmap_rollup",
    "DAU/WAU from ONE daily sketch: per (event_type, day) a 62-bit "
    "user-bucket bitmap (bit_or monoid — partial-aggregates map-side), "
    "then weekly activity is the bitmaps OR-folded over a 7-day window "
    "— the mergeable-sketch rollup that makes engagement metrics "
    "feasible at 100 TB: the fact table is scanned ONCE at day grain "
    "and every coarser period derives by sketch merge, never a "
    "re-scan. Bucket occupancy approximates actives (exact while "
    "users-per-type-day < buckets); stickiness = one double division.",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             bit_or(1 << CAST(user_id % 62 AS BIGINT)) AS bm
      FROM events
      GROUP BY event_type, day
    )
    SELECT event_type, day,
           CAST(bit_count(CAST(bm AS BIGINT)) AS INTEGER) AS dau_buckets,
           CAST(bit_count(CAST(bit_or(bm) OVER (
                  PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT))
                AS INTEGER) AS wau_buckets,
           CAST(bit_count(CAST(bm AS BIGINT)) AS DOUBLE)
             / CAST(bit_count(CAST(bit_or(bm) OVER (
                  PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT))
                    AS DOUBLE) AS stickiness
    FROM daily
    """,
)
def q_wau_dau_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.bit_or(mask).alias("bm"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    dau = F.bit_count(F.col("bm")).cast("int")
    wau = F.bit_count(F.bit_or(F.col("bm")).over(w)).cast("int")
    return daily.select(
        "event_type",
        "day",
        dau.alias("dau_buckets"),
        wau.alias("wau_buckets"),
        (dau.cast("double") / wau.cast("double")).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Time-bounded anti-join (NOT EXISTS within a window — abandonment)


@register(
    "abandoned_views",
    "Abandonment metric: per user, views with NO click/purchase by the "
    "same user within the following 30 minutes — the time-bounded "
    "NOT EXISTS decorrelation. Spark plans the anti-join with the "
    "user_id equi-key as the hash key and the time bounds as residual "
    "join conditions — never a nested-loop over the corpus; one "
    "shuffle on user_id serves both sides. Abandonment rate is one "
    "double division of exact counts.",
    """
    WITH v AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    ),
    fu AS (
      SELECT user_id, ts FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    abandoned AS (
      SELECT v.user_id, v.event_id FROM v
      WHERE NOT EXISTS (
        SELECT 1 FROM fu
        WHERE fu.user_id = v.user_id
          AND fu.ts >= v.ts
          AND fu.ts < v.ts + INTERVAL 30 MINUTE
      )
    )
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST((SELECT COUNT(*) FROM abandoned a WHERE a.user_id = v.user_id)
                AS BIGINT) AS n_abandoned,
           CAST((SELECT COUNT(*) FROM abandoned a WHERE a.user_id = v.user_id)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS abandon_rate
    FROM v
    GROUP BY v.user_id
    """,
)
def q_abandoned_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    fu = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("user_id").alias("fu_user"), F.col("ts").alias("fu_ts")
    )
    abandoned = v.join(
        fu,
        (F.col("fu_user") == F.col("user_id"))
        & (F.col("fu_ts") >= F.col("ts"))
        & (F.col("fu_ts") < F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_anti",
    )
    totals = v.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_views"))
    ab = abandoned.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_abandoned")
    )
    return (
        totals.join(ab, "user_id", "left")
        .select(
            "user_id",
            "n_views",
            F.coalesce(F.col("n_abandoned"), F.lit(0)).cast("bigint").alias("n_abandoned"),
            (
                F.coalesce(F.col("n_abandoned"), F.lit(0)).cast("double")
                / F.col("n_views").cast("double")
            ).alias("abandon_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram (NTILE buckets with per-bucket stats)


@register(
    "equidepth_histogram_totals",
    "Equi-depth (equal-count) histogram of order totals: NTILE(10) "
    "assigns ranked rows to buckets of near-equal population, then "
    "per-bucket min/max/count/decimal-sum describe the distribution — "
    "the complement of the fixed-width histogram (equal RANGES, skewed "
    "counts) and the basis of optimizer column statistics. NTILE ties "
    "are broken by the unique order key, so bucket assignment is total "
    "and cross-engine identical. The Spark side computes the SAME "
    "NTILE assignment via operators/ranking.py's two-phase global "
    "rank — coarse value-buckets (width 1000 → ~600 buckets over the "
    "price range, SF-independent), per-bucket row_number, broadcast "
    "prefix offsets, rank→bucket by the ANSI NTILE formula — so no "
    "stage sorts more than one coarse bucket and the plan carries NO "
    "Exchange SinglePartition (asserted in test_plans.py), versus the "
    "naive windowless ntile() that funnels every row through one task.",
    """
    WITH ranked AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM ranked
    GROUP BY bucket
    """,
)
def q_equidepth_histogram_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked_df, n = ranking.two_phase_rank(
        o,
        order_by=["o_totalprice", "o_orderkey"],
        coarse=F.floor(F.col("o_totalprice") / F.lit(1000.0)),
        rank_name="__grank",
    )
    ranked = ranked_df.select(
        "o_totalprice",
        ranking.equidepth_bucket(F.col("__grank"), n, 10).alias("bucket"),
    )
    return ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


# ---------------------------------------------------------------------------
# The spark.sql surface (same engine, SQL text in, Catalyst out)


_SQL_SURFACE = """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
"""


@register(
    "sql_surface_pricing",
    "The engine's SQL face: this query is ONE ANSI string executed "
    "verbatim by BOTH engines — spark.sql() over the registered temp "
    "views and DuckDB over the same parquet — proving the SQL surface "
    "is first-class (same Catalyst plan, pushdown, and AQE as the "
    "DataFrame API; load_tables registers every test table as a view). "
    "The dialect-neutral subset used everywhere (CAST/DECIMAL/"
    "TIMESTAMP literals/CASE) is exactly what makes the oracle gate "
    "possible.",
    _SQL_SURFACE,
)
def q_sql_surface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, names=("lineitem",))
    return spark.sql(_SQL_SURFACE)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery in FROM (per-row dependent join)


_LATERAL_SQL = """
    SELECT c_custkey, c_acctbal, o_orderkey, o_orderdate
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_orderdate FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
    ) recent
"""


@register(
    "lateral_recent_orders",
    "LATERAL correlated subquery in FROM — each customer's two most "
    "recent orders via a per-row dependent subquery, the decorrelation "
    "shape window-rank can express but LATERAL states directly; one "
    "ANSI string runs verbatim on both engines (Catalyst decorrelates "
    "it to a ranked join — no per-row re-execution; the inner ORDER "
    "BY carries the unique key so the kept pair is total-ordered).",
    _LATERAL_SQL,
)
def q_lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# kNN graph construction (every node's top-k neighbors, blocked)


@register(
    "knn_graph_blocked",
    "k-nearest-neighbor graph over embeddings, k=3, within label "
    "blocks: the all-nodes neighbor structure that graph ANN indices "
    "(HNSW/NSG) and graph-based dedup build on — distinct from "
    "similarity_topk_* which rank against a small query set. In-block "
    "pairs via the salted equi-join (both directions of each pair "
    "feed the per-node ranking), integer-quantized cosine, window "
    "top-3 per node with (cosine DESC, neighbor) total order. Block "
    "size bounds the candidate count: B docs per block → B² pairs, "
    "never corpus²; at scale blocks come from IVF cells or LSH "
    "buckets instead of labels (same plan shape).",
    """
    WITH w AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
      FROM w
    ),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                  i -> a.qv[i] * b.qv[i])) AS DOUBLE)
               / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) AS cosine
      FROM q a JOIN q b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT src, dst, cosine, CAST(rk AS INTEGER) AS rk FROM (
      SELECT src, dst, cosine,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst) AS rk
      FROM pairs
    ) WHERE rk <= 3
    """,
)
def q_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(
        emb, threshold=-1.0, block_col="label", salt=8
    )
    # cosine_pairs emits each unordered pair once (id_a < id_b); the kNN
    # graph ranks DIRECTED edges, so mirror the pairs before the window
    directed = pairs.selectExpr("id_a AS src", "id_b AS dst", "cosine").unionByName(
        pairs.selectExpr("id_b AS src", "id_a AS dst", "cosine")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst", "cosine", F.col("rk").cast("int").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL keep multiplicity)


@register(
    "set_ops_all_variants",
    "Bag-semantics set operations: customer keys of non-urgent orders "
    "EXCEPT ALL urgent ones (each urgent occurrence cancels ONE "
    "non-urgent occurrence — multiplicity arithmetic the DISTINCT "
    "variants destroy), summarized as per-key surviving multiplicity, "
    "plus the INTERSECT ALL cardinality as a cross-check column. "
    "Spark's exceptAll/intersectAll plan as aggregate+generate over "
    "count deltas — one shuffle each, no join explosion.",
    """
    WITH surv AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    inter AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT s.o_custkey,
           CAST(COUNT(*) AS BIGINT) AS surplus_non_urgent,
           CAST((SELECT COUNT(*) FROM inter i WHERE i.o_custkey = s.o_custkey)
                AS BIGINT) AS n_matched
    FROM surv s
    GROUP BY s.o_custkey
    """,
)
def q_set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    non_urgent = o.filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    surv = non_urgent.exceptAll(urgent)
    inter = non_urgent.intersectAll(urgent).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    return (
        surv.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("surplus_non_urgent"))
        .join(inter, "o_custkey", "left")
        .select(
            "o_custkey",
            "surplus_non_urgent",
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("bigint").alias("n_matched"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery in SELECT (per-row aggregate lookup)


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           COALESCE((SELECT MAX(l_shipdate) FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey),
                    TIMESTAMP '9999-12-31') AS last_ship,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS n_lines
    FROM orders o
"""


@register(
    "scalar_subquery_enrichment",
    "Correlated scalar subqueries in the SELECT list — the per-row "
    "aggregate-lookup shape (each order's last ship date and line "
    "count). One ANSI string runs verbatim on both engines; Catalyst "
    "decorrelates both subqueries into left-outer aggregate joins over "
    "ONE shared lineitem aggregation (same correlation key → same "
    "subplan), so the fact table is scanned once, not per-row and not "
    "per-subquery. Orders with no lines surface the scalar-subquery "
    "NULL/0 contract: COUNT over empty is 0, and the empty MAX takes "
    "the 9999-12-31 sentinel (a NULL timestamp canonicalizes as NaT "
    "vs None across the engines — docs/CROSS_ENGINE.md rule 13).",
    _SCALAR_SUBQ_SQL,
)
def q_scalar_subquery_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, names=("orders", "lineitem"))
    return spark.sql(_SCALAR_SUBQ_SQL)
