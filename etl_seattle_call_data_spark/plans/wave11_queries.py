"""Eleventh-wave coverage: model- and layout-quality evidence —
nearest-centroid margin audit, experiment covariate balance (SMD),
Qini uplift deciles, recommendation diversity/coverage, and
delta-encoding layout savings.

Shares wave-10's cross-engine machinery (quotient+remainder split,
portable md5 buckets) and the similarity family's quantized-integer
embedding math. docs/CROSS_ENGINE.md rules apply throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_seattle_call_data_spark.plans.docs_queries import _DUCK_COS, _DUCK_Q
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.plans.wave10_queries import (
    _SPLIT_DUCK,
    _SPLIT_SPARK,
    _hash_mod,
    _split_double,
)
from etl_seattle_call_data_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Nearest-centroid margin audit
# ---------------------------------------------------------------------------


@register(
    "classifier_margin_audit",
    "Separation-margin audit of the nearest-centroid classifier: per "
    "vector, margin = (distance to the best WRONG label centroid) - "
    "(distance to its own label centroid), in exact integer quantized "
    "units — positive means correctly separated, and the margin "
    "magnitude is the robustness headroom accuracy alone hides. Same "
    "twice-quantized centroid construction as the accuracy query "
    "(coordinate sums exact, centroid = (sum*1000) DIV n); per-label "
    "margin sums accumulate in DECIMAL(38,0)/HUGEINT (a margin is "
    "< 2^48; corpus sums pass 2^53 at scale) and reach the mean "
    "through the quotient+remainder split. Fan-out bounded by "
    "dims x |labels| per row — the model size, not the corpus square.",
    f"""
    WITH q AS (
      SELECT vec_id, label, d,
             CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx
      FROM (SELECT vec_id, label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings)
    ),
    cent AS (
      SELECT label AS clabel, d,
             CAST(SUM(qx) * 1000 // COUNT(*) AS BIGINT) AS cq
      FROM q GROUP BY label, d
    ),
    scores AS (
      SELECT q.vec_id, q.label, c.clabel,
             CAST(SUM((q.qx * 1000 - c.cq) * (q.qx * 1000 - c.cq))
                  AS BIGINT) AS dist2
      FROM q JOIN cent c ON c.d = q.d
      GROUP BY q.vec_id, q.label, c.clabel
    ),
    margins AS (
      SELECT vec_id, label,
             MIN(CASE WHEN clabel <> label THEN dist2 END)
               - MIN(CASE WHEN clabel = label THEN dist2 END) AS margin
      FROM scores GROUP BY vec_id, label
    ),
    agg AS (
      SELECT label,
             COUNT(*) AS n_vectors,
             SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS n_separated,
             SUM(margin) AS sum_margin
      FROM margins GROUP BY label
    )
    SELECT label,
           CAST(n_vectors AS BIGINT) AS n_vectors,
           CAST(n_separated AS BIGINT) AS n_separated,
           CAST(n_separated * 1000000 // n_vectors AS BIGINT) AS separated_ppm,
           {_split_double('sum_margin').format(**_SPLIT_DUCK)}
             / CAST(n_vectors AS DOUBLE) AS mean_margin
    FROM agg
    """,
)
def q_classifier_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("d"),
        F.round(F.col("x").cast("double") * 1000).cast("bigint").alias("qx"),
    )
    cent = q.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.expr("CAST(SUM(qx) * 1000 DIV COUNT(*) AS BIGINT)").alias("cq")
    )
    scores = (
        q.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("qx") * 1000 - F.col("cq")) * (F.col("qx") * 1000 - F.col("cq"))
            )
            .cast("bigint")
            .alias("dist2")
        )
    )
    margins = scores.groupBy("vec_id", "label").agg(
        (
            F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist2")))
            - F.min(F.when(F.col("clabel") == F.col("label"), F.col("dist2")))
        ).alias("margin")
    )
    agg = margins.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.when(F.col("margin") > 0, 1).otherwise(0)).alias("n_separated"),
        F.sum(F.col("margin").cast("decimal(38,0)")).alias("sum_margin"),
    )
    return agg.select(
        "label",
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.col("n_separated").cast("bigint").alias("n_separated"),
        F.expr("CAST(n_separated * 1000000 DIV n_vectors AS BIGINT)").alias(
            "separated_ppm"
        ),
        (
            F.expr(_split_double("sum_margin").format(**_SPLIT_SPARK))
            / F.col("n_vectors").cast("double")
        ).alias("mean_margin"),
    )


# ---------------------------------------------------------------------------
# Covariate balance (standardized mean difference) across experiment arms
# ---------------------------------------------------------------------------


@register(
    "covariate_balance_smd",
    "Covariate balance check for the hash-randomized experiment: per "
    "event type, the standardized mean difference of users' PRE-"
    "period activity counts between the two arms — "
    "SMD = (m1-m0)/sqrt((v1+v0)/2), the causal-inference balance "
    "table that validates randomization beyond the SRM count check "
    "(and the diagnostic propensity-score workflows stratify on). "
    "The user x type grid is an explicit 5-row broadcast fan-out with "
    "zero-fill (absent combos are real zeros, not dropped rows — the "
    "emptiness trap); all moments are exact BIGINT sums entering one "
    "fixed IEEE tree; |SMD| < 0.1 is the conventional balance flag. "
    "One fact scan + one 10-row aggregate.",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    pre AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS x
      FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY user_id, event_type
    ),
    grid AS (
      SELECT u.user_id, t.event_type,
             ('0x' || substr(md5(CAST(u.user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm,
             COALESCE(p.x, 0) AS x
      FROM u CROSS JOIN types t
      LEFT JOIN pre p ON p.user_id = u.user_id AND p.event_type = t.event_type
    ),
    mom AS (
      SELECT event_type,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS s1,
             SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS s0,
             SUM(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS ss1,
             SUM(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS ss0
      FROM grid GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n1, n0, s1, s0,
             CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
               / NULLIF(CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE), 0) AS v1,
             CAST(n0 * ss0 - s0 * s0 AS DOUBLE)
               / NULLIF(CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE), 0) AS v0
      FROM mom
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_arm_a,
           CAST(n0 AS BIGINT) AS n_arm_b,
           CAST(s1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0) AS mean_a,
           CAST(s0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0) AS mean_b,
           CASE WHEN v1 + v0 = 0.0 THEN 0.0
                ELSE (CAST(s1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0)
                      - CAST(s0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0))
                     / sqrt((v1 + v0) / 2.0) END AS smd,
           CASE WHEN v1 + v0 = 0.0 THEN TRUE
                ELSE abs((CAST(s1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0)
                          - CAST(s0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0))
                         / sqrt((v1 + v0) / 2.0)) < 0.1 END AS balanced
    FROM v
    """,
)
def q_covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    u = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    pre = (
        ev.filter(F.col("ts") < cut)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    grid = (
        u.crossJoin(F.broadcast(types))
        .join(pre, ["user_id", "event_type"], "left")
        .select(
            "event_type",
            _hash_mod(F.col("user_id"), 2).alias("arm"),
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    mom = grid.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x") * F.col("x")).otherwise(0)).alias("ss1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x") * F.col("x")).otherwise(0)).alias("ss0"),
    )
    v = mom.select(
        "event_type",
        "n1",
        "n0",
        "s1",
        "s0",
        # NULLIF guards (CROSS_ENGINE rule 40): a 0- or 1-user arm
        # zeroes the variance denominator; ANSI Spark throws on /0
        (
            (F.col("n1") * F.col("ss1") - F.col("s1") * F.col("s1")).cast("double")
            / F.nullif(
                F.col("n1").cast("double") * (F.col("n1") - 1).cast("double"),
                F.lit(0.0),
            )
        ).alias("v1"),
        (
            (F.col("n0") * F.col("ss0") - F.col("s0") * F.col("s0")).cast("double")
            / F.nullif(
                F.col("n0").cast("double") * (F.col("n0") - 1).cast("double"),
                F.lit(0.0),
            )
        ).alias("v0"),
    )
    mean_a = F.col("s1").cast("double") / F.nullif(
        F.col("n1").cast("double"), F.lit(0.0)
    )
    mean_b = F.col("s0").cast("double") / F.nullif(
        F.col("n0").cast("double"), F.lit(0.0)
    )
    smd = (mean_a - mean_b) / F.sqrt((F.col("v1") + F.col("v0")) / 2.0)
    zero_var = F.col("v1") + F.col("v0") == 0.0
    return v.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_arm_a"),
        F.col("n0").cast("bigint").alias("n_arm_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        F.when(zero_var, F.lit(0.0)).otherwise(smd).alias("smd"),
        F.when(zero_var, F.lit(True)).otherwise(F.abs(smd) < 0.1).alias("balanced"),
    )


# ---------------------------------------------------------------------------
# Qini uplift deciles
# ---------------------------------------------------------------------------


@register(
    "qini_uplift_deciles",
    "Uplift modeling readout: users ranked by a targeting score "
    "(pre-period spend), bucketed into NTILE-identical deciles via "
    "the two-phase global rank (operators/ranking.py — no single-"
    "partition sort), and per decile the treated-vs-control outcome "
    "means (post-period purchase cents) plus the CUMULATIVE uplift "
    "curve — the Qini/uplift-decile table targeting campaigns are "
    "judged by. Counts and cent sums stay exact BIGINT through the "
    "10-row cumulative window; each emitted mean/uplift is one fixed "
    "IEEE tree with zero-count guards. One fact scan to user grain; "
    "everything after is bounded by 10 rows.",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm,
             COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) AS score,
             COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                               AND event_type = 'purchase'
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
      FROM events GROUP BY user_id
    ),
    deciled AS (
      SELECT arm, y,
             NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
      FROM u
    ),
    cells AS (
      SELECT decile,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nt,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS nc,
             SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS yt,
             SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS yc
      FROM deciled GROUP BY decile
    ),
    cum AS (
      SELECT decile, nt, nc, yt, yc,
             SUM(nt) OVER (ORDER BY decile) AS cnt,
             SUM(nc) OVER (ORDER BY decile) AS cnc,
             SUM(yt) OVER (ORDER BY decile) AS cyt,
             SUM(yc) OVER (ORDER BY decile) AS cyc
      FROM cells
    )
    SELECT decile,
           CAST(nt AS BIGINT) AS n_treat,
           CAST(nc AS BIGINT) AS n_ctrl,
           CASE WHEN nt = 0 OR nc = 0 THEN 0.0
                ELSE (CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)
                      - CAST(yc AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0
           END AS uplift_per_user,
           CASE WHEN cnt = 0 OR cnc = 0 THEN 0.0
                ELSE (CAST(cyt AS DOUBLE) / CAST(cnt AS DOUBLE)
                      - CAST(cyc AS DOUBLE) / CAST(cnc AS DOUBLE)) / 100.0
           END AS cum_uplift_per_user
    FROM cum
    """,
)
def q_qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators.ranking import (
        equidepth_bucket,
        two_phase_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, cents)), F.lit(0)).alias("score"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ts") >= cut) & (F.col("event_type") == "purchase"), cents
                )
            ),
            F.lit(0),
        ).alias("y"),
    ).select(
        _hash_mod(F.col("user_id"), 2).alias("arm"),
        "user_id",
        "score",
        "y",
        (-F.col("score")).alias("negscore"),
    )
    ranked, total = two_phase_rank(
        u, order_by=["negscore", "user_id"], coarse=F.expr("negscore DIV 10000")
    )
    deciled = ranked.withColumn(
        "decile", equidepth_bucket(F.col("global_rank"), total, 10)
    )
    cells = deciled.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("yt"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("yc"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "decile",
        "nt",
        "nc",
        "yt",
        "yc",
        F.sum("nt").over(wd).alias("cnt"),
        F.sum("nc").over(wd).alias("cnc"),
        F.sum("yt").over(wd).alias("cyt"),
        F.sum("yc").over(wd).alias("cyc"),
    )
    uplift = (
        F.col("yt").cast("double") / F.col("nt").cast("double")
        - F.col("yc").cast("double") / F.col("nc").cast("double")
    ) / 100.0
    cum_uplift = (
        F.col("cyt").cast("double") / F.col("cnt").cast("double")
        - F.col("cyc").cast("double") / F.col("cnc").cast("double")
    ) / 100.0
    return cum.select(
        "decile",
        F.col("nt").cast("bigint").alias("n_treat"),
        F.col("nc").cast("bigint").alias("n_ctrl"),
        F.when((F.col("nt") == 0) | (F.col("nc") == 0), F.lit(0.0))
        .otherwise(uplift)
        .alias("uplift_per_user"),
        F.when((F.col("cnt") == 0) | (F.col("cnc") == 0), F.lit(0.0))
        .otherwise(cum_uplift)
        .alias("cum_uplift_per_user"),
    )


# ---------------------------------------------------------------------------
# Recommendation diversity / coverage eval
# ---------------------------------------------------------------------------


@register(
    "recsys_diversity_eval",
    "Recommendation-quality companions to accuracy: per query, the "
    "intra-list similarity (mean pairwise cosine among its exact "
    "top-5 neighbors — low = diverse results) and the global catalog "
    "coverage of all recommended items. Pairwise cosines are floor-"
    "quantized to ppm BEFORE averaging (rule 5: floor, not round; "
    "and summing already-quantized integers sidesteps double "
    "summation order, rule 1). The pair fan-out is C(5,2)=10 rows "
    "per query — metric cost is per-list constant; the two vector "
    "re-joins shuffle on vec_id only.",
    f"""
    WITH w AS ({_DUCK_Q}),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                  ORDER BY {_DUCK_COS} DESC, a.vec_id) AS rank
        FROM w a JOIN w b ON b.vec_id < 10 AND a.vec_id <> b.vec_id
      ) WHERE rank <= 5
    ),
    pairs AS (
      SELECT t1.query_id, t1.neighbor_id AS id_a, t2.neighbor_id AS id_b
      FROM truth t1 JOIN truth t2
        ON t2.query_id = t1.query_id AND t1.neighbor_id < t2.neighbor_id
    ),
    paircos AS (
      SELECT p.query_id,
             CAST(floor(({_DUCK_COS}) * 1000000) AS BIGINT) AS cos_ppm
      FROM pairs p
      JOIN w a ON a.vec_id = p.id_a
      JOIN w b ON b.vec_id = p.id_b
    ),
    cov AS (
      SELECT CAST(COUNT(DISTINCT neighbor_id) AS BIGINT) AS n_recommended,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS corpus_size
      FROM truth
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(cos_ppm) {{div}} COUNT(*) AS BIGINT) AS ils_ppm,
           c.n_recommended,
           CAST(c.n_recommended * 1000000 {{div}} c.corpus_size AS BIGINT)
             AS coverage_ppm
    FROM paircos CROSS JOIN cov c
    GROUP BY query_id, c.n_recommended, c.corpus_size
    """.format(div="//"),
)
def q_recsys_diversity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_seattle_call_data_spark.operators import similarity
    from etl_seattle_call_data_spark.operators.similarity import _dot, with_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < 10)
    truth = similarity.cosine_topk(emb, qset, k=5).select("query_id", "neighbor_id")
    pairs = (
        truth.alias("t1")
        .join(
            truth.alias("t2"),
            (F.col("t2.query_id") == F.col("t1.query_id"))
            & (F.col("t1.neighbor_id") < F.col("t2.neighbor_id")),
        )
        .select(
            F.col("t1.query_id").alias("query_id"),
            F.col("t1.neighbor_id").alias("id_a"),
            F.col("t2.neighbor_id").alias("id_b"),
        )
    )
    w = with_quantized(emb).select("vec_id", "qvec", "qnorm2")
    a = w.select(
        F.col("vec_id").alias("id_a"), F.col("qvec").alias("va"), F.col("qnorm2").alias("na")
    )
    b = w.select(
        F.col("vec_id").alias("id_b"), F.col("qvec").alias("vb"), F.col("qnorm2").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb"), None).cast("double") / F.sqrt(
        (F.col("na") * F.col("nb")).cast("double")
    )
    paircos = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("query_id", F.floor(cos * 1000000).cast("bigint").alias("cos_ppm"))
    )
    cov = truth.agg(
        F.countDistinct("neighbor_id").cast("bigint").alias("n_recommended")
    ).crossJoin(F.broadcast(emb.agg(F.count(F.lit(1)).cast("bigint").alias("corpus_size"))))
    return (
        paircos.crossJoin(F.broadcast(cov))
        .groupBy("query_id", "n_recommended", "corpus_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("CAST(SUM(cos_ppm) DIV COUNT(*) AS BIGINT)").alias("ils_ppm"),
        )
        .select(
            "query_id",
            "n_pairs",
            "ils_ppm",
            "n_recommended",
            F.expr("CAST(n_recommended * 1000000 DIV corpus_size AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Delta-encoding layout savings
# ---------------------------------------------------------------------------


@register(
    "delta_encoding_stats",
    "Storage-layout evidence: how many bits per timestamp a delta "
    "encoding would save if the event stream were laid out sorted by "
    "(user, time) — per event type, the mean bit-width of raw epoch-"
    "micro values vs successive per-user deltas, and the savings in "
    "ppm. Bit-width is length(bin(v)) — exact integer rendering on "
    "both engines (the zipf-profile idiom), no logs. This is the "
    "measurement behind choosing DELTA_BINARY_PACKED over PLAIN for "
    "parquet timestamp columns. One per-user window pass (lag), one "
    "5-row aggregate; deltas are non-negative by construction of the "
    "ordering.",
    """
    WITH e AS (
      SELECT event_type, user_id, event_id, epoch_us(ts) AS tu
      FROM events
    ),
    d AS (
      SELECT event_type,
             length(bin(tu)) AS raw_bits,
             length(bin(tu - lag(tu) OVER (PARTITION BY user_id
                                           ORDER BY tu, event_id))) AS delta_bits
      FROM e
    )
    SELECT event_type,
           CAST(COUNT(delta_bits) AS BIGINT) AS n_deltas,
           CAST(SUM(CASE WHEN delta_bits IS NOT NULL THEN raw_bits END)
                AS DOUBLE) / CAST(COUNT(delta_bits) AS DOUBLE) AS avg_raw_bits,
           CAST(SUM(delta_bits) AS DOUBLE) / CAST(COUNT(delta_bits) AS DOUBLE)
             AS avg_delta_bits,
           CAST((SUM(CASE WHEN delta_bits IS NOT NULL THEN raw_bits END)
                 - SUM(delta_bits)) * 1000000
                // SUM(CASE WHEN delta_bits IS NOT NULL THEN raw_bits END)
                AS BIGINT) AS savings_ppm
    FROM d
    GROUP BY event_type
    """,
)
def q_delta_encoding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", "user_id", "event_id", F.unix_micros("ts").alias("tu")
    )
    wu = Window.partitionBy("user_id").orderBy("tu", "event_id")
    d = e.select(
        "event_type",
        F.length(F.bin(F.col("tu"))).alias("raw_bits"),
        F.length(F.bin(F.col("tu") - F.lag("tu").over(wu))).alias("delta_bits"),
    )
    return d.groupBy("event_type").agg(
        F.count("delta_bits").cast("bigint").alias("n_deltas"),
        (
            F.sum(F.when(F.col("delta_bits").isNotNull(), F.col("raw_bits"))).cast(
                "double"
            )
            / F.count("delta_bits").cast("double")
        ).alias("avg_raw_bits"),
        (F.sum("delta_bits").cast("double") / F.count("delta_bits").cast("double")).alias(
            "avg_delta_bits"
        ),
        F.expr(
            "CAST((SUM(CASE WHEN delta_bits IS NOT NULL THEN raw_bits END)"
            " - SUM(delta_bits)) * 1000000"
            " DIV SUM(CASE WHEN delta_bits IS NOT NULL THEN raw_bits END)"
            " AS BIGINT)"
        ).alias("savings_ppm"),
    )
