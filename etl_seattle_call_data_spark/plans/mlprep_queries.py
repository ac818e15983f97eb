"""Fourth-wave ML-corpus coverage: readability scoring, corpus bigram
statistics, vocabulary coverage, per-source quota capping, per-label
embedding centroids, and statistical anomaly flagging over the event
stream.

Cross-engine rules from plans/queries.py apply. Float-producing queries
derive every double from exact integer/decimal components with the same
operation order on both engines, so the driver's value-hash matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.operators import sampling, similarity, text
from etl_seattle_call_data_spark.plans.docs_queries import _DUCK_TOKENS
from etl_seattle_call_data_spark.plans.queries import register
from etl_seattle_call_data_spark.sources.registry import load_table

# DuckDB mirror of text.bigrams: 1-indexed lists, range(1, n) is empty
# for n <= 1 so short docs yield [] without a guard.
_DUCK_BIGRAMS = (
    f"list_transform(range(1, len({_DUCK_TOKENS})), "
    f"i -> {_DUCK_TOKENS}[i] || ' ' || {_DUCK_TOKENS}[i + 1])"
)


@register(
    "doc_readability",
    "Flesch-style readability per document from portable regex counts "
    "(words / sentence-punctuation runs / vowel-group syllable proxy). "
    "Pure per-row map — no shuffle, whole-stage codegen "
    "(operators/text.py::readability).",
    f"""
    SELECT doc_id, n_words, n_sentences, n_vowel_groups,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(greatest(n_sentences, 1) AS DOUBLE))
             - 84.6 * (CAST(n_vowel_groups AS DOUBLE)
                       / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch
    FROM (
      SELECT doc_id,
             CAST(len({_DUCK_TOKENS}) AS INTEGER) AS n_words,
             CAST(len(regexp_extract_all(text, '[.!?]+')) AS INTEGER) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER)
               AS n_vowel_groups
      FROM documents
    )
    """,
)
def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.readability(docs)


@register(
    "ngram_top_bigrams",
    "Corpus-wide top-20 adjacent-token bigrams — the n-gram frequency "
    "table that drives boilerplate detection and LM smoothing. One "
    "explode, map-side partial counts before the single shuffle on the "
    "bigram key, then a 20-row global top-k with lexicographic "
    "tie-break.",
    f"""
    SELECT bigram, n FROM (
      SELECT bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rk
      FROM (SELECT unnest({_DUCK_BIGRAMS}) AS bigram FROM documents)
      GROUP BY bigram
    ) WHERE rk <= 20
    """,
)
def q_ngram_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(text.bigrams("text")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # 20-row result: orderBy+limit is a global top-k (TakeOrdered — no
    # full sort materialization), tie-broken lexicographically.
    return counts.orderBy(F.col("n").desc(), "bigram").limit(20).select("bigram", "n")


_VOCAB_SIZE = 100


@register(
    "vocab_coverage",
    f"Vocabulary coverage per source: corpus top-{_VOCAB_SIZE} tokens by "
    "frequency (deterministic count-then-token tie-break) form the "
    "vocab; each source reports how many of its token instances the "
    "vocab covers. Two shuffles (token counts, per-source rollup); the "
    f"{_VOCAB_SIZE}-row vocab broadcasts into the coverage join.",
    f"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_TOKENS}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM tok GROUP BY tok
      ) WHERE rk <= {_VOCAB_SIZE}
    )
    SELECT source,
           COUNT(*) AS total_tokens,
           CAST(SUM(CASE WHEN vocab.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS covered_tokens,
           CAST(SUM(CASE WHEN vocab.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS coverage
    FROM tok LEFT JOIN vocab USING (tok)
    GROUP BY source
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(text.tokens("text")).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    covered = F.sum(F.when(F.col("in_vocab").isNotNull(), 1).otherwise(0))
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            covered.alias("covered_tokens"),
            (covered.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "coverage"
            ),
        )
    )


_QUOTA_PER_SOURCE = 50


@register(
    "corpus_source_quota",
    f"Per-source document quota: keep the top {_QUOTA_PER_SOURCE} docs "
    "of each source ranked by (n_chars DESC, doc_id) — the domain-cap "
    "step that stops one crawl domain dominating the training mix. One "
    "shuffle on source, streaming window rank, no global sort "
    "(operators/sampling.py::top_n_per_group).",
    f"""
    SELECT doc_id, source, n_chars, rank FROM (
      SELECT doc_id, source, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank
      FROM documents
    ) WHERE rank <= {_QUOTA_PER_SOURCE}
    """,
)
def q_corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.top_n_per_group(
        docs.select("doc_id", "source", "n_chars"),
        "source",
        [F.col("n_chars").desc(), F.col("doc_id")],
        _QUOTA_PER_SOURCE,
    ).select("doc_id", "source", "n_chars", F.col("rank").cast("int").alias("rank"))


@register(
    "embedding_label_centroids",
    "Per-label embedding centroid, one row per (label, dim): exact "
    "integer mean numerator from quantized dims, one double division at "
    "the end. Explode is 64× rows but partial aggregation combines "
    "map-side before the single (label, dim) shuffle "
    "(operators/similarity.py::label_centroids).",
    """
    SELECT label, dim, COUNT(*) AS n_vecs,
           CAST(SUM(qval) AS BIGINT) AS qsum,
           CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) * 1000 AS DOUBLE) AS centroid
    FROM (
      SELECT label, i AS dim,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS qval
      FROM embeddings, unnest(range(0, len(embedding))) AS t(i)
    )
    GROUP BY label, dim
    """,
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.label_centroids(emb)


@register(
    "anomaly_zscore_events",
    "Statistical outlier flagging: per event_type mean/std, then z = "
    "(v − mean)/std flags |z| > 3. The 5-row stats table broadcasts "
    "back onto the event scan. Exactness: values quantize to 1e-6 "
    "longs and the variance numerator is the EXACT integer "
    "n·Σq² − (Σq)² — a float 'svv/n − mean²' is NOT portable (DuckDB "
    "contracts the multiply-subtract into an FMA, the JVM never does, "
    "and the 1-ulp drift flips the driver's value hash). Only "
    "divisions and sqrt (both correctly rounded) happen in floating "
    "point, in the same order on both engines.",
    """
    WITH q AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000.0) AS BIGINT) AS qv
      FROM events
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(qv AS HUGEINT)) AS sq,
             SUM(CAST(qv AS HUGEINT) * CAST(qv AS HUGEINT)) AS sqq
      FROM q GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean,
             sqrt(CAST(CAST(n AS HUGEINT) * sqq - sq * sq AS DOUBLE)
                  / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
                  / 1000000000000.0) AS std
      FROM stats WHERE n >= 2
    )
    SELECT event_id, q.event_type, value,
           (CAST(qv AS DOUBLE) / 1000000.0 - mean) / std AS zscore
    FROM q JOIN m ON q.event_type = m.event_type
    WHERE std > 0.0
      AND abs((CAST(qv AS DOUBLE) / 1000000.0 - mean) / std) > 3.0
    """,
)
def q_anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "qv", F.round(F.col("value") * 1000000.0).cast("long")
    )
    # q ≤ 1e9 ⇒ q² needs 19 digits; decimal(38,0) sums are exact and the
    # variance numerator (~1e28) stays far under the 38-digit ceiling.
    qd = F.col("qv").cast("decimal(19,0)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qv").cast("decimal(38,0)")).alias("sq"),
        F.sum(qd * qd).alias("sqq"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sq").cast("double") / n_d / F.lit(1000000.0)
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("sqq") - F.col("sq") * F.col("sq")
    )
    std = F.sqrt(var_num.cast("double") / n_d / n_d / F.lit(1000000000000.0))
    m = stats.filter(F.col("n") >= 2).select(
        F.col("event_type").alias("m_event_type"),
        mean.alias("mean"),
        std.alias("std"),
    )
    vq_d = F.col("qv").cast("double") / F.lit(1000000.0)
    z = (vq_d - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(m), ev["event_type"] == F.col("m_event_type"))
        .filter((F.col("std") > 0.0) & (F.abs(z) > 3.0))
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


@register(
    "fuzzy_part_name_pairs",
    "Entity-resolution fuzzy join: distinct part names pair within a "
    "first-token block and keep levenshtein <= 3 — the blocked edit-"
    "distance join that resolves near-identical entity names without "
    "an all-pairs cross join. Candidates scale with block sizes "
    "(bounded by the name vocabulary), never corpus²; both engines "
    "implement classic unweighted Levenshtein so the distance column "
    "is integer-exact.",
    """
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[1] AS blk
      FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q_fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale story: the oracle's first-token block join is quadratic on
    vocabulary-bounded name data (TPC-H first tokens come from a fixed
    ~92-color vocabulary, so block sizes grow LINEARLY with the part
    table — O(n²/92) pairs, the constant-block class the round-8 audit
    flagged). The engine side therefore generates candidates with
    PassJoin chunk keys WITHIN the block
    (operators/dedup.py::passjoin_candidate_pairs — exact recall for
    levenshtein <= 3 by the untouched-chunk pigeonhole), so its
    candidate volume is bounded-constant fan-out + genuinely-near-
    identical content, and the levenshtein verify reproduces the
    oracle's pair set exactly. The quadratic survives only in the
    DuckDB oracle, which runs at gate SFs only."""
    from etl_seattle_call_data_spark.operators import dedup

    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(0).alias("blk")
    ).distinct()
    cand = dedup.passjoin_candidate_pairs(
        names, string_col="p_name", k=3, block_cols=["blk"]
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cand.filter(dist <= 3)
        .select("name_a", "name_b", dist.cast("int").alias("edit_dist"))
    )
