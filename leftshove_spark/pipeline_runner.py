"""Config-driven corpus-pipeline composition — the engine's analog of
the reference's configuration-as-schema posture (SURVEY §1.4): the
reference turns a config into generated Benthos input→processor→output
pipelines (benthos.go:26-73); this module turns a declarative stage
list into the composed DataFrame plan of the corpus operators, so a
curation pipeline is DATA (reviewable, diffable, replayable), not an
ad-hoc script.

    spec = [
        {"op": "quality_filter", "min_tokens": 20},
        {"op": "near_dedup", "jaccard_threshold": 0.6},
        {"op": "decontaminate", "benchmark": bench_df},
        {"op": "outlier_gate", "c_num": 6},
        {"op": "hash_split"},
        {"op": "token_budget_cap", "budget_per_group": 100_000,
         "group_cols": "source", "weight_col": "n_chars"},
    ]
    result = run_pipeline(spark, docs, spec)
    result.df            # the composed frame (lazy — one plan)
    result.counts        # per-stage row accounting (forced)

Every stage maps onto an operator that is individually oracled or
pytest-pinned; the runner adds only composition and accounting, no new
semantics. Stages are applied in list order; each receives the prior
stage's frame. Unknown ops or parameters fail fast with the available
choices — config errors must not become silent no-ops at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_quality_filter(spark, df, **kw):
    from .ext.text import quality_filter

    kept = quality_filter(df, **kw).select("doc_id")
    return df.join(kept, "doc_id")


def _stage_exact_dedup(spark, df, **kw):
    from .ext.dedup import exact_dedup

    return exact_dedup(df, **kw)


def _stage_near_dedup(spark, df, **kw):
    from .ext.dedup import minhash_lsh_pairs
    from .ext.graph import connected_components, resolve_keep_one_per_component

    pairs = minhash_lsh_pairs(df, **kw)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return resolve_keep_one_per_component(df, comp)


def _stage_decontaminate(spark, df, *, benchmark, **kw):
    from .ext.pipeline import decontaminate

    hits = decontaminate(df, benchmark, **kw).select("doc_id")
    return df.join(hits, "doc_id", "left_anti")


def _stage_outlier_gate(spark, df, *, value_col="n_chars", group_cols=("lang",), **kw):
    from .operators.analytic import mad_outliers

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    flags = mad_outliers(
        df.select("doc_id", *gcols, F.col(value_col).cast("long").alias("__v")),
        "__v",
        gcols,
        **kw,
    )
    drop = flags.filter(F.col("is_outlier")).select("doc_id")
    return df.join(drop, "doc_id", "left_anti")


def _stage_pii_redact(spark, df, *, text_col="text", **kw):
    from .ext.pipeline import redact

    return df.withColumn(text_col, redact(F.col(text_col)))


def _stage_hash_split(spark, df, **kw):
    from .ext.pipeline import hash_split

    return hash_split(df, **kw)


def _stage_mixture_sample(spark, df, **kw):
    from .ext.pipeline import mixture_sample

    picked = mixture_sample(df, **kw).select("doc_id")
    return df.join(picked, "doc_id")


def _stage_token_budget_cap(spark, df, **kw):
    from .ext.pipeline import token_budget_cap

    return token_budget_cap(df, **kw)


def _stage_weighted_sample(spark, df, *, k, weight_col, **kw):
    from .ext.pipeline import weighted_systematic_sample

    picked = weighted_systematic_sample(df, k, weight_col, **kw).select("doc_id")
    return df.join(picked, "doc_id")


def _stage_sample_k_per_group(spark, df, **kw):
    from .ext.pipeline import sample_k_per_group

    return sample_k_per_group(df, **kw)


STAGES = {
    "quality_filter": _stage_quality_filter,
    "exact_dedup": _stage_exact_dedup,
    "near_dedup": _stage_near_dedup,
    "decontaminate": _stage_decontaminate,
    "outlier_gate": _stage_outlier_gate,
    "pii_redact": _stage_pii_redact,
    "hash_split": _stage_hash_split,
    "mixture_sample": _stage_mixture_sample,
    "token_budget_cap": _stage_token_budget_cap,
    "weighted_sample": _stage_weighted_sample,
    "sample_k_per_group": _stage_sample_k_per_group,
}


@dataclass
class PipelineResult:
    df: DataFrame
    counts: dict[str, int] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    spec: list[dict],
    *,
    count_stages: bool = True,
) -> PipelineResult:
    """Apply ``spec``'s stages in order; returns the composed frame and
    (when ``count_stages``) per-stage row accounting keyed
    ``<idx>_<op>`` plus ``ingested``. Counting forces each stage once
    — turn it off for one fused lazy plan in production and read the
    counts from the sink instead."""
    counts: dict[str, int] = {}
    if count_stages:
        counts["ingested"] = docs.count()
    out = docs
    for i, stage in enumerate(spec):
        stage = dict(stage)
        try:
            op = stage.pop("op")
        except KeyError:
            raise ValueError(f"stage {i}: missing 'op' key: {stage}") from None
        try:
            fn = STAGES[op]
        except KeyError:
            raise ValueError(
                f"stage {i}: unknown op {op!r}; available: {sorted(STAGES)}"
            ) from None
        try:
            out = fn(spark, out, **stage)
        except TypeError as e:
            raise ValueError(f"stage {i} ({op}): bad parameters {stage}: {e}") from e
        if count_stages:
            counts[f"{i}_{op}"] = out.count()
    return PipelineResult(df=out, counts=counts)
