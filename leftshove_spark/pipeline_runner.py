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


# Every wrapper declares its FULL parameter surface explicitly (no
# **kwargs pass-through): run_pipeline binds the config against these
# signatures, so a typo'd parameter is a config error caught before
# anything runs, while a TypeError raised inside an operator surfaces
# as the implementation error it is.


def _stage_quality_filter(
    spark, df, *, text_col="text", id_col="doc_id",
    min_tokens=20, min_uniq_ratio=0.5, min_quality=0.3,
):
    # Filter-in-place (r17, guide §2.4): the former kept-ids join-back
    # scanned the corpus twice (plan: scan ⋈ MapInPandas(scan)) and,
    # mid-pipeline, duplicated the whole upstream subtree on both join
    # sides. quality_keep_col evaluates the SAME _doc_stats_py bits the
    # stats operator emits, as one Arrow predicate on the frame itself:
    # one pass, no join, identical survivors (pytest-pinned parity).
    from .ext.text import quality_keep_col

    return df.filter(
        quality_keep_col(
            text_col, min_tokens=min_tokens,
            min_uniq_ratio=min_uniq_ratio, min_quality=min_quality,
        )
    )


def _stage_exact_dedup(spark, df, *, content_col="text", id_col="doc_id"):
    # keep the SURVIVING ROWS (min id per distinct content), not the
    # collapsed (hash, len, keep_id, n_copies) relation — every stage
    # receives and passes on the corpus frame (r13: the old frame
    # replacement broke any stage downstream of exact_dedup; the
    # composed gate entry x_pipeline_curation now exercises this).
    # ONE shuffle: rank within (hash, len) groups and keep the min-id
    # row directly — the operator's groupBy + a second id-keyed semi
    # join would pay two corpus-sized exchanges for the same rows.
    # Same birthday-safe (60-bit hash, length) co-key as
    # ext.dedup.exact_dedup.
    from pyspark.sql import Window

    from .ext.hashing import hash60

    w = Window.partitionBy(
        hash60(F.col(content_col)), F.length(content_col)
    ).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _stage_near_dedup(
    spark, df, *, content_col="text", id_col="doc_id", jaccard_threshold=0.6
):
    from .ext.dedup import minhash_lsh_pairs
    from .ext.graph import connected_components, resolve_keep_one_per_component

    pairs = minhash_lsh_pairs(df, content_col, id_col, jaccard_threshold)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return resolve_keep_one_per_component(df, comp, id_col)


def _stage_decontaminate(
    spark, df, *, benchmark, text_col="text", id_col="doc_id", n=3
):
    # Filter-in-place (r17, guide §2.4): the former anti-join of the
    # flagged ids back against the stage's own input recomputed the
    # ENTIRE upstream plan (quality gate + dedup window) on both join
    # sides and paid a corpus-sized anti-join exchange. The keep column
    # runs the same map-only n-gram collision test (shared
    # _benchmark_hash_array / _shingles_py) as one Arrow predicate on
    # the frame itself: one pass, no join, no upstream duplication.
    from .ext.pipeline import decontaminate_keep_col

    return df.filter(decontaminate_keep_col(benchmark, text_col, n))


def _stage_decontaminate_semantic(
    spark,
    df,
    *,
    benchmark_emb,
    embeddings,
    threshold=0.95,
    id_col="doc_id",
    emb_id_col="vec_id",
    vec_col="embedding",
    dim=None,
):
    """Embedding-based decontamination (X64): flag corpus docs whose
    embedding sits within ``threshold`` cosine of any benchmark
    embedding, then anti-join the flagged ids out — catches the
    paraphrased/translated leakage the n-gram stage cannot.
    ``embeddings`` maps the pipeline's docs to vectors (join on
    id_col = emb_id_col); ``benchmark_emb`` is the eval set's
    embedding relation (small — broadcast by the operator)."""
    from .ext.pipeline import decontaminate_semantic

    corpus_emb = embeddings.join(
        df.select(F.col(id_col).alias(emb_id_col)), emb_id_col, "left_semi"
    )
    flagged = decontaminate_semantic(
        corpus_emb,
        benchmark_emb,
        threshold=threshold,
        id_col=emb_id_col,
        vec_col=vec_col,
        dim=dim,
    ).select(F.col(emb_id_col).alias(id_col))
    return df.join(flagged, id_col, "left_anti")


def _stage_outlier_gate(
    spark, df, *, value_col="n_chars", group_cols=("lang",), c_num=3, c_den=1
):
    from .operators.analytic import mad_outliers

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    flags = mad_outliers(
        df.select("doc_id", *gcols, F.col(value_col).cast("long").alias("__v")),
        "__v",
        gcols,
        c_num=c_num,
        c_den=c_den,
    )
    drop = flags.filter(F.col("is_outlier")).select("doc_id")
    return df.join(drop, "doc_id", "left_anti")


def _stage_pii_redact(spark, df, *, text_col="text"):
    from .ext.pipeline import redact

    return df.withColumn(text_col, redact(F.col(text_col)))


def _stage_hash_split(spark, df, *, id_col="doc_id", train=0.9, val=0.05):
    from .ext.pipeline import hash_split

    return hash_split(df, id_col, train, val)


def _stage_split_by_component(
    spark, df, *, components, id_col="doc_id", train=0.9, val=0.05
):
    # leakage-proof split: the hash_split assignment applied to the
    # near-dup CLUSTER representative, so duplicates never straddle a
    # split boundary (components from ext.graph.connected_components)
    from .ext.pipeline import split_by_component

    return split_by_component(df, components, id_col, train, val)


def _stage_mixture_sample(
    spark, df, *, source_col="source", id_col="doc_id", targets=None
):
    from .ext.pipeline import mixture_sample

    picked = mixture_sample(df, source_col, id_col, targets).select(id_col)
    return df.join(picked, id_col)


def _stage_token_budget_cap(
    spark, df, *, budget_per_group, group_cols,
    weight_col="n_tokens", id_col="doc_id",
):
    from .ext.pipeline import token_budget_cap

    return token_budget_cap(df, budget_per_group, group_cols, weight_col, id_col)


def _stage_weighted_sample(spark, df, *, k, weight_col, id_col="doc_id"):
    from .ext.pipeline import weighted_systematic_sample

    picked = weighted_systematic_sample(df, k, weight_col, id_col).select(id_col)
    return df.join(picked, id_col)


def _stage_sample_k_per_group(spark, df, *, group_cols, k, id_col="doc_id"):
    from .ext.pipeline import sample_k_per_group

    return sample_k_per_group(df, group_cols, k, id_col)


def _stage_substring_redact(
    spark, df, *, text_col="text", id_col="doc_id",
    window=20, min_docs=2, max_window_df=None,
):
    # the Lee-et-al exact-substring REMEDY as a pipeline stage: text is
    # REPLACED by the redacted token stream (rows whose every token was
    # duplicated survive with empty text — dropping is a quality_filter
    # decision, not a redaction one)
    from .ext.dedup import redact_duplicated_spans

    red = redact_duplicated_spans(
        df, text_col, id_col, window=window, min_docs=min_docs,
        max_window_df=max_window_df,
    ).select(id_col, "text_redacted")
    return (
        df.join(red, id_col, "left")
        .withColumn(text_col, F.coalesce("text_redacted", F.col(text_col)))
        .drop("text_redacted")
    )


def _stage_temperature_mixture(
    spark, df, *, source_col="source", id_col="doc_id", alpha=0.5
):
    from .ext.pipeline import temperature_mixture_sample

    picked = temperature_mixture_sample(df, source_col, id_col, alpha).select(id_col)
    return df.join(picked, id_col)


def _stage_dsir_sample(
    spark, df, *, target, k, text_col="text", id_col="doc_id", n_buckets=4096
):
    from .ext.pipeline import dsir_sample

    picked = dsir_sample(
        df, target, k, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    ).select(id_col)
    return df.join(picked, id_col)


def _stage_lm_quality_gate(
    spark, df, *, reference, max_ppl_proxy, text_col="text", id_col="doc_id",
    n_buckets=4096, keep_short=False,
):
    # CCNet-style quality gate: keep documents whose perplexity proxy
    # under the reference bigram model clears the threshold. Docs with
    # < 2 tokens carry a NULL proxy — dropped by default (no evidence
    # of quality), kept when keep_short is set.
    from .ext.pipeline import lm_quality_score

    scored = lm_quality_score(
        df, reference, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    cond = F.col("ppl_proxy") <= max_ppl_proxy
    if keep_short:
        cond = cond | F.col("ppl_proxy").isNull()
    kept = scored.filter(cond).select(id_col)
    return df.join(kept, id_col)


def _stage_interleave(
    spark, df, *, weights, source_col="source", id_col="doc_id",
    pos_col="interleave_pos",
):
    # ORDER stage: appends the deterministic weighted-fair training
    # position; rows are untouched otherwise (terminal by convention —
    # downstream filters would leave position gaps, which consumers
    # ordering by pos_col tolerate)
    from .ext.pipeline import interleave_sources

    return interleave_sources(df, weights, source_col, id_col, pos_col)


def _stage_fingerprint(
    spark, df, *, content_col="text", id_col="doc_id", group_cols=None
):
    # ACCOUNTING stage: computes the order-insensitive corpus
    # fingerprint as a side artifact (PipelineResult.artifacts
    # ["fingerprint"]) and passes the frame through unchanged — the
    # reproducibility receipt a config-built pipeline ends with
    from .ext.pipeline import dataset_fingerprint

    return df, dataset_fingerprint(df, content_col, id_col, group_cols)


def _stage_bpe_annotate(
    spark,
    df,
    *,
    merges_path=None,
    merges=None,
    text_col="text",
    id_col="doc_id",
):
    """Annotate every document with tokenizer-faithful BPE counts from
    a TRAINED VOCABULARY ARTIFACT (VERDICT r12 next #2): ``merges_path``
    loads a ``merges.txt`` written by :func:`ext.text.
    bpe_train_scalable` (or any HF-format tokenizer export);
    ``merges`` passes the table in-memory. Downstream budget stages
    (``token_budget_cap`` with ``weight_col="n_tokens_bpe"``,
    ``mixture_sample``) then run on counts matching what the real
    tokenizer will emit, not the regex proxy."""
    from .ext.text import bpe_token_counts, load_merges_file

    if (merges_path is None) == (merges is None):
        raise ValueError(
            "bpe_annotate needs exactly one of merges_path / merges"
        )
    table = load_merges_file(merges_path) if merges_path else list(merges)
    counts = bpe_token_counts(df, table, text_col, id_col)
    return df.join(counts, id_col)


# Stages whose wrapper returns (frame, artifact) instead of a frame:
# the artifact lands in PipelineResult.artifacts[op], the frame flows on.
ARTIFACT_STAGES = {"fingerprint"}

STAGES = {
    "quality_filter": _stage_quality_filter,
    "exact_dedup": _stage_exact_dedup,
    "near_dedup": _stage_near_dedup,
    "decontaminate": _stage_decontaminate,
    "decontaminate_semantic": _stage_decontaminate_semantic,
    "outlier_gate": _stage_outlier_gate,
    "pii_redact": _stage_pii_redact,
    "hash_split": _stage_hash_split,
    "split_by_component": _stage_split_by_component,
    "mixture_sample": _stage_mixture_sample,
    "token_budget_cap": _stage_token_budget_cap,
    "weighted_sample": _stage_weighted_sample,
    "sample_k_per_group": _stage_sample_k_per_group,
    "substring_redact": _stage_substring_redact,
    "temperature_mixture": _stage_temperature_mixture,
    "dsir_sample": _stage_dsir_sample,
    "lm_quality_gate": _stage_lm_quality_gate,
    "interleave": _stage_interleave,
    "fingerprint": _stage_fingerprint,
    "bpe_annotate": _stage_bpe_annotate,
}


@dataclass
class PipelineResult:
    df: DataFrame
    counts: dict[str, int] = field(default_factory=dict)
    artifacts: dict[str, DataFrame] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    spec: list[dict],
    *,
    count_stages: bool = True,
) -> PipelineResult:
    """Apply ``spec``'s stages in order; returns the composed frame and
    (when ``count_stages``) per-stage row accounting keyed
    ``<idx>_<op>`` plus ``ingested``.

    Counting mode persists each stage's frame (via the engine's pin
    registry — ``ext.cache.release_pins()`` frees everything) before
    counting and unpersists its predecessor once consumed, so an
    n-stage pipeline executes each stage ONCE (a naive count-per-stage
    re-executes the whole uncached prefix per count — O(n²) stage
    executions); the final frame stays pinned for the caller. Turn
    counting off for one fused lazy plan in production and read the
    counts from the sink instead.

    Stage parameters are validated against the operator's signature
    BEFORE the call, so a config typo reports as a config error while
    a TypeError raised inside an operator still surfaces as the
    implementation error it is."""
    import inspect

    counts: dict[str, int] = {}
    artifacts: dict[str, DataFrame] = {}
    if count_stages:
        counts["ingested"] = docs.count()
    out, prev_cached = docs, None
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
            inspect.signature(fn).bind(spark, out, **stage)
        except TypeError as e:
            raise ValueError(
                f"stage {i} ({op}): bad parameters {stage}: {e}"
            ) from e
        if op in ARTIFACT_STAGES:
            out, artifacts[op] = fn(spark, out, **stage)
        else:
            out = fn(spark, out, **stage)
        if count_stages:
            from .ext.cache import pin

            out = pin(out)
            counts[f"{i}_{op}"] = out.count()
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = out
    return PipelineResult(df=out, counts=counts, artifacts=artifacts)
