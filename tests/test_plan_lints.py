"""Structural plan lints over EVERY gated query: the scale disciplines
SCALE.md claims, asserted on the actual physical plans.

- No ``BatchEvalPython`` / ``PythonUDF`` row-at-a-time evaluation: the
  only sanctioned Python surfaces are Arrow-batched (MapInPandas /
  FlatMapGroupsInPandas / ArrowEvalPython for pandas_udf).
- No ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: every join in
  the gate corpus is keyed (hash/broadcast/sort-merge) — an all-pairs
  shape slipping into a gated plan is a scale regression, not a
  strategy choice (the deliberate O(N²) verifier tiles pairs inside
  applyInPandas, never through a join operator).

Plans are built (analysis + physical planning) without execution, so
the whole 83-query sweep costs seconds per query, not job time.
"""

import pytest

import __spark_entry__ as entrymod

from conftest import SF0001

QUERIES = entrymod.queries()

_ROW_UDF_MARKERS = ("BatchEvalPython",)
_ALL_PAIRS_MARKERS = ("CartesianProduct", "BroadcastNestedLoopJoin")

# BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side is
# bounded by construction — a single-row scalar aggregate or a
# deliberately-broadcast bounded query set. The "nested loop" then
# iterates over one (or k) broadcast rows per stream row: linear, not
# quadratic. Every entry here names its bounded side.
_BNLJ_ALLOWED = {
    # single-row global-scalar aggregate joined on a constant key
    # (Catalyst folds lit(1)=lit(1) away, leaving a conditionless BNLJ
    # over ONE broadcast row); the theta filter (value > scalar) rides
    # the same join
    "q11_important_parts",
    "q22_dormant_customers",
    # single-row min(n_s) rate anchor, same constant-key shape
    "x_mixture_sample",
    # same single-row min(n_s) anchor (the α=1/2 flattening rides the
    # identical broadcast rate-table plan)
    "x_temperature_mixture",
    # single-row (n_docs, total_tokens) stats joined to the
    # ≤|query_terms|-row df table — x_tfidf_search's constant-key shape
    "x_bm25_search",
    # single-row target-total joined to the ≤n_buckets-row target count
    # table (both broadcast, both corpus-independent)
    "x_target_affinity",
    # same shape: single-row reference-model total joined constant-key
    # to the ≤n_buckets-row model table AND to the exploded bigrams for
    # the unseen-bucket default weight — ONE broadcast row per stream
    # row, linear
    "x_lm_quality_score",
    # embeds x_target_affinity's scalar joins; the PPS stage itself is
    # keyed (the X44 machinery)
    "x_dsir_sample",
    # single-row corpus-count joined to the ≤|query_terms|-row
    # document-frequency table, same constant-key shape
    "x_tfidf_search",
    # fuses the two shapes above: embeds x_tfidf_search's constant-key
    # scalar AND the bounded brute-force vector baseline (one query
    # vector broadcast against the corpus)
    "x_hybrid_search_rrf",
    # single-row exact-pair-count scalar joined on a constant key
    # (same shape as the ANN recall metrics)
    "x_dedup_minhash_recall",
    # four single-row integrity counts assembled on a constant key
    "x_integrity_check",
    # the documented brute-force baseline: corpus x broadcast(query
    # set), k queries bounded by the caller — the subquadratic paths
    # are x_knn_lsh / x_knn_ivf
    "x_knn_bruteforce",
    # recall@k metrics: embed the brute-force baseline by construction
    # (exact neighbors ARE the ground truth the metric compares
    # against) plus two single-row constant-key scalar joins
    "x_ann_recall",
    "x_ann_recall_lsh",
    "x_ann_recall_ivfadc",
    # embeds the brute-force pool (bounded query set broadcast against
    # the corpus) — the miner's point is an EXACT pool; the IVFADC
    # swap documented in the operator is the scale path
    "x_hard_negatives",
    # group-pair inequality join over the O(groups) sketch table (5
    # langs -> 10 pairs) — pairwise similarity matrices ARE O(groups²)
    # output by definition; the corpus itself is touched only by the
    # keyed distinct-collapse and the keyed exact-Jaccard join
    "x_kmv_jaccard",
    # (x_knn_pq / x_knn_pq_rerank left this list in r10: the ADC
    # lookup is now a materialized relation probed via broadcast HASH
    # joins on the code columns — no nested-loop join remains)
    # the per-group threshold GENERATOR: range(k) × the broadcast
    # O(groups) totals table — both sides bounded by construction
    # (k is a literal, totals is one row per group), producing the
    # groups·k threshold table; the corpus itself joins only through
    # the keyed (group, bucket) equi-join
    "x_stratified_pps",
}


def _plan(gate_build, name):
    # session-cached build (conftest.gate_build, r17): both lint
    # sweeps and the oracle/schema sweeps read the SAME built frame —
    # the constructor's Spark actions (folds, ANN training) run once
    # per suite instead of once per sweep
    df = gate_build(name)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_single_partition_exchanges_carry_partials_only(spark, gate_build, name):
    """Every ``Exchange SinglePartition`` in a gated plan must be fed by
    a PARTIAL aggregate — i.e. it moves O(partitions) pre-aggregated
    rows, never the data. A single-partition exchange over raw rows is
    the global-sort / global-window anti-pattern (one task owns the
    corpus); the engine's answer to those shapes is exact_global_rank /
    TakeOrderedAndProject. Audited round 7: 17 of 99 plans have such
    exchanges, all fed by partial_* aggregates."""
    p = _plan(gate_build, name)
    lines = p.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "partial_" in child, (
            f"{name}: Exchange SinglePartition fed by non-partial child "
            f"{child.strip()[:80]!r} — a full-data single-partition stage "
            "entered a gated plan (see SCALE.md global posture)"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_row_udf_and_no_all_pairs_join(spark, gate_build, name):
    p = _plan(gate_build, name)
    markers = _ROW_UDF_MARKERS + (
        ("CartesianProduct",)
        if name in _BNLJ_ALLOWED
        else _ALL_PAIRS_MARKERS
    )
    hits = [m for m in markers if m in p]
    assert not hits, (
        f"{name}: plan contains {hits} — row-at-a-time Python or an "
        "unkeyed join entered a gated query (see SCALE.md global posture)"
    )
