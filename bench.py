"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (plan + execute + drain results) on a
local[$SPARK_GRAFT_CPUS] session and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": <sf>}

Timing methodology: one untimed pass of every headline query amortizes
JVM startup, codegen compilation, and parquet footer caching — the timed
passes measure steady-state scan+shuffle+agg throughput (what a warm
cluster delivers), not first-query JIT. Each query is then timed in
THREE INTERLEAVED whole-list rounds and the per-query MINIMUM reported:
single-shot timings on a shared host swing multi-× with noise bursts
lasting seconds; back-to-back repeats of one query share a burst while
interleaved rounds don't, so min-over-rounds is the robust steady-state
estimator at the same total cost. Each timed run is a cold logical plan
(fresh DataFrame, no .cache()), so no result memoization. Results are
drained via .collect() on bounded outputs (every headline query
aggregates to a small result).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from leftshove_spark import queries as Q  # noqa: E402
from leftshove_spark.ext import cache  # noqa: E402
from leftshove_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the TPC-H-style analytics (shuffle-heavy, the throughput
# story) plus the engine's flagship dedup view and CDC end-to-end shape.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    # round-7: the widest star join (8 tables, two nation roles) and the
    # derived-catalog correlated-min shape — the two new TPC-H plan
    # classes worth a wall-clock row
    "q8_market_share",
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_orders",
    "q19_disjunctive_filter",
    "j3_dedup_latest_window",
    "cdc_at_least_once_dedup",
    "w7_tumbling_window_agg",
    "t1_asof_join_latest_order",
    # round-8: the hot-key as-of form — a new plan class (windows on
    # (key, time bucket) + carry over the key-bucket grid); keep t1 for
    # the round-over-round comparison, t3 rows beside it
    "t3_asof_join_bucketed",
    "x_dedup_minhash_lsh",
    # round-7: the banded-SRP embedding near-dup (the 100 TB ANN-dedup
    # path — candidates from the band-key self-join, never all pairs)
    "x_dedup_embedding_lsh",
    # round-9: duplicated-passage dedup — a new plan class (positional
    # window hashes + doc-frequency groupBy + join-back); the 22 prior
    # headliners stay untouched for round-over-round comparability
    "x_dedup_substring",
    # round-10: two new plan classes, prior rows untouched —
    # the two-level ANN (driver-side Lloyd/codebook training actions +
    # Arrow encode + broadcast-probe ADC + exact rerank) and the
    # semantic dedup (cells + per-cell Arrow matmul pair mining + CC)
    "x_knn_ivfadc_rerank",
    "x_semdedup",
    # round-11 (r10 verdict #7): the gate's only ITERATIVE-join workload
    # (PageRank: per-step edge-keyed join + map-side-combined sum,
    # lineage-truncated rounds) and the broadcast-stats retrieval class
    # (BM25: explode→filter-before-shuffle + saturation arithmetic) —
    # NEW rows; the 25 r10 rows stay untouched for comparability
    "x_pagerank_dedup",
    "x_bm25_search",
    # round-3 breadth: sessionization and grouping-set classes
    "w9_session_window",
    "o4_cube_pricing",
    # round-3 corpus-pipeline classes (decontamination / PII / packing)
    "x_decontaminate",
    "x_pii_scan",
    "x_pack_sequences",
    # round-7: lexical retrieval (explode→filter→agg + broadcast
    # weights + TakeOrderedAndProject — a class no other headliner has)
    "x_tfidf_search",
    # round-12 (r11 verdict #7/#4): two NEW rows, the 27 prior rows
    # untouched for comparability — the W25 incremental maintenance
    # fold itself (three maintain_current_state batches + a redelivery
    # through the manifest-committed state store: the engine's hot
    # write path, previously unmeasured) and the X59 greedy-merge
    # tokenizer at a REALISTIC 5,000-rank corpus-trained vocabulary
    # (word-count pass + incremental-count trainer + Arrow inference;
    # the per-word merge-loop constant at production vocab scale)
    "x_current_state_materialized",
    "x_bpe_5k_vocab",
    # round-13 (r12 verdict #2): ONE new row, the 29 prior rows
    # untouched for comparability — the frozen-vocab inference constant
    # at FULL production scale (50,000 ranks; X63's 5k row stays for
    # the trend): the 'merge table = data' claim priced at the size a
    # real tokenizer ships. Training is memoized module state, so the
    # warmup pass pays it once and the timed rounds measure inference.
    "x_bpe_50k_vocab",
    # r13: the config-driven pipeline runner priced end-to-end — a
    # four-stage declarative spec (quality gate → exact dedup →
    # decontaminate → hash split) driven as ONE fused plan
    # (count_stages=False, the production mode). Composition overhead
    # should be ~the sum of its stages; this row is where drift in
    # that claim would show up.
    "x_pipeline_curation",
    # r15: ONE new row, prior rows untouched for comparability — the
    # K20 small-file maintenance path priced end-to-end (W25 folds +
    # a deliberate wide-shuffle fragmentation + compact_partitions'
    # probe/route/rewrite fenced commit + the post-compaction read):
    # the OPTIMIZE-analog a 100 TB deployment runs behind readers.
    "x_compact_state_transparent",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.0


def _calibration_sec(spark) -> float:
    """Fixed synthetic anchor job: a constant-size codegen aggregation
    whose cost is independent of SF, the dataset, and every operator in
    the repo. Timed in the same harness as the headliners so rounds can
    be load-normalized: r8→r9 the untouched shared set drifted a
    uniform +20% with no code change, and the artifact alone could not
    distinguish shared-host load from a real regression. Dividing the
    headline total by this anchor makes that decidable from
    BENCH_r{N}.json alone."""
    t0 = time.perf_counter()
    (
        spark.range(0, 150_000_000, 1, 32)
        .selectExpr("sum((id * 2654435761) % 1000003) AS s")
        .collect()
    )
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="leftshove-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM/codegen/parquet-footer caches (untimed, one full pass)
    for name in HEADLINE:
        Q.QUERIES[name](spark, SF_DIR).collect()
        cache.release_pins()
        spark.catalog.clearCache()

    # Three INTERLEAVED passes, min per query: single-shot timings on a
    # shared host swing multi-× with noise bursts lasting seconds —
    # back-to-back repeats of one query share a burst, whole-list
    # rounds don't, so the per-query min is a far better steady-state
    # estimator at the same total cost.
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}

    def timed_round(names: list[str]) -> None:
        for name in names:
            t0 = time.perf_counter()
            rows = Q.QUERIES[name](spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            assert rows is not None
            samples[name].append(dt)
            # drop blocks persisted INSIDE an operator (LSH stages pin
            # MEMORY_AND_DISK blocks via ext.cache for their own
            # lifetime); leaving them pinned steals execution memory
            # from every later query, so each timed run starts from an
            # empty block manager. release_pins() is the surgical owner
            # release; clearCache() stays as the belt-and-braces sweep.
            cache.release_pins()
            spark.catalog.clearCache()

    calib: list[float] = [_calibration_sec(spark)]  # post-warmup sample
    for _ in range(3):
        timed_round(HEADLINE)
        calib.append(_calibration_sec(spark))  # interleaved, shares bursts
    # Sub-second headliners drown in shared-host noise bursts even with
    # min-of-3 (r8's q3/q10 "+17%" was ~0.1 s of drift): two extra
    # interleaved rounds for them, and a per-query spread (max−min over
    # rounds) in the artifact so drift vs noise is decidable from
    # BENCH_r{N}.json alone.
    fast = [n for n in HEADLINE if min(samples[n]) < 1.0]
    for _ in range(2):
        timed_round(fast)
    # r12 verdict #7: multi-job rows (the W25 maintenance fold runs 4
    # manifest commits of many small Spark jobs each) swing ±3 s on a
    # shared host — min-of-3 is not enough for a readable trend. Rows
    # whose spread exceeds 1 s after the base rounds get two extra
    # interleaved rounds (data-driven, so quiet rounds pay nothing and
    # the other rows stay untouched for comparability).
    noisy = [
        n
        for n in HEADLINE
        if min(samples[n]) >= 1.0
        and (max(samples[n]) - min(samples[n])) > 1.0
    ]
    for _ in range(2):
        timed_round(noisy)
    timings = {k: round(min(v), 3) for k, v in samples.items()}
    spread = {k: round(max(v) - min(v), 3) for k, v in samples.items()}
    total = round(sum(timings.values()), 3)
    import pyspark

    # Two output lines (VERDICT r15 next #4): the driver records only the
    # LAST ~2,000 characters of stdout and json-parses the final line —
    # the r14/r15 single-line record had grown past that window, so both
    # rounds were graded from a clipped string ("parsed": null). The full
    # record (per-query spread, provenance) goes out FIRST for humans
    # reading the raw log; the FINAL line is a compact summary (values to
    # 2 dp, no spread) kept under the capture window, with a guard that
    # drops the per-query dict rather than ever exceeding it.
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_detail",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                # load-normalization anchor: constant synthetic codegen
                # agg (SF-independent); compare headline totals across
                # rounds as value/calibration_sec to factor out host load
                "calibration_sec": round(min(calib), 3),
                "calibration_spread": round(max(calib) - min(calib), 3),
                "sf": _sf_from_dir(SF_DIR),
                # provenance: runtime flips moved the whole curve ±1.5×
                # in past rounds (r5) — pin what produced these numbers
                "pyspark_version": pyspark.__version__,
                "timing": "min_of_3_interleaved_rounds_after_warmup"
                "_plus_2_for_subsecond",
            }
        )
    )
    compact = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "calibration_sec": round(min(calib), 3),
        "sf": _sf_from_dir(SF_DIR),
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # never let the final line outgrow the capture
        compact.pop("queries")
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
