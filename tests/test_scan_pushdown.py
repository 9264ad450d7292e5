"""Scan-efficiency lints: predicate pushdown + column pruning, asserted
on the physical plans of representative gated queries.

At 100 TB the scan IS the query cost: a filter that doesn't reach the
parquet reader re-reads every row group, and a projection that doesn't
prune columns drags the full row width through the scan. SCALE.md's
"declarative first" posture claims Catalyst delivers both for free —
this test pins that claim so a future refactor (e.g. wrapping a scan
column in a cast or a UDF before the filter) can't silently turn a
row-group-pruned scan into a full-table read.

Each case names a query, the table whose scan it checks, the MAXIMUM
column set the scan may read (ReadSchema must be a subset — Catalyst
may prune further), and substrings that must appear in PushedFilters.
Plans are built without execution, so the sweep costs planning time
only.
"""

import io
import re
import contextlib

import pytest

import __spark_entry__ as entrymod

from conftest import SF0001

QUERIES = entrymod.queries()


def _scans(spark, name):
    """All parquet scan nodes of the query's physical plan, as
    (table_name, read_columns, pushed_filters_text) tuples.

    Cache state from earlier tests in the shared session would
    substitute InMemoryRelation fragments for the parquet scans under
    test (Spark plans against any cached subtree), so plans are built
    from a cold catalog."""
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF0001)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    out = []
    # formatted-mode node blocks: "(n) Scan parquet \n Output [..] ..."
    for block in re.split(r"\n\((\d+)\) ", text)[1:]:
        if not block.lstrip("0123456789").lstrip().startswith("Scan parquet"):
            continue
        loc = re.search(r"Location: \S+ \[[^\]]*?(\w+)\.parquet\]?", block)
        schema = re.search(r"ReadSchema: struct<([^\n]*)>", block)
        pushed = re.search(r"PushedFilters: \[([^\n]*)\]", block)
        cols = []
        if schema:
            cols = [c.split(":")[0] for c in schema.group(1).split(",") if c]
        out.append(
            (
                loc.group(1) if loc else "?",
                set(cols),
                pushed.group(1) if pushed else "",
            )
        )
    return out


# (query, table, max allowed ReadSchema, required PushedFilters substrings)
CASES = [
    (
        "q6_forecast_revenue",
        "lineitem",
        {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"},
        ["GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"],
    ),
    (
        "q1_pricing_summary",
        "lineitem",
        {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        },
        ["LessThanOrEqual(l_shipdate"],
    ),
    (
        "f1_window_predicate",
        "events",
        {"event_id", "ts", "user_id", "event_type", "value", "props"},
        ["GreaterThan(ts", "LessThanOrEqual(ts"],
    ),
    (
        "q12_shipmode_priority",
        "lineitem",
        {"l_orderkey", "l_linestatus", "l_shipdate"},
        ["GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"],
    ),
    (
        "q12_shipmode_priority",
        "orders",
        {"o_orderkey", "o_orderpriority"},
        [],
    ),
    (
        "q19_disjunctive_filter",
        "part",
        None,  # column set unconstrained; the filter must still push
        ["IsNotNull("],
    ),
    (
        # text pipeline: the documents scan must not drag source/n_chars
        # through the Arrow stage it doesn't use
        "x_lang_id",
        "documents",
        {"doc_id", "text", "lang"},
        [],
    ),
    (
        # ANN: embeddings scans read (vec_id, embedding) only — label
        # never enters the pipeline
        "x_knn_lsh",
        "embeddings",
        {"vec_id", "embedding"},
        [],
    ),
    (
        # join pruning: the orders side of the left join carries only
        # the join key + projected columns
        "j1_left_join_orders_customer",
        "customer",
        {"c_custkey", "c_name", "c_mktsegment"},
        [],
    ),
]


@pytest.mark.parametrize(
    "name,table,max_cols,needles",
    CASES,
    ids=[f"{q}:{t}" for q, t, _, _ in CASES],
)
def test_scan_pushdown_and_pruning(spark, name, table, max_cols, needles):
    scans = [s for s in _scans(spark, name) if s[0] == table]
    assert scans, f"{name}: no parquet scan of {table} found in the plan"
    for _, cols, pushed in scans:
        if max_cols is not None:
            extra = cols - max_cols
            assert not extra, (
                f"{name}: {table} scan reads unpruned columns {sorted(extra)} "
                f"(ReadSchema={sorted(cols)}) — projection no longer reaches "
                "the parquet reader"
            )
        for needle in needles:
            assert needle in pushed, (
                f"{name}: expected {needle!r} in {table} PushedFilters "
                f"[{pushed}] — predicate no longer reaches the parquet reader"
            )
