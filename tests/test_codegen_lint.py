"""Codegen-compile lint.

Round-9 shipped a stage that failed WholeStageCodegen compilation (the
PQ ADC scoring WHEN-chain — ~512 duplicated arithmetic nodes fused into
the join's ``processNext()``, past janino's 64 KB method limit) and
nobody noticed for a round: Spark logs ``ERROR CodeGenerator`` and
silently re-runs the stage INTERPRETED, row-at-a-time — correct values,
plan text still says WholeStageCodegen, so the correctness gate, the
plan-shape lints, and the pushdown pins were all blind to it. At 100 TB
an interpreted hot loop is exactly the per-row-slow pattern those lints
exist to ban.

The lint: the shared pytest session (conftest) runs with
``spark.sql.codegen.fallback=false``, under which a compile failure
RAISES instead of degrading — so every query the suite executes,
including the full-gate oracle sweep in test_gate_tail_oracle, doubles
as a codegen-compile check. This module pins (a) that the conf is
actually set, and (b) that the mechanism goes red on the exact
expression shape that slipped through in r9.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF0001


def test_codegen_fallback_disabled_in_suite_session(spark):
    """The lint is the CONF — if a refactor drops it from conftest, the
    whole class of silent interpreted fallbacks becomes invisible
    again. Pin it."""
    assert spark.conf.get("spark.sql.codegen.fallback") == "false"


def test_lint_goes_red_on_method_limit_blowup(spark):
    """Re-create r9's failing shape — a lookup inlined as a WHEN-chain
    whose branches each carry an unrolled 64-term integer-L2, fused
    into a sort stage — and assert the session now RAISES on it. This
    is the demonstrably-red half of the lint: were conftest's conf
    reverted, this plan would run (interpreted) and the test would
    fail, flagging the lint as disarmed."""
    df = (
        spark.range(64)
        .withColumn("qv", F.array(*[F.col("id") + i for i in range(64)]))
        .withColumn("code", (F.col("id") % 32).cast("int"))
    )
    expr = F.lit(None).cast("long")
    for ci in range(32):
        terms = [
            (F.element_at("qv", i + 1) - F.lit(ci * 17 + i)) ** 2 for i in range(64)
        ]
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        expr = F.when(F.col("code") == ci, s.cast("long")).otherwise(expr)
    w = Window.partitionBy(F.col("id") % 5).orderBy("d")
    bad = (
        df.withColumn("d", expr)
        .withColumn("r", F.row_number().over(w))
        .filter("r <= 3")
    )
    with pytest.raises(Exception) as ei:
        bad.collect()
    msg = str(ei.value)
    assert (
        "CompilerException" in msg
        or "Failed to compile" in msg
        or "grows beyond" in msg
    ), f"raised, but not a codegen compile failure: {msg[:200]}"


def test_pq_adc_scoring_compiles(spark):
    """The specific r9 victim, end-to-end under fallback=false: the
    materialized-ADC scoring path (ext/similarity.knn_pq_adc) must
    compile cleanly — this is the regression guard for the fix (a
    revert to the WHEN-chain form dies here, not just in the full-gate
    sweep)."""
    from leftshove_spark.ext import similarity as S
    from leftshove_spark.queries import load_table

    emb = load_table(spark, SF0001, "embeddings")
    books = S.pq_train_codebooks(emb)
    rows = S.knn_pq_adc(emb, books).collect()
    assert len(rows) > 0
