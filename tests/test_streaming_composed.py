"""The COMPOSED streaming corpus story (VERDICT r12 next #6):
admit (W20) → decontaminate (W27) → index (W24) → materialize state
(W26) as one chained, checkpointed pipeline
(streaming.run_corpus_stream_pipeline). The four streams were each
individually pinned; these tests pin the COMPOSITION:

- a near-dup of an admitted doc never reaches any downstream stage;
- a contaminated doc is quarantined WITH its matched benchmark id and
  never reaches the index or the state;
- the ANN index rows equal a batch re-encode of the clean corpus
  (ivfadc_encode is pure — stream-appended ≡ batch);
- the materialized state equals latest_per_key_window over everything
  that landed clean (the W25 associativity, through the whole chain);
- re-running the pipeline after a second wave processes ONLY the new
  files through all four stages (the checkpoint-chained increment).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF0001

from leftshove_spark.sources import load_table
from leftshove_spark.streaming import (
    current_state_table,
    run_corpus_stream_pipeline,
)


def _fixture(spark):
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    emb = load_table(spark, SF0001, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return docs.join(emb, "doc_id")


def test_composed_stream_equals_batch_composition(spark, tmp_path):
    from leftshove_spark.ext.pipeline import decontaminate_semantic
    from leftshove_spark.ext.similarity import ivfadc_encode, ivfadc_train
    from leftshove_spark.views import latest_per_key_window

    base = _fixture(spark)
    # frozen benchmark: perturbed copies of docs 480-484 (never landed)
    bench = base.filter(
        (F.col("doc_id") >= 480) & (F.col("doc_id") < 485)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 4, F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    bench_dir = str(tmp_path / "bench")
    bench.write.parquet(bench_dir)
    # frozen index pair, trained once on the wider corpus
    cents, books = ivfadc_train(
        base, n_centroids=4, id_col="doc_id", vec_col="embedding"
    )

    landing = str(tmp_path / "landing")
    work = str(tmp_path / "work")
    os.makedirs(landing)

    w1_base = base.filter(F.col("doc_id") < 40).withColumn(
        "version", F.lit(1).cast("long")
    )
    # plants: 9000 near-dups doc 0 (same text + tail — must be rejected
    # in-batch, min id kept); 9001 carries doc 480's EXACT embedding
    # (cosine 1.0 to benchmark 100480 — must quarantine)
    d0 = w1_base.filter(F.col("doc_id") == 0).select("text", "embedding").first()
    e480 = base.filter(F.col("doc_id") == 480).select("embedding").first()
    plants = spark.createDataFrame(
        [
            (9000, d0["text"] + " tail", d0["embedding"], 1),
            (9001, "a wholly unique paraphrase nothing ngram shares", e480["embedding"], 1),
        ],
        "doc_id long, text string, embedding array<float>, version long",
    )
    w1 = w1_base.unionByName(plants)
    w1.coalesce(1).write.mode("append").parquet(landing)

    dirs = run_corpus_stream_pipeline(
        spark,
        landing_dir=landing,
        work_dir=work,
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        threshold=0.95,
        # r15: the shaping knob threads through the composed pipeline's
        # materialize stage — same end state, capped write layout
        files_per_bucket=1,
    )

    admitted = {r["doc_id"] for r in spark.read.parquet(dirs["admitted"]).collect()}
    # batch parity 0: wave-1 admission ≡ the batch keep-one-per-
    # component over the same landed rows (the fixture corpus has its
    # own genuine near-dup pairs — the expectation is DERIVED, not
    # hand-listed)
    from leftshove_spark.ext.dedup import minhash_lsh_pairs
    from leftshove_spark.ext.graph import (
        connected_components,
        resolve_keep_one_per_component,
    )

    pairs = minhash_lsh_pairs(w1.select("doc_id", "text"), "text", "doc_id", 0.6)
    comp = connected_components(pairs.select("id_a", "id_b"))
    want_admit = {
        r["doc_id"]
        for r in resolve_keep_one_per_component(w1, comp, "doc_id")
        .select("doc_id")
        .collect()
    }
    assert admitted == want_admit
    assert 9000 not in admitted and 0 in admitted and 9001 in admitted
    quar = {
        r["doc_id"]: r["matched_benchmark_id"]
        for r in spark.read.parquet(dirs["quarantine"]).collect()
    }
    assert quar == {9001: 100480}  # the audit trail names the leak
    clean_df = spark.read.parquet(dirs["clean"])
    clean = {r["doc_id"] for r in clean_df.collect()}
    assert clean == want_admit - {9001}

    # batch parity 1: quarantine ≡ the batch operator over the admitted
    adm_df = spark.read.parquet(dirs["admitted"])
    want_flagged = {
        (r["doc_id"], r["matched_benchmark_id"])
        for r in decontaminate_semantic(
            adm_df.select("doc_id", "embedding"),
            spark.read.parquet(bench_dir),
            threshold=0.95,
            id_col="doc_id",
        ).collect()
    }
    assert want_flagged == {(9001, 100480)}

    # batch parity 2: the streamed ANN index ≡ one batch encode of the
    # clean corpus (pure function of (vector, cents, books))
    got_idx = sorted(
        map(tuple, spark.read.parquet(dirs["ivfadc_index"]).collect())
    )
    want_cols = spark.read.parquet(dirs["ivfadc_index"]).columns
    want_idx = sorted(
        map(
            tuple,
            ivfadc_encode(clean_df, cents, books, "doc_id", "embedding")
            .select(*want_cols)
            .collect(),
        )
    )
    assert got_idx == want_idx and len(got_idx) == len(clean)

    # batch parity 3: the materialized state ≡ latest-per-key over
    # everything that landed clean
    got_state = sorted(
        map(tuple, current_state_table(spark, dirs["state"]).collect())
    )
    want_state = sorted(
        map(
            tuple,
            latest_per_key_window(
                clean_df, "doc_id", order_col="version"
            ).collect(),
        )
    )
    assert got_state == want_state

    # ---- wave 2: a real edit (version 2, changed text), a novel doc,
    # a near-dup of an ADMITTED doc, a second contaminated doc
    d5 = base.filter(F.col("doc_id") == 5).select("text", "embedding").first()
    e481 = base.filter(F.col("doc_id") == 481).select("embedding").first()
    novel = base.filter(F.col("doc_id") == 200).select("embedding").first()
    w2 = spark.createDataFrame(
        [
            # doc 7 edited: materially different text, same id, version 2
            (7, "completely rewritten body after the second draft edit", d5["embedding"], 2),
            (200, "a genuinely novel document matching nothing else at all", novel["embedding"], 1),
            (9002, d5["text"] + " suffix", d5["embedding"], 1),  # dup of 5
            (9003, "another unique paraphrase with no shared ngram", e481["embedding"], 1),
        ],
        "doc_id long, text string, embedding array<float>, version long",
    )
    w2.coalesce(1).write.mode("append").parquet(landing)

    dirs = run_corpus_stream_pipeline(
        spark,
        landing_dir=landing,
        work_dir=work,
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        threshold=0.95,
    )
    admitted2 = {r["doc_id"] for r in spark.read.parquet(dirs["admitted"]).collect()}
    # the edit (unique text), the novel doc, and the contaminated plant
    # (admission screens TEXT — the leak is stage 2's to catch) are
    # admitted; the near-dup of ADMITTED doc 5 is rejected against the
    # standing index
    assert admitted2 == want_admit | {7, 200, 9003}
    assert 9002 not in admitted2
    quar2 = {
        r["doc_id"]: r["matched_benchmark_id"]
        for r in spark.read.parquet(dirs["quarantine"]).collect()
    }
    assert quar2 == {9001: 100480, 9003: 100481}
    clean_df = spark.read.parquet(dirs["clean"])

    # the edit flowed through to the state: doc 7 shows version 2
    state = current_state_table(spark, dirs["state"])
    got_state = sorted(map(tuple, state.collect()))
    want_state = sorted(
        map(
            tuple,
            latest_per_key_window(
                clean_df, "doc_id", order_col="version"
            ).collect(),
        )
    )
    assert got_state == want_state
    v7 = state.filter(F.col("doc_id") == 7).collect()
    assert len(v7) == 1 and v7[0]["version"] == 2
    want_live = (want_admit - {9001}) | {7, 200}
    assert {r["doc_id"] for r in state.collect()} == want_live

    # the index grew by exactly the new clean rows, still ≡ batch encode
    got_idx2 = sorted(
        map(tuple, spark.read.parquet(dirs["ivfadc_index"]).collect())
    )
    want_idx2 = sorted(
        map(
            tuple,
            ivfadc_encode(clean_df, cents, books, "doc_id", "embedding")
            .select(*want_cols)
            .collect(),
        )
    )
    assert got_idx2 == want_idx2 and len(got_idx2) == len(want_live) + (
        1 if 7 in want_admit else 0
    )  # doc 7 appears once per clean landing (index is append-only)


def test_composed_pipeline_raises_on_stage_timeout(tmp_path, monkeypatch):
    """r13: awaitTermination(timeout) returns False on TIMEOUT — the
    stage is still writing. Silently starting the next stage would
    snapshot a partial upstream directory and drop the stragglers with
    no error anywhere; the pipeline must raise instead."""
    import pytest

    from leftshove_spark import streaming

    class StuckQuery:
        stopped = False

        def awaitTermination(self, timeout=None):
            return False  # timed out, still running

        def stop(self):
            StuckQuery.stopped = True

    monkeypatch.setattr(
        streaming, "start_near_dedup_stream", lambda *a, **kw: StuckQuery()
    )
    with pytest.raises(TimeoutError, match="admit"):
        streaming.run_corpus_stream_pipeline(
            None,
            landing_dir=str(tmp_path / "landing"),
            work_dir=str(tmp_path / "work"),
            benchmark_emb_dir=str(tmp_path / "bench"),
            cents=[[0]],
            books=[[[0]]],
            timeout_sec=1,
        )
    assert StuckQuery.stopped  # the stuck stage was stopped, not leaked


def test_live_composed_pipeline_matches_chained_end_state(spark, tmp_path):
    """r14 (VERDICT r13 next #2): the CONTINUOUS deployment — all four
    stages live at once on ``processingTime`` triggers, waves landing
    while they run — reaches exactly the end state the availableNow
    chain reaches over the same waves (admitted ids, quarantine audit
    trail, clean ids, state rows). Then the interchangeability claim:
    a wave landed AFTER the live pipeline stopped is drained by ONE
    availableNow re-run over the SAME work dir/checkpoints, and the
    end states still agree — checkpoint/manifest interleaving under
    concurrency holds up, not just the serialized chain."""
    import time

    from leftshove_spark.ext.similarity import ivfadc_train
    from leftshove_spark.streaming import (
        run_corpus_stream_pipeline,
        start_corpus_stream_pipeline_live,
        stop_corpus_stream_pipeline,
    )

    base = _fixture(spark)
    bench = base.filter(
        (F.col("doc_id") >= 480) & (F.col("doc_id") < 485)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 4, F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    bench_dir = str(tmp_path / "bench")
    bench.write.parquet(bench_dir)
    cents, books = ivfadc_train(
        base, n_centroids=4, id_col="doc_id", vec_col="embedding"
    )

    w1_base = base.filter(F.col("doc_id") < 30).withColumn(
        "version", F.lit(1).cast("long")
    )
    d0 = w1_base.filter(F.col("doc_id") == 0).select("text", "embedding").first()
    d5 = base.filter(F.col("doc_id") == 5).select("text", "embedding").first()
    e480 = base.filter(F.col("doc_id") == 480).select("embedding").first()
    novel = base.filter(F.col("doc_id") == 200).select("embedding").first()
    plants1 = spark.createDataFrame(
        [
            (9000, d0["text"] + " tail", d0["embedding"], 1),  # in-wave dup
            (9001, "a wholly unique paraphrase nothing ngram shares", e480["embedding"], 1),
        ],
        "doc_id long, text string, embedding array<float>, version long",
    )
    w1 = w1_base.unionByName(plants1)
    w2 = spark.createDataFrame(
        [
            (7, "completely rewritten body after the second draft edit", d5["embedding"], 2),
            (200, "a genuinely novel document matching nothing else at all", novel["embedding"], 1),
            (9002, d5["text"] + " suffix", d5["embedding"], 1),  # dup of admitted 5
        ],
        "doc_id long, text string, embedding array<float>, version long",
    )
    w3 = spark.createDataFrame(
        [(300, "a third wave document entirely unlike the others", novel["embedding"], 1)],
        "doc_id long, text string, embedding array<float>, version long",
    )
    waves = [w1, w2, w3]

    def snapshot(dirs):
        admitted = {
            r["doc_id"] for r in spark.read.parquet(dirs["admitted"]).collect()
        }
        quar = {
            r["doc_id"]: r["matched_benchmark_id"]
            for r in spark.read.parquet(dirs["quarantine"]).collect()
        }
        clean = {r["doc_id"] for r in spark.read.parquet(dirs["clean"]).collect()}
        state = sorted(
            (r["doc_id"], r["version"], r["text"])
            for r in current_state_table(spark, dirs["state"]).collect()
        )
        return admitted, quar, clean, state

    # --- reference: the availableNow chain, one run per wave
    landing_c = str(tmp_path / "landing_chain")
    os.makedirs(landing_c)
    per_wave = []
    for w in waves:
        w.coalesce(1).write.mode("append").parquet(landing_c)
        dirs_c = run_corpus_stream_pipeline(
            spark,
            landing_dir=landing_c,
            work_dir=str(tmp_path / "work_chain"),
            benchmark_emb_dir=bench_dir,
            cents=cents,
            books=books,
            threshold=0.95,
        )
        per_wave.append(snapshot(dirs_c))

    # --- live: all four streams running, waves landing while they run
    landing_l = str(tmp_path / "landing_live")
    os.makedirs(landing_l)
    waves[0].coalesce(1).write.mode("append").parquet(landing_l)
    dirs_l, queries = start_corpus_stream_pipeline_live(
        spark,
        landing_dir=landing_l,
        work_dir=str(tmp_path / "work_live"),
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        threshold=0.95,
        processing_time="1 second",
    )
    assert all(q.isActive for q in queries)

    def wait_for(want, timeout=240):
        deadline = time.time() + timeout
        last = None
        while time.time() < deadline:
            for q in queries:
                assert q.exception() is None, str(q.exception())
            try:
                last = snapshot(dirs_l)
                if last == want:
                    return
            except Exception:
                pass  # a dir not written yet / state not committed yet
            time.sleep(2)
        raise AssertionError(f"live pipeline never reached {want}; last {last}")

    wait_for(per_wave[0])
    waves[1].coalesce(1).write.mode("append").parquet(landing_l)
    wait_for(per_wave[1])
    waves[2].coalesce(1).write.mode("append").parquet(landing_l)
    wait_for(per_wave[2])
    stop_corpus_stream_pipeline(queries)
    assert not any(q.isActive for q in queries)
    assert snapshot(dirs_l) == per_wave[2]  # clean stop, nothing torn

    # --- interchangeability: a wave landed after the stop is drained
    # by ONE availableNow pass over the SAME checkpoints
    w4 = spark.createDataFrame(
        [(301, "a final wave document unlike anything processed before", novel["embedding"], 1)],
        "doc_id long, text string, embedding array<float>, version long",
    )
    w4.coalesce(1).write.mode("append").parquet(landing_c)
    dirs_c = run_corpus_stream_pipeline(
        spark,
        landing_dir=landing_c,
        work_dir=str(tmp_path / "work_chain"),
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        threshold=0.95,
    )
    want_final = snapshot(dirs_c)
    w4.coalesce(1).write.mode("append").parquet(landing_l)
    dirs_l2 = run_corpus_stream_pipeline(
        spark,
        landing_dir=landing_l,
        work_dir=str(tmp_path / "work_live"),
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        threshold=0.95,
    )
    assert snapshot(dirs_l2) == want_final


def test_live_pipeline_starts_on_empty_landing_with_schema(spark, tmp_path):
    """r14 review: the documented empty-landing start — pass `schema`,
    all four stages (admission included: its source needs the explicit
    schema too, there are no files to infer from) start on empty dirs,
    and the first wave landing AFTER the start flows through to the
    materialized state. The derived-schema path is also pinned: for a
    populated landing dir the downstream schema must be the BATCH-
    VISIBLE one (read_parquet_normalized), not the raw footer schema."""
    import time

    from pyspark.sql import types as T

    from leftshove_spark.ext.similarity import ivfadc_train
    from leftshove_spark.sources import read_parquet_normalized
    from leftshove_spark.streaming import (
        start_corpus_stream_pipeline_live,
        stop_corpus_stream_pipeline,
    )

    base = _fixture(spark).withColumn("version", F.lit(1).cast("long"))
    bench_dir = str(tmp_path / "bench")
    base.limit(0).select("doc_id", "embedding").write.parquet(bench_dir)
    cents, books = ivfadc_train(
        base, n_centroids=2, id_col="doc_id", vec_col="embedding"
    )
    wave = base.filter(F.col("doc_id") < 10)

    landing = str(tmp_path / "landing")  # does NOT exist yet
    dirs, queries = start_corpus_stream_pipeline_live(
        spark,
        landing_dir=landing,
        work_dir=str(tmp_path / "work"),
        benchmark_emb_dir=bench_dir,
        cents=cents,
        books=books,
        processing_time="1 second",
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("version", T.LongType()),
            ]
        ),
    )
    try:
        assert all(q.isActive for q in queries)
        wave.coalesce(1).write.mode("append").parquet(landing)
        deadline = time.time() + 240
        want = {r["doc_id"] for r in wave.collect()}
        got = set()
        while time.time() < deadline and got != want:
            for q in queries:
                assert q.exception() is None, str(q.exception())
            try:
                got = {
                    r["doc_id"]
                    for r in current_state_table(
                        spark, dirs["state"]
                    ).collect()
                }
            except Exception:
                pass
            time.sleep(2)
        assert got == want
    finally:
        stop_corpus_stream_pipeline(queries)

    # the populated-landing schema derivation is the BATCH-VISIBLE one:
    # on a landing dir with physical nano-timestamp columns (events),
    # the raw footer schema claims LongType (nanosAsLong) while the
    # normalized read — what stage 1's frames carry and the
    # intermediate parquet is written with — surfaces TimestampType;
    # deriving downstream schemas from the raw form would mis-describe
    # the normalized files (the r14 review finding)
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T2

    nano_dir = str(tmp_path / "nano_landing")
    import os as _os

    _os.makedirs(nano_dir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000_001, 2], pa.timestamp("ns")),
            }
        ),
        _os.path.join(nano_dir, "part-0.parquet"),
        store_schema=False,  # bare TIMESTAMP(NANOS), no arrow metadata
    )
    raw = dict(spark.read.parquet(nano_dir).dtypes)
    norm = {
        f.name: f.dataType
        for f in read_parquet_normalized(spark, nano_dir).schema
    }
    assert raw["ts"] == "bigint"  # the raw footer schema: nanosAsLong
    assert isinstance(norm["ts"], T2.TimestampType)  # batch-visible form
    # and the flat landing used above derives identically either way
    assert [f.name for f in read_parquet_normalized(spark, landing).schema] \
        == ["doc_id", "text", "embedding", "version"]
