"""ANN index rotation (ext/annindex.py) — VERDICT r15 next #2: a
retrain must never expose a searcher to a half-written index or to new
codes scored with old codebooks. The rotation is a generation-pointer
cutover (the statestore manifest-flip discipline, whole-index case):

- searches issued before/during/after a cutover resolve one committed
  generation's (codes, codebooks) pair — old or new, never a mix;
- a search that resolved the old pointer keeps its files through the
  retention grace (and can re-resolve its own generation explicitly);
- a crashed build leaves the old pointer current; the retry clears the
  debris and lands;
- a racing rotation loses the pointer CAS loudly, store intact;
- superseded generations GC only past BOTH retention bounds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF0001

from leftshove_spark.ext import annindex as AI
from leftshove_spark.ext import similarity as S
from leftshove_spark.sources import load_table
from leftshove_spark.statestore import ConcurrentCommitError


def _emb(spark, n=200):
    return load_table(spark, SF0001, "embeddings").filter(
        F.col("vec_id") < n
    )


def _queries(spark, n=5):
    return _emb(spark).filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), S.quantize("embedding").alias("qqv")
    )


def _build_fn(emb, cents, books):
    return lambda d: S.ivfadc_encode(emb, cents, books).write.partitionBy(
        "cell"
    ).parquet(d)


def test_rotate_cutover_never_serves_a_mix(spark, tmp_path):
    root = str(tmp_path / "idx")
    emb = _emb(spark)
    old_half = emb.filter(F.col("vec_id") % 2 == 0)
    q = _queries(spark)

    # generation 1: codebooks trained on the old half
    cents1, books1 = S.ivfadc_train(old_half, n_centroids=4)
    g1 = AI.rotate_index(
        root,
        _build_fn(old_half, cents1, books1),
        meta={"cents": cents1, "books": books1},
    )
    assert g1 == 1
    got1 = sorted(
        map(tuple, AI.knn_ivfadc_rotated(spark, root, q, k=3).collect())
    )
    want1 = sorted(
        map(
            tuple,
            S.knn_ivfadc_codes(
                S.ivfadc_encode(old_half, cents1, books1),
                q,
                cents1,
                books1,
                k=3,
                dedup=False,
            ).collect(),
        )
    )
    assert got1 == want1 and got1

    # a long-running searcher snapshots its generation BEFORE the
    # retrain...
    pinned_gen = AI.current_index(root)["gen"]
    pinned_codes, pinned_meta = AI.read_index(spark, root, pinned_gen)

    # generation 2: RETRAINED codebooks over the full corpus — both the
    # codes and the books change together
    cents2, books2 = S.ivfadc_train(emb, n_centroids=8)
    g2 = AI.rotate_index(
        root,
        _build_fn(emb, cents2, books2),
        meta={"cents": cents2, "books": books2},
        retention_sec=3600.0,
    )
    assert g2 == 2

    # after the cutover: searches resolve the NEW pair end to end
    got2 = sorted(
        map(tuple, AI.knn_ivfadc_rotated(spark, root, q, k=3).collect())
    )
    want2 = sorted(
        map(
            tuple,
            S.knn_ivfadc_codes(
                S.ivfadc_encode(emb, cents2, books2),
                q,
                cents2,
                books2,
                k=3,
                dedup=False,
            ).collect(),
        )
    )
    assert got2 == want2 and got2

    # ...while the pinned searcher still gets EXACTLY generation 1 —
    # its files survived the cutover (retention) and its meta is the
    # OLD books: old-with-old, new-with-new, never a mix
    assert pinned_meta["books"] == books1
    got_pinned = sorted(
        map(
            tuple,
            AI.knn_ivfadc_rotated(
                spark, root, q, k=3, generation=pinned_gen
            ).collect(),
        )
    )
    assert got_pinned == want1
    # the pre-cutover scan object also still collects (files retained)
    assert pinned_codes.count() == old_half.count()


def test_rotation_crash_retry_race_and_gc(spark, tmp_path):
    root = str(tmp_path / "idx")
    emb = _emb(spark, n=60)
    cents, books = S.ivfadc_train(emb, n_centroids=4)
    AI.rotate_index(root, _build_fn(emb, cents, books), meta={"cents": cents, "books": books})
    gen1_dir = AI.current_index(root)["path"]

    # crashed build: the pointer stays on generation 1, debris is
    # invisible, and the retry clears it and lands generation 2
    def crash(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "partial.parquet"), "w") as fh:
            fh.write("debris")
        raise RuntimeError("build crashed")

    with pytest.raises(RuntimeError, match="build crashed"):
        AI.rotate_index(root, crash)
    assert AI.current_index(root)["gen"] == 1
    assert AI.read_index(spark, root)[0].count() == 60

    g2 = AI.rotate_index(
        root,
        _build_fn(emb, cents, books),
        meta={"cents": cents, "books": books},
        retention_sec=3600.0,
    )
    assert g2 == 2
    assert AI.read_index(spark, root)[0].count() == 60  # no debris read

    # racing rotation: a competitor flips the target pointer first —
    # the loser raises loudly and the winner's pointer stands
    def racing_build(d):
        os.makedirs(os.path.dirname(AI._pointer_path(root, 3)), exist_ok=True)
        with open(AI._pointer_path(root, 3), "w") as fh:
            fh.write(
                '{"gen": 3, "path": "gen-0000000002", "meta": {}, '
                '"committed_at": 0}'
            )
        _build_fn(emb, cents, books)(d)

    with pytest.raises(ConcurrentCommitError):
        AI.rotate_index(root, racing_build)
    assert AI.current_index(root)["gen"] == 3  # the racer's commit stands

    # GC: past BOTH bounds (keep_generations=1, retention 0) the
    # superseded generations are removed and a pinned resolve raises
    AI.rotate_index(
        root,
        _build_fn(emb, cents, books),
        meta={"cents": cents, "books": books},
        keep_generations=1,
        retention_sec=0.0,
    )
    AI.rotate_index(
        root,
        _build_fn(emb, cents, books),
        meta={"cents": cents, "books": books},
        keep_generations=1,
        retention_sec=0.0,
    )
    gens = AI._list_pointers(root)
    assert 1 not in gens and 2 not in gens
    assert not os.path.isdir(gen1_dir)
    with pytest.raises(KeyError):
        AI.current_index(root, generation=1)
    # the current generation still reads
    assert AI.read_index(spark, root)[0].count() == 60


def test_index_stream_appends_into_current_generation_and_cutover(
    spark, tmp_path
):
    """The documented W24 ↔ W31 composition: the streaming IVFADC
    maintainer appends micro-batches INTO the current rotation
    generation's directory (current_index resolves it at stream
    start), searches through the pointer see the growing index, and a
    retrain is rotate-then-restart — the new stream appends into the
    new generation while the superseded one still serves pinned
    readers through the grace."""
    from pyspark.sql import functions as F

    from leftshove_spark.streaming import start_ivfadc_index_stream

    emb = _emb(spark, n=120)
    first, later = (
        emb.filter(F.col("vec_id") < 80),
        emb.filter(F.col("vec_id") >= 80),
    )
    root = str(tmp_path / "idx")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    q = _queries(spark)

    # generation 1: batch-built from the initial corpus
    cents1, books1 = S.ivfadc_train(first, n_centroids=4)
    AI.rotate_index(
        root,
        _build_fn(first, cents1, books1),
        meta={"cents": cents1, "books": books1},
    )
    gen1 = AI.current_index(root)

    # the maintainer appends INTO the current generation's directory
    later.coalesce(1).write.mode("append").parquet(landing)
    sq = start_ivfadc_index_stream(
        spark,
        landing_dir=landing,
        index_dir=gen1["path"],
        cents=cents1,
        books=books1,
        checkpoint_dir=str(tmp_path / "ck1"),
        once=True,
    )
    assert sq.awaitTermination(180), "index stream did not drain"
    # a pointer-resolved search now covers the WHOLE corpus, encoded
    # with generation 1's codebooks — ≡ one batch encode
    got = sorted(
        map(tuple, AI.knn_ivfadc_rotated(spark, root, q, k=3).collect())
    )
    want = sorted(
        map(
            tuple,
            S.knn_ivfadc_codes(
                S.ivfadc_encode(emb, cents1, books1),
                q,
                cents1,
                books1,
                k=3,
                dedup=False,
            ).collect(),
        )
    )
    assert got == want and got

    # retrain = rotate (full re-encode, new codebooks) + restart the
    # maintainer on the NEW generation's directory
    cents2, books2 = S.ivfadc_train(emb, n_centroids=8)
    AI.rotate_index(
        root,
        _build_fn(emb, cents2, books2),
        meta={"cents": cents2, "books": books2},
        retention_sec=3600.0,
    )
    gen2 = AI.current_index(root)
    assert gen2["gen"] == gen1["gen"] + 1 and gen2["path"] != gen1["path"]
    got2 = sorted(
        map(tuple, AI.knn_ivfadc_rotated(spark, root, q, k=3).collect())
    )
    want2 = sorted(
        map(
            tuple,
            S.knn_ivfadc_codes(
                S.ivfadc_encode(emb, cents2, books2),
                q,
                cents2,
                books2,
                k=3,
                dedup=False,
            ).collect(),
        )
    )
    assert got2 == want2
    # the superseded generation still serves its pinned snapshot
    got1_pinned = sorted(
        map(
            tuple,
            AI.knn_ivfadc_rotated(
                spark, root, q, k=3, generation=gen1["gen"]
            ).collect(),
        )
    )
    assert got1_pinned == want
