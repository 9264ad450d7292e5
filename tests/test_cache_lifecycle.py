"""Pinned-intermediate lifecycle (r7 advice #6) + conditional fan-out
(r7 advice #5).

#6: the shingle/simhash Arrow stages persist their output because the
near-dup callers read it 2-3×; every pin now registers with
leftshove_spark.ext.cache so an owner can release it surgically. These
tests prove the contract: after a dedup gate query completes and the
owner calls release_pins(), the session's cache manager is empty — no
slow cache leak in a long-running engine process.

#5: the pre-Arrow-stage repartition exists only to fan a NARROW local
scan out to the cluster width; when the input is already cluster-wide
(the 100 TB case — the scan has >= width splits) no shuffle may be
added. Checked behaviorally: partition count passes through unchanged
for wide inputs, fans out to defaultParallelism for narrow ones.
"""

import pytest

from conftest import SF0001

from leftshove_spark.ext import cache
from leftshove_spark.ext.dedup import _staged_shingles, _staged_simhash
from leftshove_spark.ext.text import fingerprint
from leftshove_spark.sources import read_parquet_normalized


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture
def docs(spark):
    return read_parquet_normalized(spark, f"{SF0001}/documents.parquet")


@pytest.fixture(autouse=True)
def clean_cache(spark):
    """The cache-empty assertions are about THIS test's pins; a shared
    session may carry caches from earlier suites — start clean."""
    cache.release_pins()
    spark.catalog.clearCache()
    yield


# The gate queries whose plans pin intermediates (LSH stages, the
# incremental index). Each must leave the cache manager empty once the
# consumer releases the pins.
_PINNING_QUERIES = [
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_index_incremental",
]


@pytest.mark.parametrize("name", _PINNING_QUERIES)
def test_dedup_gate_query_releases_all_pins(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF0001)
    assert df.collect() is not None
    released = cache.release_pins()
    assert released >= 1, f"{name}: expected at least one registered pin"
    assert cache.pinned_count() == 0
    assert _cache_empty(spark), f"{name}: cache manager not empty after release"


def test_release_pins_idempotent(spark, docs):
    staged = _staged_shingles(docs, "text", "doc_id", pin=True)
    staged.count()
    assert cache.release_pins() == 1
    assert cache.release_pins() == 0
    assert _cache_empty(spark)


@pytest.mark.parametrize(
    "stage",
    [
        lambda d: _staged_shingles(d, "text", "doc_id", pin=True),
        lambda d: _staged_simhash(d, "text", "doc_id"),
        lambda d: fingerprint(d),
    ],
    ids=["shingles_pinned", "simhash", "fingerprint"],
)
def test_arrow_stage_adds_no_shuffle_on_wide_input(spark, docs, stage):
    width = spark.sparkContext.defaultParallelism
    wide = docs.repartition(width + 3)
    out = stage(wide)
    try:
        # mapInPandas preserves partitioning; any repartition would
        # change the count to exactly `width`
        assert out.rdd.getNumPartitions() == width + 3
    finally:
        cache.release_pins()


@pytest.mark.parametrize(
    "stage",
    [
        lambda d: _staged_shingles(d, "text", "doc_id", pin=True),
        lambda d: _staged_simhash(d, "text", "doc_id"),
        lambda d: fingerprint(d),
    ],
    ids=["shingles_pinned", "simhash", "fingerprint"],
)
def test_arrow_stage_fans_out_narrow_input(spark, docs, stage):
    width = spark.sparkContext.defaultParallelism
    narrow = docs.coalesce(1)
    out = stage(narrow)
    try:
        assert out.rdd.getNumPartitions() == width
    finally:
        cache.release_pins()


def test_pin_scope_releases_only_its_own_pins(spark, docs):
    """r14 (ADVICE r13): the context-manager pin form for library
    callers — pins taken inside the scope are released on exit, pins
    that existed before it survive (scopes nest and compose with the
    gate's release-at-entry discipline), and release_pins() called
    inside a scope doesn't break the exit accounting."""
    outer = cache.pin(docs.select("doc_id"))
    outer.count()
    assert cache.pinned_count() == 1

    with cache.pin_scope():
        inner = _staged_shingles(docs.limit(50), "text", "doc_id")
        inner.count()
        assert cache.pinned_count() >= 2
    assert cache.pinned_count() == 1  # inner released, outer kept
    assert outer.storageLevel.useMemory  # the outer pin is still live

    # nesting: the inner scope's exit leaves the outer scope's pins
    with cache.pin_scope():
        a = cache.pin(docs.select("text"))
        a.count()
        with cache.pin_scope():
            b = cache.pin(docs.select("lang"))
            b.count()
            assert cache.pinned_count() == 3
        assert cache.pinned_count() == 2
    assert cache.pinned_count() == 1

    # release_pins() inside a scope empties everything; exit is a no-op
    with cache.pin_scope():
        cache.pin(docs.select("source")).count()
        assert cache.release_pins() == 2  # outer + this scope's pin
    assert cache.pinned_count() == 0
    assert _cache_empty(spark)


def test_pin_scope_survives_mid_scope_release(spark, docs):
    """r14 review: pins taken AFTER a release_pins() that ran inside
    the scope must still be released at exit — identity accounting,
    not a length watermark (a length index would leave them below the
    watermark and leak them)."""
    with cache.pin_scope():
        cache.release_pins()  # registry rewritten under the scope
        late = cache.pin(docs.select("doc_id"))
        late.count()
        assert cache.pinned_count() == 1
    assert cache.pinned_count() == 0
    assert not late.storageLevel.useMemory  # actually unpersisted
    assert _cache_empty(spark)


def test_pin_scope_holds_entry_pins_alive(spark, docs):
    """ADVICE r14: the scope records entry-time pins as STRONG
    references, not bare id()s. If release_pins() inside the scope
    dropped the registry's reference and the DataFrame were collected,
    a later pin could reuse the freed id() and be misclassified as
    pre-existing at exit (leaked past the scope). Holding the objects
    makes id reuse impossible for the scope's lifetime."""
    import gc
    import weakref

    pre = cache.pin(docs.select("doc_id"))
    pre.count()
    ref = weakref.ref(pre)
    with cache.pin_scope() as scope:
        cache.release_pins()  # registry drops its reference
        del pre  # caller drops theirs too
        gc.collect()
        assert ref() is not None  # the scope itself keeps it alive
        assert any(ref() is b for b in scope._before)
        late = cache.pin(docs.select("text"))
        late.count()
    # the late pin was correctly classified as scope-owned and released
    assert cache.pinned_count() == 0
    assert not late.storageLevel.useMemory
    gc.collect()
    assert ref() is None  # exit drops the held references
    assert _cache_empty(spark)
