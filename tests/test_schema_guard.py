"""make_schema_drift_guard (streaming.py, W30) — unit pins for the
guard itself, independent of the live pipeline:

- an added TOP-LEVEL column raises, naming the field;
- an added NESTED struct field raises too (r16 review: top-level-name
  comparison silently passed `meta.lang` — the exact silent-drop hole
  the guard exists to close), through arrays of structs as well;
- a flagged file is NOT marked examined: every retry of the failing
  batch re-raises (Structured Streaming retries must never sail past);
- narrower files pass (NULL-padding is legitimate), and clean files
  are footer-read ONCE (the mtime-cursor de-dup).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from leftshove_spark.streaming import (
    _spark_field_paths,
    make_schema_drift_guard,
)


def _write(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_guard_flags_top_level_and_nested_additions(spark, tmp_path):
    landing = str(tmp_path / "landing")
    base = spark.createDataFrame(
        [(1, "a", {"source": "s"}, [{"tag": "t"}])],
        "id long, text string, meta struct<source:string>, "
        "anns array<struct<tag:string>>",
    )
    _write(base, landing)
    pinned = spark.read.parquet(landing).schema
    guard = make_schema_drift_guard(landing, pinned)
    guard()  # clean corpus passes

    # nested struct addition: meta.lang
    _write(
        spark.createDataFrame(
            [(2, "b", ("s", "en"), [("t",)])],
            "id long, text string, "
            "meta struct<source:string, lang:string>, "
            "anns array<struct<tag:string>>",
        ),
        landing,
    )
    with pytest.raises(ValueError, match="meta.lang"):
        guard()
    # the flagged file is NOT remembered — a batch retry re-raises
    with pytest.raises(ValueError, match="meta.lang"):
        guard()


def test_guard_flags_addition_inside_array_of_structs(spark, tmp_path):
    landing = str(tmp_path / "landing")
    base = spark.createDataFrame(
        [(1, [{"tag": "t"}])], "id long, anns array<struct<tag:string>>"
    )
    _write(base, landing)
    guard = make_schema_drift_guard(landing, spark.read.parquet(landing).schema)
    guard()
    _write(
        spark.createDataFrame(
            [(2, [("t", 0.5)])],
            "id long, anns array<struct<tag:string, score:double>>",
        ),
        landing,
    )
    with pytest.raises(ValueError, match="anns.element.score"):
        guard()


def test_guard_passes_narrow_files_and_reads_footers_once(
    spark, tmp_path, monkeypatch
):
    landing = str(tmp_path / "landing")
    wide = spark.createDataFrame(
        [(1, "a", "en")], "id long, text string, lang string"
    )
    _write(wide, landing)
    guard = make_schema_drift_guard(landing, spark.read.parquet(landing).schema)
    guard()

    # a NARROWER file is legitimate (the source NULL-pads it)
    _write(spark.createDataFrame([(2, "b")], "id long, text string"), landing)
    guard()

    # footer reads are de-duped via the cursor: with the footer reader
    # bombed, re-checking an unchanged dir must do no reads at all
    import pyarrow.parquet as pq

    real = pq.read_schema
    calls = {"n": 0}

    def counting(path, *a, **kw):
        calls["n"] += 1
        return real(path, *a, **kw)

    monkeypatch.setattr(pq, "read_schema", counting)
    guard()
    first_pass = calls["n"]
    guard()
    # old files (mtime behind the cursor window after the slack) may be
    # re-read only while inside the 60 s slack window and are then
    # de-duped by the seen map — never MORE reads than files
    assert calls["n"] - first_pass <= first_pass
    assert first_pass <= 2  # at most once per landed file


def test_spark_field_paths_cover_nesting(spark):
    sch = spark.createDataFrame(
        [(1, {"a": 1}, {"k": {"x": "y"}}, [{"t": 1}])],
        "id long, m struct<a:int>, mp map<string,struct<x:string>>, "
        "arr array<struct<t:int>>",
    ).schema
    paths = _spark_field_paths(sch)
    assert {"id", "m", "m.a", "mp", "mp.value.x", "arr", "arr.element.t"} <= paths
