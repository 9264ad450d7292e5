"""Source readers — the engine's scan surface (SURVEY.md §2.1 S1).

The reference's only source is a Postgres windowed scan executed through
Benthos ``sql_raw`` (benthos.go:77-82); our engine's primary source is
parquet (the test harness's format and the natural 100 TB archive format),
with the JDBC mapping documented on :func:`read_jdbc_window`.

Nanosecond-timestamp handling: the driver's synthetic parquet stores
TIMESTAMP(NANOS) columns, which Spark's vectorized reader rejects
([PARQUET_TYPE_ILLEGAL]). With ``spark.sql.legacy.parquet.nanosAsLong``
those columns arrive as LongType nanoseconds; :func:`load_table`
normalizes them back to TimestampType at microsecond precision (floor
division — identical to DuckDB's nanos→micros truncation, so oracle
comparisons agree). Detection is from the parquet footer via pyarrow, so
the mapping is schema-driven, not hardcoded.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _fingerprint(path: str) -> tuple:
    """Cheap change-detection key for a parquet file/dir: (mtime, size)
    of the file, or (file count, max mtime) of the directory. Keying the
    caches on it means in-process appends/rewrites invalidate naturally —
    a bare-path key would keep serving stale footer stats (e.g. the
    broadcast gate still hinting a table that has grown past the
    threshold within one long-lived session)."""
    if os.path.isdir(path):
        parts = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        ]
        return (len(parts), max((os.path.getmtime(p) for p in parts), default=0.0))
    st = os.stat(path)
    return (st.st_mtime, st.st_size)


def _nano_ts_columns(path: str) -> tuple[str, ...]:
    return _nano_ts_columns_cached(path, _fingerprint(path))


@lru_cache(maxsize=256)
def _nano_ts_columns_cached(path: str, _fp: tuple) -> tuple[str, ...]:
    """Columns physically stored as INT64 TIMESTAMP(NANOS) in the parquet
    footer — the encoding Spark can only read via nanosAsLong (as bigint).

    The check must use the parquet PHYSICAL type, not the arrow-converted
    schema: pyarrow reports legacy INT96 timestamps (Spark's own default
    output format) as timestamp[ns] too, but Spark reads INT96 natively
    as TimestampType — normalizing those would corrupt them."""
    # path may be a directory of part files (our sinks) or a single file
    if os.path.isdir(path):
        parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
        if not parts:
            return ()
        path = os.path.join(path, parts[0])
    meta_schema = pq.read_metadata(path).schema
    out = []
    for i in range(len(meta_schema)):
        col = meta_schema.column(i)
        if (
            col.physical_type == "INT64"
            and col.logical_type.type == "TIMESTAMP"
            and '"timeUnit": "nanoseconds"' in col.logical_type.to_json()
        ):
            out.append(col.name)
    return tuple(out)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """``spark.sql.legacy.parquet.nanosAsLong`` must be on for Spark to
    read TIMESTAMP(NANOS) parquet at all ([PARQUET_TYPE_ILLEGAL]
    otherwise). It is runtime-settable in Spark 4.x, and the caller may
    hand us ANY session (the correctness harness builds its own), so the
    conf is (re)applied here — on the read path — not at session build.

    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is forced off for the
    same reason: Spark ≥4.1 infers tz-naive parquet timestamps
    (isAdjustedToUTC=false — the test data's encoding, and DuckDB's
    default output) as TIMESTAMP_NTZ, which ``withWatermark``,
    ``unix_micros`` etc. reject. The session tz is pinned UTC, so reading
    naive values as TIMESTAMP is value-identical to NTZ — and matches the
    DuckDB oracle, whose timestamps are UTC-naive.

    ``spark.sql.session.timeZone`` is pinned UTC here too, not only in
    the session factory: the naive→TIMESTAMP normalization is
    value-identical ONLY under UTC, so an externally-built session in
    any other zone would silently shift every wall-clock value relative
    to the oracle.

    Non-ANSI arithmetic is part of the same session contract (see
    session.py): result-identical for the NULL-safe query corpus, ~17%
    cheaper on scan+agg shapes than Spark 4's checked default."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable conf on some builds; session factory already set it


def cast_ntz_to_timestamp(df: DataFrame) -> DataFrame:
    """Defensive normalization: cast any TIMESTAMP_NTZ column to
    TIMESTAMP. No-op when the NTZ-inference conf above took effect (the
    common case); covers sessions where that conf is immutable or data
    written NTZ explicitly. Value-stable because the session tz is UTC.
    Narrow projection — fused into the scan by codegen, zero cost."""
    from pyspark.sql import types as _T

    ntz = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_parquet_normalized(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, normalizing nano-timestamp columns to TimestampType
    (micros, floor) so all downstream operators see real timestamps. The
    extra projection is a narrow op fused into the scan stage by
    whole-stage codegen — no measurable cost, and filter/column pushdown
    on the remaining columns is unaffected."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        # integer division — double division loses precision on int64 nanos
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return cast_ntz_to_timestamp(df)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table by name from an sf dir."""
    return read_parquet_normalized(spark, os.path.join(sf_dir, f"{name}.parquet"))


def estimate_rows(path: str) -> int:
    """Row-count estimate from parquet footers, driver-side, no Spark job
    — the pg_class-stats analog (postgres.go:144-149). Used to gate
    broadcast hints: cheap enough to call at plan-build time. Cached per
    (path, content fingerprint) so rewrites invalidate."""
    return _estimate_rows_cached(path, _fingerprint(path))


@lru_cache(maxsize=256)
def _estimate_rows_cached(path: str, _fp: tuple) -> int:
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def estimate_bytes(path: str) -> int:
    """Uncompressed-size estimate from parquet footers (sum of row-group
    ``total_byte_size``), driver-side, no Spark job — the companion of
    :func:`estimate_rows` for BYTE-gated decisions. Broadcast hints must
    gate on bytes, not rows: a 10M-row dim of wide strings is multiple
    GB in executor memory even though its row count reads
    dimension-sized. Uncompressed is the right basis — that is what the
    broadcast relation occupies after decoding."""
    return _estimate_bytes_cached(path, _fingerprint(path))


def _meta_total_bytes(md) -> int:
    return sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))


@lru_cache(maxsize=256)
def _estimate_bytes_cached(path: str, _fp: tuple) -> int:
    if os.path.isdir(path):
        return sum(
            _meta_total_bytes(pq.read_metadata(os.path.join(path, f)))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return _meta_total_bytes(pq.read_metadata(path))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)


def read_jdbc_window(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    partition_column: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
    num_partitions: int = 1,
    query_timeout_s: int | None = None,
    fetchsize: int | None = None,
) -> DataFrame:
    """S1's literal JDBC form — a windowed source scan with optional
    intra-table parallelism (the reference runs each table as ONE
    sequential stream, cdc.go:115-140; Spark shards the same window scan
    across ``num_partitions`` executors via partitionColumn bounds, a
    strict scale improvement, SURVEY.md §4).

    ``query_timeout_s`` maps the reference's per-statement timeout
    (``statement_timeout`` from PG_TIMEOUT_MILLIS, postgres.go:34) to the
    Spark JDBC ``queryTimeout`` option (seconds — callers converting from
    the reference's millisecond env var divide by 1000). ``fetchsize``
    is the row-batch envelope of the JDBC cursor (the batching analog of
    benthos.go's count/byte_size knobs). No live JDBC endpoint exists in
    this harness; the option contract is pinned by
    tests/test_jdbc_contract.py against a recording stub reader."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower)
            .option("upperBound", upper)
            .option("numPartitions", str(num_partitions))
        )
    if query_timeout_s is not None:
        reader = reader.option("queryTimeout", str(int(query_timeout_s)))
    if fetchsize is not None:
        reader = reader.option("fetchsize", str(int(fetchsize)))
    return reader.load()


def read_json_explicit_schema(spark: SparkSession, path: str, schema) -> DataFrame:
    """S4 — line-JSON load with a DECLARED schema (bigquery.go:217-250:
    the sample loads ``gs://...json`` into BigQuery with an explicit
    2-field schema instead of autodetect). ``schema`` is a StructType or
    DDL string. Declaring the schema skips Spark's inference pass — at
    100 TB, inference is a full extra scan of the corpus; a declared
    schema makes the load single-pass and keeps corrupt records visible
    via the permissive-mode ``_corrupt_record`` pattern instead of
    silently changing column types."""
    return spark.read.schema(schema).json(path)


def read_landing(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    *,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """Format-agnostic landing reader — raw pipeline data arrives as
    parquet, ORC, CSV, line-JSON, or XML (Spark 4 built-in source);
    normalize all five behind one call (the S1/S4 source surface
    generalized to file landings).

    Parquet routes through :func:`read_parquet_normalized` (nanos
    handling); ORC is self-describing; CSV and JSON REQUIRE an explicit
    schema — inference is a full extra scan of the corpus and guesses
    types, never acceptable at 100 TB. ``mode`` defaults to FAILFAST
    (fail loud on malformed rows); pass PERMISSIVE plus a
    ``columnNameOfCorruptRecord`` option to quarantine bad rows
    instead."""
    if fmt == "parquet":
        # parquet is self-describing and routes through the normalizing
        # reader; a schema/mode here would be silently ignored — refuse
        # loudly instead of pretending to enforce it
        if schema is not None or mode != "FAILFAST" or options:
            raise ValueError(
                "parquet landings are self-describing: schema/mode/options "
                "are not applied — remove them or use csv/json/orc/xml"
            )
        return read_parquet_normalized(spark, path)
    if fmt == "orc":
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.orc(path)
    if fmt in ("csv", "json", "xml"):
        if schema is None:
            raise ValueError(f"{fmt} landing requires an explicit schema")
        reader = spark.read.schema(schema).option("mode", mode).options(**options)
        if fmt == "csv":
            return reader.option("header", options.get("header", "true")).csv(path)
        if fmt == "xml":
            # Spark 4 built-in XML source; rowTag names the repeating
            # record element (same explicit-schema rule as csv/json —
            # XML inference is an extra full scan plus type guessing)
            return reader.option(
                "rowTag", options.get("rowTag", "row")
            ).format("xml").load(path)
        return reader.json(path)
    raise ValueError(f"unsupported landing format: {fmt}")


def parquet_manifest(path: str, columns: list[str] | None = None) -> list[dict]:
    """Per-file statistics manifest of a parquet directory, read from
    footers via pyarrow — NO Spark jobs, so it is a driver-side ops
    tool (the observability half of the layout writers: verify that
    write_clustered/write_zordered produced tight per-file ranges, size
    a compaction, audit a vacuum). Returns one dict per data file:
    ``{file, rows, bytes, stats: {col: (min, max, null_count)}}``,
    stats aggregated over the file's row groups for the requested
    columns (all leaf columns when None).

    At 100 TB the footer reads parallelize trivially (they are
    O(files) metadata fetches); on object stores batch them or read
    the table format's manifest instead — same shape."""
    out: list[dict] = []
    for dp, dns, fs in os.walk(path):
        dns[:] = [d for d in dns if not d.startswith(("_", "."))]
        for f in sorted(fs):
            if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                continue
            fp = os.path.join(dp, f)
            md = pq.ParquetFile(fp).metadata
            names = [md.schema.column(i).path for i in range(md.num_columns)]
            want = set(columns) if columns is not None else set(names)
            stats: dict[str, tuple] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for i in range(g.num_columns):
                    name = names[i]
                    if name not in want:
                        continue
                    st = g.column(i).statistics
                    if st is None or not st.has_min_max:
                        continue
                    prev = stats.get(name)
                    nulls = st.null_count if st.null_count is not None else 0
                    if prev is None:
                        stats[name] = (st.min, st.max, nulls)
                    else:
                        stats[name] = (
                            min(prev[0], st.min),
                            max(prev[1], st.max),
                            prev[2] + nulls,
                        )
            out.append(
                {
                    "file": fp,
                    "rows": md.num_rows,
                    "bytes": os.path.getsize(fp),
                    "stats": stats,
                }
            )
    return out
