"""Local mimic of the driver's t2 correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count + column names + order-insensitive stringified values.

Usage: python scripts/check_oracle.py [sf_dir] [name_filter...]
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    import __spark_entry__ as entrymod
    from leftshove_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails, passes, skips = [], [], []
    for name, fn in queries.items():
        if FILTERS and not any(f in name for f in FILTERS):
            continue
        if name not in oracles:
            n = fn(spark, SF).count()
            skips.append(name)
            print(f"SKIP (no oracle, rows={n}): {name}")
            continue
        try:
            # Type lint first: HUGEINT/DECIMAL oracle outputs coerce to
            # float64/decimal128 under the driver's pandas fetch and
            # hash-mismatch Spark even when values agree (r6's q12).
            drifting = [
                (c, t)
                for c, t, *_ in con.execute("DESCRIBE " + oracles[name]).fetchall()
                if t in ("HUGEINT", "UHUGEINT", "DATE") or t.startswith("DECIMAL")
            ]
            if drifting:
                fails.append(name)
                print(f"FAIL {name}: oracle types drift under pandas fetch: {drifting}")
                continue
            sdf = fn(spark, SF)
            srows = sdf.collect()
            scols = sdf.columns
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            s_cols, s_sig = frame_sig(scols, [tuple(r) for r in srows])
            o_cols, o_sig = frame_sig(ocols, orows)
            if s_cols != o_cols:
                fails.append(name)
                print(f"FAIL {name}: columns {s_cols} != {o_cols}")
                continue
            if len(s_sig) != len(o_sig):
                fails.append(name)
                print(f"FAIL {name}: rows {len(s_sig)} != {len(o_sig)}")
                continue
            bad = [(a, b) for a, b in zip(s_sig, o_sig) if a != b]
            if bad:
                fails.append(name)
                print(f"FAIL {name}: {len(bad)} mismatched rows; first:")
                print("  spark :", bad[0][0][:300])
                print("  duckdb:", bad[0][1][:300])
                continue
            passes.append(name)
            print(f"PASS {name} ({len(s_sig)} rows)")
        except Exception as e:
            fails.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:500]}")
    print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} no-oracle")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
