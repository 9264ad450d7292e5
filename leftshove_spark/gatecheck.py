"""Local mirror of the driver's correctness-gate canonicalization.

Two rounds running, the only driver reds were LOCAL-NET DIVERGENCE, not
wrong answers: r6 compared via ``fetchall()`` (DuckDB HUGEINT arrives as
a Python int) while the driver fetches through pandas (HUGEINT →
float64, so ``7243`` hash-diverges from ``7243.0``); r7 compared via
``str()``-joined tuples (lists/bytearrays stringify fine) while the
driver canonicalizes with a pandas ``sort_values`` over all columns
(TypeError: unhashable type before any compare). The durable fix is to
mirror the driver's *mechanism*, not just its comparison semantics —
this module is that mirror, shared by ``tests/test_gate_tail_oracle.py``
and ``scripts/check_oracle.py`` so any future driver-canon
incompatibility fails locally first.

Mechanism mirrored here:
- the oracle frame is fetched via DuckDB's pandas path (``res.df()``),
  inheriting its Arrow coercions (HUGEINT→float64, BLOB→bytearray,
  TIMESTAMP→datetime64) — the r6 class reproduces locally;
- both frames are canonicalized by column-name reorder + a pandas
  ``DataFrame.sort_values`` over ALL columns — the exact call that blew
  up on r7's ARRAY/BINARY cells reproduces locally;
- values then compare as order-insensitive normalized row strings
  (null-likes unify to NULL; numpy scalars unwrap so ``np.float64``
  reprs match Python floats).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def norm_cell(v) -> str:
    """One cell → its comparison string. numpy scalars unwrap first
    (numpy 2.x ``repr(np.float64(0.1))`` is ``np.float64(0.1)``, not
    ``0.1``); all null-likes (None / NaN / NaT / pd.NA) unify to NULL
    because the two fetch paths surface SQL NULL differently."""
    if v is None or v is pd.NaT or v is getattr(pd, "NA", None):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        f = float(v)
        # the pandas fetch collapses NULL doubles to NaN, so NaN and
        # NULL are indistinguishable after the driver's fetch — unify
        # (c16's NULL-typed battery is driver-green, proving the driver
        # treats them as equal too)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def canon(cols, rows) -> tuple[list[str], list[str]]:
    """Canonicalize a result set the way the driver does: build a pandas
    frame, reorder columns by name, ``sort_values`` over all columns
    (raises TypeError on unhashable ARRAY/MAP/STRUCT/BINARY cells — by
    design: that IS the driver's failure mode and it must reproduce
    locally), then emit sorted normalized row strings.

    ``rows`` may be a list of tuples/Rows or an already-built pandas
    DataFrame (the DuckDB ``res.df()`` fetch).
    """
    if isinstance(rows, pd.DataFrame):
        pdf = rows
    else:
        pdf = pd.DataFrame(list(rows), columns=list(cols))
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf) and len(pdf.columns):
        # the driver's mechanism — keep even though the output is
        # re-sorted below, so unsortable cell types fail here first
        pdf = pdf.sort_values(by=list(pdf.columns))
    sig = sorted(
        "|".join(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return list(pdf.columns), sig


def fetch_oracle(con, sql) -> tuple[list[str], pd.DataFrame]:
    """Run oracle SQL and fetch through DuckDB's pandas path — the
    driver's fetch, with its Arrow type coercions intact."""
    res = con.execute(sql)
    pdf = res.df()
    return list(pdf.columns), pdf


def compare(scols, srows, con, oracle_sql):
    """Full driver-shaped compare; returns (ok, detail)."""
    ocols, opdf = fetch_oracle(con, oracle_sql)
    s_cols, s_sig = canon(scols, srows)
    o_cols, o_sig = canon(ocols, opdf)
    if s_cols != o_cols:
        return False, f"columns differ: spark={s_cols} oracle={o_cols}"
    if len(s_sig) != len(o_sig):
        return False, f"row counts differ: spark={len(s_sig)} oracle={len(o_sig)}"
    if s_sig != o_sig:
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_sig, o_sig)) if a != b),
            len(s_sig) - 1,
        )
        return False, (
            f"values differ at sorted row {diff}:\n"
            f"  spark:  {s_sig[diff][:400]}\n"
            f"  oracle: {o_sig[diff][:400]}"
        )
    return True, f"{len(s_sig)} rows"
