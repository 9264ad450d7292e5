"""Runtime bloom-filter join pruning — the explicit form of the
runtime-filter / dynamic-partition-pruning pattern every warehouse
engine applies to selective star joins.

The reference pushes its joins down to Postgres/BigQuery, where the
planner injects semi-join reductions on its own (postgres.go:43-115);
Spark likewise injects bloom runtime filters only under narrow
conditions (`spark.sql.optimizer.runtime.bloomFilter.*`, shuffle-join
creation-side limits). This operator makes the reduction EXPLICIT and
unconditional: build a bounded bitmap from the dimension's join keys,
prune the fact side map-side BEFORE its shuffle, then run the exact
join — semantics identical to the plain join (a bloom has false
positives, never false negatives; the join removes the fps), which is
exactly what the k13 gate query proves against a bloom-less oracle.

Memory contract at 100 TB: the bitmap is O(m_bits) REGARDLESS of
dimension size — the middle ground between "dim small enough to
broadcast-join outright" (no bloom needed) and "dim so large its
key-set can't be summarized" (bloom useless). The build aggregates
DISTINCT bit positions — the only shuffle moves ≤ min(n·j, m_bits)
position rows — and the driver collects m_bits/64 packed words
(control-plane class, like watermark scalars). The prune is pure
codegen: j hash60 evaluations + j bit tests per fact row, no shuffle,
no UDF. Two delivery modes for the bitmap:

- ``m_bits ≤ 2^16``: compiled into the filter as ONE folded literal
  array (1024 longs) — the filter is a plain scan-level predicate.
- larger bitmaps: shipped as a single broadcast row and tested via
  ``element_at`` — a one-row broadcast nested-loop (linear: one
  broadcast row per stream row, the sanctioned single-row-scalar BNLJ
  shape), keeping multi-MB bitmaps out of the plan tree.

False-positive rate: (1 − e^{−j·n/m})^j — size m_bits to ~20× the dim
key count for fp < 1%.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ext.hashing import hash60

BLOOM_M_BITS = 1 << 16
BLOOM_HASHES = 3
_LITERAL_MAX_BITS = 1 << 16


def _positions(key: Column, m_bits: int, n_hashes: int, salt: str) -> list[Column]:
    """j independent bit positions per key: hash60 over j salted copies
    (independent salts ≈ independent hash functions), folded mod m."""
    return [
        hash60(F.concat(F.lit(f"{salt}{i}:"), key.cast("string"))) % F.lit(m_bits)
        for i in range(n_hashes)
    ]


def _might_contain(
    key: Column, words: Column, m_bits: int, n_hashes: int, salt: str
) -> Column:
    """Membership test against a packed-words array column/literal:
    TRUE for every inserted key, falsely TRUE at the documented fp
    rate; NULL keys test NULL (pruned — sound for inner/semi joins,
    the only joins this operator serves)."""
    checks = []
    for p in _positions(key, m_bits, n_hashes, salt):
        word = F.element_at(words, ((p - p % 64) / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        checks.append(bit == 1)
    return reduce(lambda a, b: a & b, checks)


def build_bloom(
    dim: DataFrame,
    key_col: str,
    *,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bf",
) -> list[int]:
    """Driver-side packed bitmap (m_bits/64 longs) covering every
    non-null dimension key. One distinct-position aggregation — shuffle
    volume ≤ min(|dim|·j, m_bits) rows — then an O(m_bits/64) collect."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = dim.select(
        F.explode(
            F.array(*_positions(F.col(key_col), m_bits, n_hashes, salt))
        ).alias("p")
    ).dropna()
    words = (
        pos.distinct()
        .groupBy((F.col("p") - F.col("p") % 64).alias("w64"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
                )
            ).alias("bits")
        )
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w64"]) // 64] = int(r["bits"])
    return out


def bloom_might_contain(
    key: Column,
    bitmap: list[int],
    *,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bf",
) -> Column:
    """Literal-mode membership test — the bitmap folds into the plan as
    one constant array, so the prune is a plain scan-level predicate.
    Use only for bitmaps ≤ 2^16 bits; ship bigger ones by broadcast
    (:func:`bloom_pruned_join`)."""
    return _might_contain(
        key,
        F.array(*[F.lit(w) for w in bitmap]),
        len(bitmap) * 64,
        n_hashes,
        salt,
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    *,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bf",
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` on ``key_col`` with the fact side bloom-pruned
    before its shuffle. Result ≡ the plain join (oracle-certified by
    k13): the bloom admits every true match, the join removes the
    false positives. ``how`` must be a fact-reducing join (inner /
    left_semi) — pruning the probe side of an outer join would drop
    its unmatched rows."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom pruning is unsound for {how!r} joins")
    bitmap = build_bloom(dim, key_col, m_bits=m_bits, n_hashes=n_hashes, salt=salt)
    if m_bits <= _LITERAL_MAX_BITS:
        pruned = fact.filter(
            bloom_might_contain(
                F.col(key_col), bitmap, n_hashes=n_hashes, salt=salt
            )
        )
    else:
        # one broadcast row carrying the packed words; the BNLJ this
        # plans is linear (1 broadcast row per stream row)
        spark = fact.sparkSession
        bm = spark.createDataFrame([(bitmap,)], "__bloom array<bigint>")
        pruned = (
            fact.join(F.broadcast(bm))
            .filter(
                _might_contain(
                    F.col(key_col), F.col("__bloom"), m_bits, n_hashes, salt
                )
            )
            .drop("__bloom")
        )
    return pruned.join(dim, key_col, how)
