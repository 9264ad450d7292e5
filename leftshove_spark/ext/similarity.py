"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force top-k** — exact cosine of every (query, corpus) pair.
  Correctness baseline and the right plan when the query set is small
  (it is a broadcast nested-loop with the tiny query side broadcast).
  Embeddings are quantized to integers so the dot product is EXACT
  integer arithmetic — order-independent, hence bit-identical in any
  engine — and cosine is then two deterministic IEEE ops on exact ints.

- **LSH-bucketed ANN** — sign-random-projection buckets from
  hash-derived hyperplanes (deterministic, no RNG state): candidates
  share a bucket, exact cosine reranks. The 100 TB path: the corpus
  shuffles once on bucket id; no cross join exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash60

QUANT_SCALE = 1000  # float → round(x*1000) as bigint; matches F3's quantization
# LSH: 8 sign bits → 256 buckets. Sized for the fixture corpus; at real
# scale raise planes with corpus size (buckets ≈ corpus/1k) — recall is
# then recovered by multi-probe, which is O(planes) extra lookups.
N_PLANES = 8


def quantize(vec: Column | str) -> Column:
    """array<float> → array<bigint> at 3 decimal places. Exact from then
    on: integer dot products are order-independent."""
    col = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def cosine_from_quantized(a: Column, b: Column) -> Column:
    """Cosine from quantized vectors: exact int dot / (sqrt·sqrt).
    Identical IEEE results everywhere since all inputs are exact ints."""
    return int_dot(a, b).cast("double") / (
        F.sqrt(int_dot(a, a).cast("double")) * F.sqrt(int_dot(b, b).cast("double"))
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query side into a nested-loop join —
    the corpus streams through once, never shuffles. Rank window
    partitions by query id (small), ordered by (cosine desc, id) for a
    total deterministic order."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_from_quantized(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane(p: int, dim: int) -> list[int]:
    """Deterministic hyperplane p: component j from the cross-engine
    hash, mapped to [-1000, 1000]. No RNG state — reproducible anywhere."""
    # driver-side ints via the same md5 definition as hash60
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"plane{p}_{j}".encode()).hexdigest()[:15], 16)
        out.append(h % 2001 - 1000)
    return out


def lsh_bucket(vec_q: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Sign-random-projection bucket id: bit p = sign of <plane_p, v>.
    Planes are literal int arrays (driver-side deterministic), so the
    projection is an exact integer dot — the bucket id is reproducible
    bit-for-bit on any engine or cluster."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x).cast("long") for x in _plane(p, dim)])
        dot = F.aggregate(
            F.zip_with(plane, vec_q, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k: bucket join on the SRP signature with hamming-1
    multi-probe (each query also probes the n_planes buckets one bit
    away), exact cosine rerank within buckets. At 100 TB the corpus
    shuffles once on bucket id; each query touches (1+planes) buckets'
    rows — never the whole corpus."""
    q = queries.select(F.col(id_col).alias("query_id"), quantize(vec_col).alias("qv"))
    q = q.withColumn("bucket0", lsh_bucket(F.col("qv"), dim, n_planes))
    # multi-probe: own bucket + every bucket within hamming distance 2.
    # Probe count is 1 + p + p(p-1)/2 (37 at p=8) — constant per query,
    # independent of corpus size; recall rises steeply with probes on
    # weakly-clustered data (random vectors are SRP-LSH's worst case).
    flips = [0] + [1 << p for p in range(n_planes)]
    flips += [
        (1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)
    ]
    probes = F.array(*[F.col("bucket0").bitwiseXOR(F.lit(m)) for m in flips])
    q = q.withColumn("bucket", F.explode(probes)).drop("bucket0")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("cv"))
    c = c.withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .drop("bucket")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_from_quantized(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). This is the exact all-pairs baseline — correct at oracle
    scale; the 100 TB path replaces the self-join condition with the
    LSH bucket equality from :func:`knn_lsh` (same verify step)."""
    v = df.select(F.col(id_col).alias("id"), quantize(vec_col).alias("qv")).repartition("id")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cosine_from_quantized(F.col("a.qv"), F.col("b.qv")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
