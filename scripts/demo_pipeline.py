"""End-to-end training-data pipeline demo — the engine's LLM-corpus
operators composed into the pipeline they exist for, with per-stage
row accounting:

    ingest → quality gate → exact dedup → MinHash-LSH near-dup →
    connected components → keep-one-per-cluster → decontaminate
    (drop eval collisions) → deterministic split + per-source cap →
    greedy sequence packing

Every stage is an operator that is ALSO individually hash-certified in
the driver gate (see queries_ext.py); this script shows they compose —
each stage consumes the previous stage's DataFrame, nothing
materializes until the final counts. Run:

    python scripts/demo_pipeline.py [sf_dir]

Prints one JSON line of stage counts, then PIPELINE DEMO OK.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from leftshove_spark.ext import dedup as D  # noqa: E402
from leftshove_spark.ext import graph as G  # noqa: E402
from leftshove_spark.ext import pipeline as P  # noqa: E402
from leftshove_spark.ext import text as X  # noqa: E402
from leftshove_spark.session import get_spark  # noqa: E402
from leftshove_spark.sources import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="leftshove-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    counts: dict[str, int] = {}

    docs = load_table(spark, SF, "documents")
    counts["ingested"] = docs.count()

    # 1. quality gate (narrow Arrow pass, zero shuffles)
    gated_ids = X.quality_filter(docs, min_tokens=20, min_uniq_ratio=0.5,
                                 min_quality=0.3).select("doc_id")
    docs = docs.join(gated_ids, "doc_id")
    counts["after_quality_gate"] = docs.count()

    # 2. near-dup mining: LSH pairs -> connected components -> keep one
    pairs = D.minhash_lsh_pairs(docs, jaccard_threshold=0.6)
    comp = G.connected_components(pairs.select("id_a", "id_b"))
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    counts["after_near_dedup"] = docs.count()

    # 3. decontamination: drop docs colliding with the eval slice
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    hits = P.decontaminate(corpus, bench).select("doc_id")
    docs = corpus.join(hits, "doc_id", "left_anti")
    counts["after_decontaminate"] = docs.count()

    # 4. deterministic split + per-source cap (pure id functions —
    #    stable under retries and incremental ingestion)
    docs = P.hash_split(docs)
    docs = P.sample_k_per_group(docs, ["split", "source"], k=8)
    counts["after_split_and_cap"] = docs.count()

    # 5. greedy sequence packing within the training split (token
    #    counting feeds the packer its budget column)
    train = docs.filter(F.col("split") == "train")
    tc = X.token_counts(train).select(
        "doc_id", F.col("n_ws_tokens").alias("n_tokens")
    )
    packed = P.pack_sequences(tc, budget=512)
    counts["packed_sequences"] = packed.select("bucket", "seq_id").distinct().count()

    print(json.dumps(counts))
    assert counts["ingested"] > counts["after_quality_gate"] >= counts[
        "after_near_dedup"
    ] > counts["after_decontaminate"] >= counts["after_split_and_cap"] > 0
    assert counts["packed_sequences"] > 0
    print("PIPELINE DEMO OK")
    spark.stop()


if __name__ == "__main__":
    main()
