"""leftshove_spark.ext — LLM-training-data pipeline operators.

The reference stops at relational CDC; a 100 TB training-data pipeline
additionally needs (north star, SURVEY.md §7 Phase 5):

- :mod:`.hashing`     — cross-engine deterministic 60-bit hash primitive
- :mod:`.text`        — tokenization, quality stats, language ID, token
                        counting, document fingerprints
- :mod:`.dedup`       — exact (hash groupBy), MinHash+LSH (banded bucket
                        join), SimHash (chunk-pigeonhole), n-gram Jaccard
- :mod:`.similarity`  — top-k cosine over embeddings: brute-force baseline
                        + LSH-bucketed ANN scale path
- :mod:`.multimodal`  — opaque binary media columns with typed metadata;
                        Arrow-batched decode/feature/frame-sample stubs

Everything outside multimodal decode is built-in Spark expressions (JVM
codegen, no Python in the hot path); multimodal decoding is mapInPandas
(Arrow batches), stubbed deterministically where codec libs are absent.
"""

from . import dedup, hashing, multimodal, similarity, text  # noqa: F401
