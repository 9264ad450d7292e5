"""Connected components + cluster resolution (ext.graph).

The oracle gate (x_dedup_connected_components) checks components over
real minhash edges; here we prove the graph algorithm itself on
adversarial shapes: transitive chains (where the greedy pair-based
resolution provably keeps too much), long paths (multi-round
convergence / pointer jumping), and multiple disjoint components.
"""

from pyspark.sql import functions as F

from leftshove_spark.ext.graph import connected_components, resolve_keep_one_per_component


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_chain_and_disjoint_components(spark):
    # chain 1-2-3 plus pair 10-11 plus singleton edge 20-21
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_long_path_converges(spark):
    # path 0-1-...-19: diameter 19 forces multiple rounds; pointer
    # jumping must still converge well inside the iteration cap
    got = _cc(spark, [(i, i + 1) for i in range(19)])
    assert got == {i: 0 for i in range(20)}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 3), (3, 9)]) == {3: 3, 5: 3, 9: 3}


def test_resolution_keeps_exactly_one_per_cluster(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"]
    )
    # chain 0-1-2 (one cluster), pair 5-6; 3, 4, 7 untouched
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], ["id_a", "id_b"])
    comps = connected_components(edges)
    kept = sorted(
        r["doc_id"]
        for r in resolve_keep_one_per_component(corpus, comps).collect()
    )
    assert kept == [0, 3, 4, 5, 7]
    # greedy pair-based resolution would also drop 1, 2, 6 here — but on
    # a chain a-b, b-c WITHOUT the (a, c) edge it keeps nothing extra
    # only because b is dropped via (a, b); the component form is what
    # guarantees one-per-cluster for arbitrary chain shapes.


def test_connected_components_incremental_equals_scratch(spark):
    """Star-graph fold ≡ from-scratch CC over the full edge history,
    including: a new edge MERGING two existing clusters, a brand-new
    cluster, an untouched cluster, and chain edges inside the batch."""
    from leftshove_spark.ext.graph import (
        connected_components,
        connected_components_incremental,
    )

    e1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    e2 = spark.createDataFrame(
        # merge {1,2,3} with {10,11}; new cluster {30,31,32} as a chain
        [(3, 10), (30, 31), (31, 32)], "id_a long, id_b long"
    )
    labels = connected_components(e1)
    inc = {
        (r["node"], r["component"])
        for r in connected_components_incremental(labels, e2).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in connected_components(e1.unionByName(e2)).collect()
    }
    assert inc == full
    assert (11, 1) in inc and (32, 30) in inc and (21, 20) in inc


def test_pagerank_fixed_star_hub_and_determinism(spark):
    """X57 properties: the hub of a star graph outranks every leaf and
    all leaves tie exactly; a symmetric cycle ranks all nodes equally;
    ranks are a pure function of the edge set (identical across
    repartitionings — int64 mass arithmetic is order-free)."""
    from leftshove_spark.ext.graph import pagerank_fixed

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "id_a long, id_b long"
    )
    r = {x["node"]: x["rank_score"] for x in pagerank_fixed(star).collect()}
    assert all(r[0] > r[i] for i in range(1, 9))
    assert len({r[i] for i in range(1, 9)}) == 1

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "id_a long, id_b long"
    )
    rc = {x["node"]: x["rank_score"] for x in pagerank_fixed(cycle).collect()}
    assert len(set(rc.values())) == 1

    r2 = {
        x["node"]: x["rank_score"]
        for x in pagerank_fixed(star.repartition(5)).collect()
    }
    assert r == r2


def test_reliable_checkpoint_dir_identical_results(spark, tmp_path):
    """The cluster-scale lineage knob: CC and PageRank through a
    RELIABLE checkpoint dir (recoverable blocks — the preemptible-fleet
    mode) produce results identical to the default localCheckpoint
    path, and the dir actually receives checkpoint data."""
    import os

    from leftshove_spark.ext.graph import connected_components, pagerank_fixed

    ckpt = str(tmp_path / "ckpt")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)] + [(40, 41)], "id_a long, id_b long"
    )
    local_cc = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    reliable_cc = {
        (r["node"], r["component"])
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    assert local_cc == reliable_cc

    local_pr = {
        r["node"]: r["rank_score"] for r in pagerank_fixed(edges).collect()
    }
    reliable_pr = {
        r["node"]: r["rank_score"]
        for r in pagerank_fixed(edges, checkpoint_dir=ckpt).collect()
    }
    assert local_pr == reliable_pr
    # the reliable path must really have written checkpoint blocks
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckpt)
        for f in files
    ]
    assert found, "reliable checkpoint dir is empty — localCheckpoint leak?"
