"""ext.pipeline operator invariants (corpus-pipeline stages).

Oracle parity is the driver's job (x_hash_split / x_pii_scan /
x_repetition / x_decontaminate / x_pack_sequences); here we prove the
operator-level contracts: planted positives are found, negatives are
not, assignments are deterministic and partition-stable, packing
respects the budget, and the decontamination plan broadcasts the
benchmark side.
"""

from pyspark.sql import functions as F

from leftshove_spark.ext import pipeline as P
from leftshove_spark.sources import load_table

from conftest import SF0001


def _docs(spark):
    return load_table(spark, SF0001, "documents")


# ------------------------------------------------------------------ PII
def test_pii_detection_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org today"),
            (2, "server 192.168.0.1 and cell +1-650-555-1234"),
            (3, "ssn is 123-45-6789 ok"),
            (4, "perfectly clean text with no secrets"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in P.pii_signals(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_pii"] == 1
    assert got[2]["n_ipv4"] == 1 and got[2]["n_phone"] == 1 and got[2]["n_pii"] == 2
    assert got[3]["n_ssn"] == 1
    assert got[4]["n_pii"] == 0
    red = df.select("doc_id", P.redact("text").alias("r")).collect()
    red = {r["doc_id"]: r["r"] for r in red}
    assert red[1] == "mail me at <EMAIL> today"
    assert red[2] == "server <IPV4> and cell <PHONE>"
    assert red[3] == "ssn is <SSN> ok"
    assert red[4] == "perfectly clean text with no secrets"  # untouched


# ------------------------------------------------------- decontamination
def test_decontaminate_flags_only_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox run away"),  # shares 3-grams
            (2, "completely unrelated words about spark shuffles"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in P.decontaminate(corpus, bench).collect()}
    assert set(out) == {1}
    # "the quick brown" + "quick brown fox" of doc 1's six 3-grams
    assert out[1]["n_hit"] == 2 and out[1]["n_shingles"] == 6
    assert abs(out[1]["contamination"] - 2 / 6) < 1e-12


def test_decontaminate_corpus_side_map_only(spark):
    """r16: the non-attributed pass is fused map-only — the eval set's
    hashes ride the task closure, so the plan has NO join and NO
    aggregation; the corpus crosses one Arrow stage and a filter. (The
    attributed variant keeps the broadcast-join shape — pinned below.)"""
    docs = _docs(spark)
    plan = P.decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0), docs.filter(F.col("doc_id") % 97 == 0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan
    assert "MapInPandas" in plan
    plan_attr = P.decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        attribute=True,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_attr  # corpus never shuffles for the join


# ------------------------------------------------------------ hash split
def test_hash_split_deterministic_cover_and_ratio(spark):
    docs = _docs(spark)
    a = P.hash_split(docs).select("doc_id", "split")
    b = P.hash_split(docs.repartition(7)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0  # pure function of the id
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == docs.count()  # disjoint cover: one split per doc
    assert 0.85 < counts["train"] / n < 0.95
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_stratified_sample_rates_and_subset(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "*": 0.1}
    s = P.stratified_sample(docs, rates, "lang")
    assert s.join(docs, "doc_id", "left_anti").count() == 0  # subset
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_rate = got.get("en", 0) / tot["en"]
    assert 0.35 < en_rate < 0.65
    rest_tot = sum(v for k, v in tot.items() if k != "en")
    rest_got = sum(v for k, v in got.items() if k != "en")
    assert rest_got / rest_tot < 0.25
    # independent salts: sampling not correlated with split assignment
    tr = P.hash_split(docs).filter(F.col("split") == "train")
    s_in_train = s.join(tr, "doc_id", "left_semi").count()
    assert 0.7 < s_in_train / s.count() < 1.0


# ------------------------------------------------------------ repetition
def test_repetition_flags_planted_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 50),  # 2 tokens repeated -> degenerate
            (2, " ".join(f"w{i} x{i} y{i}" for i in range(40))),  # all distinct
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in P.repetition_signals(df).collect()}
    assert got[1]["is_repetitive"] and got[1]["dup_2gram_frac"] > 0.9
    assert not got[2]["is_repetitive"]
    assert got[2]["dup_2gram_frac"] == 0.0 and got[2]["top_token_frac"] < 0.05


# --------------------------------------------------------------- packing
def test_pack_sequences_budget_and_coverage(spark):
    docs = _docs(spark)
    withn = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), "[^a-z0-9]+")).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    budget = 256
    out = P.pack_sequences(withn, budget=budget, n_buckets=8)
    rows = out.collect()
    assert len(rows) == withn.count()  # every doc packed exactly once
    # per-(bucket, seq): total <= budget unless the seq is one oversized doc
    seqs: dict[tuple, list] = {}
    for r in rows:
        seqs.setdefault((r["bucket"], r["seq_id"]), []).append(r["n_tokens"])
    for toks in seqs.values():
        assert sum(toks) <= budget or len(toks) == 1
    # seq ids contiguous from 0 per bucket
    by_bucket: dict[int, set] = {}
    for b, s in seqs:
        by_bucket.setdefault(b, set()).add(s)
    for ids in by_bucket.values():
        assert ids == set(range(len(ids)))
    # greedy parity with a local reference on one bucket
    b0 = sorted((r["doc_id"], r["n_tokens"]) for r in rows if r["bucket"] == 0)
    seq = acc = 0
    for doc_id, n in b0:
        if acc > 0 and acc + n > budget:
            seq, acc = seq + 1, 0
        acc += n
        got = next(r["seq_id"] for r in rows if r["doc_id"] == doc_id)
        assert got == seq


def test_pack_sequences_with_bpe_counts_parity(spark):
    """X59 composition: pack_sequences consumes bpe_token_counts
    exactly as it consumes the regex proxy — same packing mechanics
    (every doc packed once, budget respected, greedy order identical),
    only the WEIGHTS change. Also pins the relationship that makes BPE
    counts worth wiring in: merges only shrink counts, so
    n_tokens_bpe <= the character count and a merged corpus packs into
    no MORE sequences than unmerged characters would."""
    from leftshove_spark.ext.text import bpe_token_counts

    docs = _docs(spark)
    counts = bpe_token_counts(docs).filter(F.col("n_tokens_bpe") > 0)
    budget = 256
    out = P.pack_sequences(
        counts, token_count_col="n_tokens_bpe", budget=budget, n_buckets=8
    )
    rows = out.collect()
    assert len(rows) == counts.count()  # every doc packed exactly once
    seqs: dict[tuple, list] = {}
    for r in rows:
        seqs.setdefault((r["bucket"], r["seq_id"]), []).append(r["n_tokens"])
    for toks in seqs.values():
        assert sum(toks) <= budget or len(toks) == 1
    # weights really are the BPE counts, and they are <= chars-per-word
    # sums (merges only shrink) while > 0
    got_w = {r["doc_id"]: r["n_tokens"] for r in rows}
    for r in counts.collect():
        assert got_w[r["doc_id"]] == r["n_tokens_bpe"]
        assert 0 < r["n_tokens_bpe"] <= r["n_tokens_bpe"] + r["n_merges"]
    # token_budget_cap composes identically: the capped set's cumulative
    # BPE mass respects the budget per group
    capped = P.token_budget_cap(
        counts.withColumn("g", F.lit(1)),
        budget_per_group=2000,
        group_cols="g",
        weight_col="n_tokens_bpe",
        keep_cum=True,
    )
    caps = capped.collect()
    assert caps and max(r["cum_weight"] for r in caps) <= 2000


def test_split_by_component_is_leakage_proof(spark):
    """X61 invariants: (a) every member of a near-dup component shares
    a split; (b) the split_leakage audit over the component split finds
    ZERO cross-split near-dup pairs (the audit that SHOULD find some
    under plain hash_split on this planted-twin corpus); (c) docs with
    no near-dup evidence get exactly their hash_split assignment (same
    salt — strict generalization)."""
    from leftshove_spark.ext.dedup import minhash_lsh_pairs
    from leftshove_spark.ext.graph import connected_components

    base = load_table(spark, SF0001, "documents").select("doc_id", "text")
    t = F.split(F.lower("text"), "[^a-z0-9]+")
    twins = base.filter(F.size(t) > 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.slice(t, 6, F.size(t) - 5)).alias("text"),
    )
    corpus = base.unionByName(twins)
    pairs = minhash_lsh_pairs(corpus, jaccard_threshold=0.6)
    comp = connected_components(pairs)
    out = P.split_by_component(corpus, comp)

    # (a) one split per component
    assert (
        out.join(
            comp.withColumnRenamed("node", "doc_id"), "doc_id"
        )
        .groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # (b) zero cross-split near-dup leakage, where plain hash_split leaks
    def leaks(frame):
        lhs = frame.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
        rhs = frame.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
        return (
            pairs.join(lhs, "id_a").join(rhs, "id_b")
            .filter(F.col("sa") != F.col("sb"))
            .count()
        )

    assert leaks(out) == 0
    plain = P.hash_split(corpus)
    assert leaks(plain) > 0  # the corpus genuinely would have leaked
    # (c) edge-free docs match hash_split exactly
    edge_nodes = comp.select(F.col("node").alias("doc_id"))
    free = out.join(edge_nodes, "doc_id", "left_anti").select("doc_id", "split")
    ref = plain.join(edge_nodes, "doc_id", "left_anti").select(
        F.col("doc_id"), F.col("split").alias("ref_split")
    )
    assert (
        free.join(ref, "doc_id")
        .filter(F.col("split") != F.col("ref_split"))
        .count()
        == 0
    )


# ------------------------------------------------------------ mixture
def test_mixture_sample_uniform_waterfills_to_rarest(spark):
    docs = load_table(spark, SF0001, "documents")
    out = P.mixture_sample(docs, source_col="lang")
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    mn = min(tot.values())
    # binding (rarest) language kept whole; others near the water line
    rarest = min(tot, key=tot.get)
    assert got[rarest] == tot[rarest]
    for lang, n in got.items():
        assert n <= tot[lang]  # down-sample only
        # hash-bucket granularity: within a few rows of the target
        assert abs(n - mn) <= max(3, mn * 0.25)
    # deterministic: pure function of the id
    again = P.mixture_sample(docs.repartition(7), source_col="lang")
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_mixture_sample_explicit_weights_and_drops(spark):
    docs = load_table(spark, SF0001, "documents")
    out = P.mixture_sample(
        docs, source_col="lang", targets={"en": 0.5, "zh": 0.25, "de": 0.25}
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in got and "es" not in got  # weight-0 sources dropped
    # output mixture approximates 2:1:1 (hash granularity on small n)
    assert got["en"] >= got["zh"] and got["en"] >= got["de"]
    rates = {r["lang"]: r["rate"] for r in out.select("lang", "rate").distinct().collect()}
    assert all(0.0 < v <= 1.0 for v in rates.values())


def test_mixture_sample_corpus_never_shuffles(spark):
    docs = load_table(spark, SF0001, "documents")
    plan = (
        P.mixture_sample(docs, source_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus joins the broadcast rate table; any Exchange in the plan
    # belongs to the tiny per-source count aggregation
    assert "BroadcastHashJoin" in plan


def test_sample_k_per_group_stable_under_repartition(spark):
    """The md5-rank membership is a pure function of the id: the sample
    is identical at any physical partitioning, and different salts give
    different draws."""
    from leftshove_spark.ext.pipeline import sample_k_per_group
    from leftshove_spark.sources import load_table

    docs = load_table(spark, SF0001, "documents").select("doc_id", "source")
    base = {
        (r["doc_id"], r["source"])
        for r in sample_k_per_group(docs, "source", k=5).collect()
    }
    shuffled = {
        (r["doc_id"], r["source"])
        for r in sample_k_per_group(docs.repartition(7), "source", k=5).collect()
    }
    assert base == shuffled
    other_salt = {
        (r["doc_id"], r["source"])
        for r in sample_k_per_group(docs, "source", k=5, salt="other:").collect()
    }
    assert other_salt != base
    sizes = sample_k_per_group(docs, "source", k=5).groupBy("source").count()
    assert all(r["count"] <= 5 for r in sizes.collect())


def test_epoch_shuffle_is_deterministic_independent_permutation(spark):
    """Each epoch is an exact permutation 1..N of the corpus; the order
    is a pure function of (epoch, id) — identical under repartitioning
    — and different epochs give genuinely different orders."""
    from leftshove_spark.ext.pipeline import epoch_shuffle
    from leftshove_spark.sources import load_table

    docs = load_table(spark, SF0001, "documents").select("doc_id")
    n = docs.count()

    e0 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(docs, 0).collect()}
    assert sorted(e0.values()) == list(range(1, n + 1))  # exact permutation

    # stable under physical layout changes (retry / different cluster)
    e0b = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs.repartition(7), 0).collect()
    }
    assert e0 == e0b

    e1 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(docs, 1).collect()}
    assert sorted(e1.values()) == list(range(1, n + 1))
    moved = sum(1 for k in e0 if e0[k] != e1[k])
    assert moved > n * 0.9  # epochs are independent draws


def test_token_budget_cap_prefix_and_stability(spark):
    """Budget cap keeps exactly the md5-ranked prefix whose cumulative
    weight fits the budget, per group — never exceeds the budget, is a
    pure id function (repartition-stable), and admits strictly more
    under a bigger budget (monotone)."""
    from leftshove_spark.ext.pipeline import token_budget_cap
    from leftshove_spark.sources import load_table

    docs = load_table(spark, SF0001, "documents").select("doc_id", "lang", "n_chars")
    small = token_budget_cap(docs, 5000, "lang", weight_col="n_chars", keep_cum=True)
    rows = small.collect()
    assert rows, "budget must admit something at sf0.001"
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in per_lang.items():
        assert max(x["cum_weight"] for x in rs) <= 5000
        # cum_weight of the kept set is exactly the running sum of its
        # own weights under the deterministic order -> a true prefix
        assert sorted(x["cum_weight"] for x in rs)[-1] == sum(x["n_chars"] for x in rs)

    stable = token_budget_cap(
        docs.repartition(7), 5000, "lang", weight_col="n_chars", keep_cum=True
    )
    assert {r["doc_id"] for r in stable.collect()} == {r["doc_id"] for r in rows}

    big = token_budget_cap(docs, 20000, "lang", weight_col="n_chars")
    assert {r["doc_id"] for r in rows} <= {r["doc_id"] for r in big.collect()}


def test_dataset_fingerprint_order_and_partition_invariant(spark):
    """The fingerprint must be identical for any row order / partition
    layout of the same multiset, differ when one document changes, and
    catch an even-count duplication that XOR alone is blind to."""
    from leftshove_spark.ext.pipeline import dataset_fingerprint

    rows = [(i, f"doc number {i} body", "s1" if i % 2 else "s2") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def fp(frame):
        return sorted(
            map(tuple, dataset_fingerprint(frame, group_cols=["source"]).collect())
        )

    base = fp(df)
    assert fp(df.orderBy(F.desc("doc_id")).repartition(13)) == base

    changed = spark.createDataFrame(
        [(i, f"doc number {i} body" + ("!" if i == 7 else ""), "s1" if i % 2 else "s2")
         for i in range(50)],
        "doc_id long, text string, source string",
    )
    assert fp(changed) != base

    # duplicate every doc once (even count): XOR cancels, sum must not
    doubled = df.unionAll(df)
    d, b = dict([(r[0], r) for r in fp(doubled)]), dict([(r[0], r) for r in base])
    for src in d:
        assert d[src][4] == 0  # every hash XORed twice cancels — blind
        assert d[src][3] != b[src][3]  # content_sum catches it
        assert d[src][1] == 2 * b[src][1]


def test_split_leakage_found_then_fixed_by_cluster_split(spark):
    """Planted near-dup twins with id-pure hash splits leak across
    splits; re-assigning every connected component to its min-member's
    split drives the audit to zero — the documented remediation."""
    from leftshove_spark.ext import graph as G
    from leftshove_spark.ext.pipeline import hash_split, split_leakage
    from leftshove_spark.queries_ext import _perturbed_docs_df
    from leftshove_spark.sources import load_table

    docs = _perturbed_docs_df(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    with_split = hash_split(docs)
    leaks = split_leakage(with_split, jaccard_threshold=0.6)
    assert leaks.count() > 0  # id-pure splits must leak on planted twins

    # remediation: component-level split assignment
    from leftshove_spark.ext.dedup import minhash_lsh_pairs

    comp = G.connected_components(
        minhash_lsh_pairs(docs, jaccard_threshold=0.6).select("id_a", "id_b")
    )
    rep_split = (
        with_split.join(
            comp.select(F.col("node").alias("doc_id"), "component"), "doc_id"
        )
        .join(
            with_split.select(
                F.col("doc_id").alias("component"), F.col("split").alias("rep")
            ),
            "component",
        )
        .select("doc_id", F.col("rep").alias("split2"))
    )
    fixed = (
        with_split.join(rep_split, "doc_id", "left")
        .withColumn("split", F.coalesce("split2", "split"))
        .drop("split2")
    )
    assert split_leakage(fixed, jaccard_threshold=0.6).count() == 0


def test_weighted_systematic_sample_exact_pps(spark):
    """Stride membership must match the textbook floor(cum*k/W) product
    form computed in Python bigint (the Spark side uses the
    overflow-safe threshold WHEN-tree — both k<=64 linear and k>64
    tree forms), total multiplicity must be exactly k, and a row
    heavier than W/k must carry multiplicity > 1."""
    import hashlib

    from leftshove_spark.ext.pipeline import weighted_systematic_sample

    rows = [(i, (i * 37) % 11 + (900 if i == 5 else 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def brute(k):
        order = sorted(
            rows, key=lambda r: (hashlib.md5(f"wss:{r[0]}".encode()).hexdigest(), r[0])
        )
        W = sum(w for _, w in order)
        out, cum = {}, 0
        for i, w in order:
            lo, cum = cum, cum + w
            m = (cum * k) // W - (lo * k) // W
            if m > 0:
                out[i] = ((lo * k) // W + 1, m, cum)
        return out

    for k in (7, 100):  # linear and WHEN-tree threshold forms
        got = {
            r["doc_id"]: (r["stride"], r["multiplicity"], r["cum_weight"])
            for r in weighted_systematic_sample(df, k, "w").collect()
        }
        assert got == brute(k), f"k={k}"
        assert sum(m for _, m, _ in got.values()) == k
    assert got[5][1] > 1  # the 900-weight row spans multiple strides


def test_weighted_systematic_sample_stable_and_degenerate(spark):
    """Selection is a pure function of (ids, weights): invariant under
    repartitioning; zero-weight rows are never selected; zero total
    weight yields an empty frame with the contract columns."""
    from leftshove_spark.ext.pipeline import weighted_systematic_sample

    df = spark.createDataFrame(
        [(i, 0 if i % 3 == 0 else i) for i in range(30)], "doc_id long, w long"
    )
    a = weighted_systematic_sample(df, 10, "w").collect()
    b = weighted_systematic_sample(df.repartition(7), 10, "w").collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert all(r["doc_id"] % 3 != 0 for r in a)

    empty = weighted_systematic_sample(
        spark.createDataFrame([(1, 0)], "doc_id long, w long"), 5, "w"
    )
    assert empty.count() == 0
    assert {"stride", "multiplicity", "cum_weight"} <= set(empty.columns)


def test_interleave_sources_ratios_and_smoothness(spark):
    """A 2:1 interleave must (a) order deterministically and stably
    under repartitioning, (b) realize the ratio in every prefix within
    rounding (smoothness — WFQ's bound: any prefix of length n holds
    within 1 slot of n*w_s/W per source), (c) drop unlisted sources."""
    from leftshove_spark.ext.pipeline import interleave_sources

    rows = [(i, "a") for i in range(40)] + [(100 + i, "b") for i in range(20)]
    rows += [(900 + i, "junk") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(df, {"a": 2, "b": 1}).orderBy("interleave_pos")
    seq = [r["source"] for r in out.collect()]
    assert len(seq) == 60 and "junk" not in seq
    for n in range(1, 61):
        a_seen = seq[:n].count("a")
        assert abs(a_seen - n * 2 / 3) <= 1, f"prefix {n} unsmooth: {a_seen}"

    again = [
        r["source"]
        for r in interleave_sources(df.repartition(13), {"a": 2, "b": 1})
        .orderBy("interleave_pos")
        .collect()
    ]
    assert seq == again


def test_interleave_sources_rejects_bad_weights(spark):
    import pytest

    from leftshove_spark.ext.pipeline import interleave_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        interleave_sources(df, {})
    with pytest.raises(ValueError):
        interleave_sources(df, {"a": 0})


def test_weighted_systematic_sample_join_path_equals_tree(spark):
    """The large-k bucketed-threshold-join form must select the
    identical (stride, multiplicity, cum) set as the WHEN-tree form —
    including a heavy row spanning many buckets — and its generated
    threshold table must be exact (no i*W product anywhere)."""
    from leftshove_spark.ext.pipeline import weighted_systematic_sample

    rows = [(i, (i * 37) % 11 + (900 if i == 5 else 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    for k in (7, 100):
        tree = {
            r["doc_id"]: (r["stride"], r["multiplicity"], r["cum_weight"])
            for r in weighted_systematic_sample(df, k, "w").collect()
        }
        join = {
            r["doc_id"]: (r["stride"], r["multiplicity"], r["cum_weight"])
            for r in weighted_systematic_sample(
                df, k, "w", max_tree_k=0
            ).collect()
        }
        assert tree == join, f"k={k}"


def test_merge_fingerprints_equals_whole_corpus(spark):
    """Shard accounting composes: fingerprint rows of disjoint shards
    merge (sums/xors/extremes re-aggregated) into exactly the
    fingerprint of the union — no rescan; grouped and global forms."""
    from conftest import SF0001
    from leftshove_spark.ext.pipeline import dataset_fingerprint, merge_fingerprints
    from leftshove_spark.sources import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF0001, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    merged = merge_fingerprints(
        dataset_fingerprint(a, group_cols=["lang"]).unionByName(
            dataset_fingerprint(b, group_cols=["lang"])
        ),
        ["lang"],
    )
    whole = dataset_fingerprint(docs, group_cols=["lang"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    g = merge_fingerprints(
        dataset_fingerprint(a).unionByName(dataset_fingerprint(b))
    ).first()
    w = dataset_fingerprint(docs).first()
    assert tuple(g) == tuple(w)


def test_weighted_systematic_sample_grouped_exact_pps(spark):
    """Per-group stride membership must match the per-group product
    form computed in Python bigint; per-group multiplicity sums to k;
    stable under repartitioning; a group with one dominant row carries
    multiplicity > 1 inside its own group only."""
    import hashlib

    from leftshove_spark.ext.pipeline import weighted_systematic_sample_grouped

    rows = []
    for g in ("a", "b", "c"):
        for i in range(30):
            did = ord(g) * 1000 + i
            w = (i * 13) % 7 + (500 if (g == "b" and i == 3) else 1)
            rows.append((did, g, w))
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    k = 9

    def brute():
        out = {}
        for g in ("a", "b", "c"):
            grp = sorted(
                (r for r in rows if r[1] == g),
                key=lambda r: (
                    hashlib.md5(f"wssg:{r[0]}".encode()).hexdigest(),
                    r[0],
                ),
            )
            W = sum(w for _, _, w in grp)
            cum = 0
            for did, _, w in grp:
                lo, cum = cum, cum + w
                m = (cum * k) // W - (lo * k) // W
                if m > 0:
                    out[did] = ((lo * k) // W + 1, m, cum)
        return out

    got = {
        r["doc_id"]: (r["stride"], r["multiplicity"], r["cum_weight"])
        for r in weighted_systematic_sample_grouped(df, k, "w", "g").collect()
    }
    assert got == brute()
    for g in ("a", "b", "c"):
        assert (
            sum(m for d, (_, m, _) in got.items() if d // 1000 == ord(g))
            == k
        ), g
    assert got[ord("b") * 1000 + 3][1] > 1

    again = {
        r["doc_id"]: (r["stride"], r["multiplicity"], r["cum_weight"])
        for r in weighted_systematic_sample_grouped(
            df.repartition(11), k, "w", "g"
        ).collect()
    }
    assert got == again


def test_weighted_grouped_id_unique_only_within_stratum(spark):
    """The same id in two strata keeps two independent selections
    (selection keys on group + id); NULL weights raise at execution."""
    import pytest

    from leftshove_spark.ext.pipeline import weighted_systematic_sample_grouped

    df = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 5), (2, "a", 5), (2, "b", 5)],
        "doc_id long, g string, w long",
    )
    out = weighted_systematic_sample_grouped(df, 2, "w", "g").collect()
    per_group = {}
    for r in out:
        per_group.setdefault(r["g"], 0)
        per_group[r["g"]] += r["multiplicity"]
    assert per_group == {"a": 2, "b": 2}
    assert all(r["multiplicity"] == 1 for r in out)  # never cross-merged

    withnull = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None)], "doc_id long, g string, w long"
    )
    with pytest.raises(Exception, match="NULL in weight"):
        weighted_systematic_sample_grouped(withnull, 2, "w", "g").collect()


def test_stage_keep_cols_match_join_back_forms(spark):
    """r17: the runner's quality/decontaminate stages filter IN PLACE
    (one Arrow predicate, no join-back) — survivors must be exactly the
    join-back forms', including the edge docs the join form decided
    implicitly: a zero-token doc (dropped by quality: the stats pass
    emits nothing, so the inner join dropped it; kept by decontaminate:
    no shingles → never flagged → the anti-join kept it) and an
    n-hit boundary doc. The composed runner plan must carry NO Join."""
    from leftshove_spark.ext.pipeline import decontaminate
    from leftshove_spark.ext.text import quality_filter
    from leftshove_spark.pipeline_runner import run_pipeline

    good = (
        "the quick brown fox jumps over the lazy dog and then the small "
        "cat naps under a warm sun while birds sing of every good thing"
    )
    corpus = spark.createDataFrame(
        [
            (1, good),                      # clean, passes quality
            (2, ""),                        # zero tokens
            (3, "   "),                     # zero tokens (whitespace)
            (4, good + " extra words here to stay unique and long"),
            (5, "short text"),              # fails min_tokens
            (6, ("spam " * 40).strip()),    # fails uniq_ratio
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, good)], ["doc_id", "text"])

    # quality: keep-col stage ≡ join-back form
    q_stage = run_pipeline(
        spark, corpus, [{"op": "quality_filter"}], count_stages=False
    ).df
    q_join = corpus.join(quality_filter(corpus).select("doc_id"), "doc_id")
    assert sorted(r[0] for r in q_stage.select("doc_id").collect()) == sorted(
        r[0] for r in q_join.select("doc_id").collect()
    )

    # decontaminate: keep-col stage ≡ anti-join form (zero-shingle docs
    # survive BOTH — the map pass never emits them)
    d_stage = run_pipeline(
        spark, corpus, [{"op": "decontaminate", "benchmark": bench}],
        count_stages=False,
    ).df
    d_join = corpus.join(
        decontaminate(corpus, bench).select("doc_id"), "doc_id", "left_anti"
    )
    got = sorted(r[0] for r in d_stage.select("doc_id").collect())
    assert got == sorted(r[0] for r in d_join.select("doc_id").collect())
    assert 2 in got and 3 in got  # zero-shingle docs kept

    # composed plan shape: both stages are joins no more
    composed = run_pipeline(
        spark,
        corpus,
        [{"op": "quality_filter"},
         {"op": "decontaminate", "benchmark": bench}],
        count_stages=False,
    ).df
    plan = composed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_run_pipeline_config_equals_hand_composition(spark):
    """The declarative runner must produce exactly the frame the
    hand-composed operator chain produces, with per-stage accounting;
    config errors fail fast naming the choices."""
    import pytest

    from conftest import SF0001
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF0001, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    spec = [
        {"op": "quality_filter", "min_tokens": 20, "min_uniq_ratio": 0.5,
         "min_quality": 0.3},
        {"op": "decontaminate", "benchmark": bench},
        {"op": "outlier_gate", "c_num": 6},
        {"op": "hash_split"},
        {"op": "sample_k_per_group", "group_cols": ["split", "source"], "k": 8},
    ]
    res = run_pipeline(spark, corpus, spec)
    assert res.counts["ingested"] >= res.counts["0_quality_filter"] >= res.counts[
        "1_decontaminate"
    ] >= res.counts["2_outlier_gate"] > 0
    assert res.counts["4_sample_k_per_group"] == res.df.count()

    # hand composition of the same chain
    from leftshove_spark.ext.pipeline import (
        decontaminate,
        hash_split,
        sample_k_per_group,
    )
    from leftshove_spark.ext.text import quality_filter
    from leftshove_spark.operators.analytic import mad_outliers

    h = corpus.join(
        quality_filter(corpus, min_tokens=20, min_uniq_ratio=0.5,
                       min_quality=0.3).select("doc_id"),
        "doc_id",
    )
    h = h.join(decontaminate(h, bench).select("doc_id"), "doc_id", "left_anti")
    flags = mad_outliers(
        h.select("doc_id", "lang", F.col("n_chars").cast("long").alias("__v")),
        "__v",
        ["lang"],
        c_num=6,
    )
    h = h.join(flags.filter(F.col("is_outlier")).select("doc_id"),
               "doc_id", "left_anti")
    h = sample_k_per_group(hash_split(h), ["split", "source"], k=8)
    assert sorted(r["doc_id"] for r in res.df.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in h.select("doc_id").collect()
    )

    with pytest.raises(ValueError, match="unknown op"):
        run_pipeline(spark, corpus, [{"op": "nope"}])
    with pytest.raises(ValueError, match="bad parameters"):
        run_pipeline(spark, corpus, [{"op": "hash_split", "zzz": 1}])
    with pytest.raises(ValueError, match="missing 'op'"):
        run_pipeline(spark, corpus, [{"min_tokens": 5}])


def test_run_pipeline_redact_fingerprint_interleave_terminal_stages(spark):
    """r9-advice #8: a config-built pipeline can end with substring
    redaction + DSIR/temperature selection + fingerprint accounting +
    the interleave training order, each ≡ its hand-composition, with
    the fingerprint landing as a side ARTIFACT (frame passes through
    unchanged)."""
    from conftest import SF0001
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF0001, "documents")
    target = docs.filter(F.col("lang") == "en")
    spec = [
        {"op": "substring_redact", "window": 20},
        {"op": "temperature_mixture", "source_col": "lang"},
        {"op": "dsir_sample", "target": target, "k": 50},
        {"op": "fingerprint", "group_cols": ["lang"]},
        {"op": "interleave", "weights": {"en": 2, "de": 1, "fr": 1,
                                         "es": 1, "zh": 1}, "source_col": "lang"},
    ]
    res = run_pipeline(spark, docs, spec)
    # fingerprint is accounting-only: the frame flows through unchanged
    assert res.counts["3_fingerprint"] == res.counts["2_dsir_sample"]
    assert "fingerprint" in res.artifacts
    fp = res.artifacts["fingerprint"]
    assert fp.count() > 0 and "n_docs" in fp.columns
    # interleave appends the position, drops nothing
    assert res.counts["4_interleave"] == res.counts["3_fingerprint"] > 0
    assert "interleave_pos" in res.df.columns

    # hand composition parity on the surviving id set + positions
    from leftshove_spark.ext.dedup import redact_duplicated_spans
    from leftshove_spark.ext.pipeline import (
        dsir_sample,
        interleave_sources,
        temperature_mixture_sample,
    )

    red = redact_duplicated_spans(docs, window=20).select(
        "doc_id", "text_redacted"
    )
    h = (
        docs.join(red, "doc_id", "left")
        .withColumn("text", F.coalesce("text_redacted", F.col("text")))
        .drop("text_redacted")
    )
    h = h.join(
        temperature_mixture_sample(h, "lang").select("doc_id"), "doc_id"
    )
    h = h.join(
        dsir_sample(h, target, 50).select("doc_id"), "doc_id"
    )
    h = interleave_sources(
        h, {"en": 2, "de": 1, "fr": 1, "es": 1, "zh": 1}, "lang"
    )
    got = sorted(
        (r["doc_id"], r["interleave_pos"])
        for r in res.df.select("doc_id", "interleave_pos").collect()
    )
    want = sorted(
        (r["doc_id"], r["interleave_pos"])
        for r in h.select("doc_id", "interleave_pos").collect()
    )
    assert got == want and len(got) > 0


def test_run_pipeline_lm_quality_gate_parity(spark):
    """X60 runner stage ≡ hand composition: the lm_quality_gate keeps
    exactly the docs whose ppl_proxy clears the threshold, the
    keep_short knob controls NULL-proxy (< 2 token) docs, and the gate
    really carries selection pressure (reference-language docs score
    lower on the reference model than off-language docs on average)."""
    from conftest import SF0001
    from leftshove_spark.ext.pipeline import lm_quality_score
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF0001, "documents")
    ref = docs.filter(F.col("lang") == "en")
    scored = lm_quality_score(docs, ref)
    # a threshold between the lang-mean proxies so the gate is non-trivial
    thr = scored.agg(F.expr("percentile(ppl_proxy, 0.5)")).first()[0]
    res = run_pipeline(
        spark,
        docs,
        [{"op": "lm_quality_gate", "reference": ref, "max_ppl_proxy": thr}],
    )
    got = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in scored.filter(F.col("ppl_proxy") <= thr).collect()
    }
    assert got == want and 0 < len(got) < docs.count()
    # selection pressure: en (the reference) should score no worse than
    # the average non-en doc under an en-trained model — sanity, not a
    # fixture-tuned bound (the synthetic corpus shares vocabulary)
    means = {
        r["lang"]: r["m"]
        for r in scored.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("ppl_proxy").alias("m"))
        .collect()
    }
    assert means["en"] <= max(v for k, v in means.items() if k != "en")
    # keep_short admits the NULL-proxy docs as well
    res2 = run_pipeline(
        spark,
        docs,
        [{"op": "lm_quality_gate", "reference": ref, "max_ppl_proxy": thr,
          "keep_short": True}],
    )
    short = {
        r["doc_id"] for r in scored.filter(F.col("ppl_proxy").isNull()).collect()
    }
    got2 = {r["doc_id"] for r in res2.df.select("doc_id").collect()}
    assert got2 == want | short


def test_decontaminate_semantic_catches_paraphrase_ngram_misses(spark):
    """X64: an embedding-near benchmark item whose TEXT shares no
    3-gram with the corpus doc (the paraphrase stand-in) is caught by
    decontaminate_semantic and MISSED by the n-gram pass — the exact
    gap VERDICT r11 #3 names; unrelated docs are not flagged; the
    argmax benchmark id is the true nearest; and the runner stage's
    anti-join equals the hand composition."""
    import pyspark.sql.functions as F

    from conftest import SF0001
    from leftshove_spark.ext.pipeline import decontaminate, decontaminate_semantic
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table

    em = load_table(spark, SF0001, "embeddings")
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    # benchmark: perturbed copies of vectors 480+ under NEW ids, with
    # REWORDED text (no shared 3-gram with any corpus doc)
    bench_emb = em.filter(F.col("vec_id") >= 480).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 4, F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    bench_docs = spark.createDataFrame(
        [(100480 + i, f"zq{i} wxy{i} paraphrased benchmark prompt") for i in range(20)],
        "doc_id long, text string",
    )
    flagged = decontaminate_semantic(em, bench_emb, threshold=0.9, dim=64)
    rows = {r["vec_id"]: r for r in flagged.collect()}
    # independent expectation: exact integer-quantized cosine of each
    # source against its perturbed copy, pure python
    import math

    emb = {
        r["vec_id"]: [round(float(x) * 1000) for x in r["embedding"]]
        for r in em.filter(F.col("vec_id") >= 480).collect()
    }
    expect = set()
    for vid, q in emb.items():
        p = [0] * 4 + q[4:]
        d = sum(a * b for a, b in zip(q, p))
        cos = d / (
            math.sqrt(sum(a * a for a in q)) * math.sqrt(sum(a * a for a in p))
        )
        if cos >= 0.9:
            expect.add(vid)
    assert len(expect) >= 15  # the perturbation is a NEAR-dup fixture
    assert expect <= set(rows)
    for vid in expect:
        assert rows[vid]["matched_benchmark_id"] == vid + 100000
        assert rows[vid]["max_cosine"] >= 0.9
    # the n-gram pass over the reworded TEXT catches none of them
    ngram_hits = {
        r["doc_id"]
        for r in decontaminate(docs, bench_docs).collect()
    }
    assert not (ngram_hits & set(range(480, 500)))
    # runner stage ≡ hand anti-join
    res = run_pipeline(
        spark,
        docs,
        [
            {
                "op": "decontaminate_semantic",
                "benchmark_emb": bench_emb,
                "embeddings": em,
                "threshold": 0.9,
                "dim": 64,
            }
        ],
    )
    got = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in docs.join(
            flagged.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        ).collect()
    }
    assert got == want
    assert got == {r["doc_id"] for r in docs.collect()} - set(rows)


def test_decontaminate_semantic_ivf_subset_and_recall(spark):
    """X66: the IVF-celled pass flags a SUBSET of the brute pass (a
    candidate outside the probed cells is never compared — the standard
    IVF recall trade), agrees exactly on every doc it does flag, and on
    the planted fixture at nprobe=2 of 4 cells recall is 1.0 (each
    perturbed source lands in its own copy's cell). nprobe=k degrades
    to the brute pass exactly."""
    import pyspark.sql.functions as F

    from conftest import SF0001
    from leftshove_spark.ext.pipeline import (
        decontaminate_semantic,
        decontaminate_semantic_ivf,
    )
    from leftshove_spark.sources import load_table

    em = load_table(spark, SF0001, "embeddings").select("vec_id", "embedding")
    bench = em.filter(F.col("vec_id") >= 480).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 4, F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    brute = {
        r["vec_id"]: (r["matched_benchmark_id"], r["max_cosine"])
        for r in decontaminate_semantic(em, bench, threshold=0.9, dim=64).collect()
    }
    ivf = {
        r["vec_id"]: (r["matched_benchmark_id"], r["max_cosine"])
        for r in decontaminate_semantic_ivf(
            em, bench, threshold=0.9, n_centroids=4, nprobe=2, dim=64
        ).collect()
    }
    assert set(ivf) <= set(brute)  # never a false flag
    recall = len(ivf) / len(brute)
    assert recall == 1.0, f"fixture recall {recall}"  # planted pairs co-cell
    for vid, (bid, cos) in ivf.items():
        # within-probed-cell argmax can only match brute when the true
        # argmax cell was probed — on this fixture it always is
        assert (bid, cos) == brute[vid]
    # nprobe = k ⇒ every cell probed ⇒ identical to brute by definition
    full = {
        r["vec_id"]: (r["matched_benchmark_id"], r["max_cosine"])
        for r in decontaminate_semantic_ivf(
            em, bench, threshold=0.9, n_centroids=4, nprobe=4, dim=64
        ).collect()
    }
    assert full == brute

def test_decontaminate_semantic_string_ids_both_passes(spark):
    """ADVICE r12: the IVF pass hard-coded an np.int64 benchmark-id
    array, crashing on string (or decimal) ids although its declared
    output schema — and the brute twin — carry the id column's actual
    type. Both passes must run and AGREE on string ids, with the argmax
    tiebreak following the id's own (string) ordering."""
    import pyspark.sql.functions as F

    from conftest import SF0001
    from leftshove_spark.ext.pipeline import (
        decontaminate_semantic,
        decontaminate_semantic_ivf,
    )
    from leftshove_spark.sources import load_table

    em = (
        load_table(spark, SF0001, "embeddings")
        .select(
            F.concat(F.lit("doc-"), F.lpad(F.col("vec_id").cast("string"), 6, "0")).alias("vec_id"),
            "embedding",
        )
    )
    bench = em.filter(F.col("vec_id") >= "doc-000480").select(
        F.concat(F.lit("bench-"), F.col("vec_id")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 4, F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    brute = {
        r["vec_id"]: (r["matched_benchmark_id"], r["max_cosine"])
        for r in decontaminate_semantic(em, bench, threshold=0.9, dim=64).collect()
    }
    assert brute and all(isinstance(b, str) for b, _ in brute.values())
    ivf = {
        r["vec_id"]: (r["matched_benchmark_id"], r["max_cosine"])
        for r in decontaminate_semantic_ivf(
            em, bench, threshold=0.9, n_centroids=4, nprobe=4, dim=64
        ).collect()
    }
    assert ivf == brute  # nprobe=k ⇒ identical, now over string ids
    # dim validation is live, not dead (ADVICE r12): a wrong declared
    # dim fails loudly in both passes
    import pytest as _pytest

    with _pytest.raises(Exception, match="dim"):
        decontaminate_semantic(em, bench, threshold=0.9, dim=32).collect()
    with _pytest.raises(Exception, match="dim"):
        decontaminate_semantic_ivf(
            em, bench, threshold=0.9, n_centroids=4, nprobe=2, dim=32
        ).collect()

def test_contamination_report_covers_verbatim_and_paraphrase(spark):
    """VERDICT r12 What's-missing #4 closed: the governance roll-up
    consumes the N-GRAM pass's attributed output the same way it
    consumes the semantic passes' — one report shape for verbatim AND
    paraphrase leaks. Pins the attributed columns (argmax benchmark by
    distinct shared n-grams, id-asc ties), that n_hit still counts each
    shared shingle ONCE even when several benchmark items share it, and
    that the report aggregates per benchmark item correctly."""
    import pyspark.sql.functions as F

    from leftshove_spark.ext.pipeline import (
        contamination_report,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            # doc 1: shares 'alpha beta gamma' with bench 10 AND 20 (one
            # distinct shingle, two benchmark items) plus 'beta gamma
            # delta' with bench 10 only → argmax bench 10 (2 > 1)
            (1, "alpha beta gamma delta"),
            # doc 2: ties bench 10 and 20 on 1 shingle each → id-asc ⇒ 10
            (2, "alpha beta gamma zz epsilon zeta eta"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (20, "alpha beta gamma"),
            (30, "unrelated benchmark item text"),
        ],
        "doc_id long, text string",
    )
    flagged = decontaminate(corpus, bench, attribute=True)
    rows = {r["doc_id"]: r for r in flagged.collect()}
    assert set(rows) == {1, 2}
    # doc 1: 2 distinct shingles ('alpha beta gamma', 'beta gamma
    # delta'), both hit; bench 10 matches both, bench 20 one
    assert rows[1]["n_hit"] == 2 and rows[1]["n_shingles"] == 2
    assert rows[1]["matched_benchmark_id"] == 10
    assert rows[1]["matched_n_hit"] == 2
    # doc 2: 1 hit of 5 shingles; 10 and 20 tie at 1 → id-asc
    assert rows[2]["n_hit"] == 1 and rows[2]["n_shingles"] == 5
    assert rows[2]["matched_benchmark_id"] == 10
    assert rows[2]["matched_n_hit"] == 1
    # the SAME report shape the semantic passes feed
    rep = {
        r["benchmark_id"]: (r["n_leaked"], r["worst_cosine"])
        for r in contamination_report(
            flagged, cosine_col="contamination"
        ).collect()
    }
    assert set(rep) == {10}
    assert rep[10][0] == 2 and rep[10][1] == 1.0  # doc 1 fully leaked
    # attribute=False keeps the r12 output contract exactly
    plain = decontaminate(corpus, bench)
    assert plain.columns == [
        "doc_id", "n_hit", "n_shingles", "contamination"
    ]
    got = {r["doc_id"]: r["n_hit"] for r in plain.collect()}
    assert got == {1: 2, 2: 1}

def test_run_pipeline_bpe_annotate_vocab_artifact(spark, tmp_path):
    """VERDICT r12 next #2 (runner half): a pipeline config references
    a TRAINED vocab artifact — bpe_train_scalable writes merges.txt,
    the bpe_annotate stage loads it and annotates tokenizer-faithful
    counts, and a downstream budget cap consumes them — equal to the
    hand composition."""
    import pyspark.sql.functions as F

    from conftest import SF0001
    from leftshove_spark.ext.text import bpe_token_counts, bpe_train_scalable
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    path = str(tmp_path / "merges.txt")
    bpe_train_scalable(docs, num_merges=64, min_pair_count=2, merges_path=path)

    res = run_pipeline(
        spark,
        docs,
        [{"op": "bpe_annotate", "merges_path": path}],
    )
    got = {r["doc_id"]: r["n_tokens_bpe"] for r in res.df.collect()}
    from leftshove_spark.ext.text import load_merges_file

    want_counts = bpe_token_counts(docs, load_merges_file(path))
    want = {r["doc_id"]: r["n_tokens_bpe"] for r in want_counts.collect()}
    assert got == want and len(got) == docs.count()
    # exactly-one-source contract
    import pytest as _pytest

    with _pytest.raises(Exception, match="exactly one"):
        run_pipeline(spark, docs, [{"op": "bpe_annotate"}])


def test_run_pipeline_exact_dedup_stage_preserves_frame(spark):
    """r13: the exact_dedup STAGE used to replace the flowing frame
    with the collapsed (hash, len, keep_id, n_copies) relation,
    breaking any stage downstream of it. It now keeps the surviving
    ROWS — min id per distinct content, all original columns — so the
    composed spec the gate entry x_pipeline_curation runs is
    well-typed end to end."""
    from leftshove_spark.ext.dedup import exact_dedup
    from leftshove_spark.pipeline_runner import run_pipeline
    from leftshove_spark.sources import load_table

    docs = load_table(spark, SF0001, "documents").select(
        "doc_id", "text", "lang"
    )
    corp = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    res = run_pipeline(
        spark,
        corp,
        [{"op": "exact_dedup"}, {"op": "hash_split"}],
        count_stages=False,
    )
    assert set(res.df.columns) == {"doc_id", "text", "lang", "split"}
    got = sorted(r["doc_id"] for r in res.df.collect())
    want = sorted(
        r["keep_id"] for r in exact_dedup(corp).collect()
    )
    assert got == want  # exactly the min-id survivors, as full rows
