"""Recall/quality checks for the approximate dedup operators against the
exact n-gram Jaccard baseline."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_dir):
    from pgwarehouse_spark.operators.dedup import dedup_ngram_jaccard

    return {
        (r.id1, r.id2) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }


def test_minhash_lsh_matches_exact(spark, sf_dir, exact_pairs):
    from pgwarehouse_spark.operators.dedup import dedup_minhash_lsh

    lsh_pairs = {(r.id1, r.id2) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    # Verified candidates can never include a false positive; at the
    # observed dup similarity (~0.99) P(miss) < 1e-12, so equality holds.
    assert lsh_pairs == exact_pairs


def test_simhash_finds_near_dups(spark, sf_dir, exact_pairs):
    from pgwarehouse_spark.operators.dedup import dedup_simhash

    sim_pairs = {(r.id1, r.id2) for r in dedup_simhash(spark, sf_dir).collect()}
    assert exact_pairs, "fixture should contain injected near-dups"
    recall = len(sim_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"simhash recall {recall:.2f} over {len(exact_pairs)} pairs"


def test_exact_dedup_consistent_with_fingerprint(spark, sf_dir):
    from pgwarehouse_spark.operators.dedup import dedup_exact
    from pgwarehouse_spark.operators.textstats import text_fingerprint

    groups = dedup_exact(spark, sf_dir).collect()
    n_docs = text_fingerprint(spark, sf_dir).count()
    assert sum(r.n_copies for r in groups) == n_docs
    assert all(r.n_copies >= 1 for r in groups)


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A boilerplate cluster (many identical signatures) must be dropped
    by the bucket cap — candidate pairs stay bounded — while ordinary
    near-dup pairs outside the hot bucket survive unchanged."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_df,
    )

    # 40 identical "boilerplate" docs (ids 0-39) + 2 near-identical
    # ordinary docs (ids 100, 101) + isolated docs
    boiler = [(i, ["tok%d" % j for j in range(30)]) for i in range(40)]
    pair = [
        (100, ["alpha%d" % j for j in range(30)]),
        (101, ["alpha%d" % j for j in range(29)] + ["odd"]),
    ]
    lone = [(200 + i, ["x%d_%d" % (i, j) for j in range(30)]) for i in range(5)]
    sh = spark.createDataFrame(boiler + pair + lone, ["doc_id", "shingles"])
    sigs = minhash_signatures_df(sh)

    uncapped = lsh_candidate_pairs(sigs)
    capped = lsh_candidate_pairs(sigs, max_bucket=10)
    up = {(r.id1, r.id2) for r in uncapped.collect()}
    cp = {(r.id1, r.id2) for r in capped.collect()}

    assert (100, 101) in up and (100, 101) in cp  # ordinary pair survives
    assert sum(1 for a, b in up if a < 40 and b < 40) == 40 * 39 // 2
    assert not any(a < 40 and b < 40 for a, b in cp)  # hot bucket dropped


def test_ngram_jaccard_hot_shingle_cap_bounds_pairs(spark):
    """VERDICT r01 item 6: the inverted-index self-join is quadratic in
    a shingle's posting list. A pathological boilerplate corpus (60 docs
    sharing 9 shingles) must emit all 60·59/2 pairs uncapped, and ZERO
    once the hot shingles are dropped by max_shingle_freq — bounding the
    join work to rare-shingle posting lists."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.dedup import ngram_jaccard_pairs

    common = [f"common shingle {j}" for j in range(9)]
    rows = [(i, common + [f"unique shingle {i}"]) for i in range(60)]
    sh = spark.createDataFrame(rows, "doc_id BIGINT, shingles ARRAY<STRING>")

    uncapped = ngram_jaccard_pairs(sh)
    # pairwise jaccard = 9/11 ≈ 0.818 ≥ 0.8 → every pair survives
    assert uncapped.count() == 60 * 59 // 2
    assert uncapped.select(F.min("n_shared")).collect()[0][0] == 9

    capped = ngram_jaccard_pairs(sh, max_shingle_freq=10)
    assert capped.count() == 0

    # the cap must not touch docs below it: genuinely-similar small
    # groups still pair up (df of their shingles = 2 ≤ 10)
    shared = [f"pair gram {j}" for j in range(9)]  # 9/11 ≥ threshold
    small = spark.createDataFrame(
        [(100, shared + ["only in 100"]), (101, shared + ["only in 101"])],
        "doc_id BIGINT, shingles ARRAY<STRING>",
    )
    got = ngram_jaccard_pairs(small, max_shingle_freq=10).collect()
    assert len(got) == 1 and got[0]["n_shared"] == 9


def test_connected_components_star_contraction(spark):
    """VERDICT r01 item 10: large-star/small-star must label adversarial
    graphs correctly in O(log) rounds where one-hop min propagation
    needs O(diameter). A 64-node path (diameter 63) and a skewed
    bridged-stars graph both converge in <= 10 rounds."""
    import pgwarehouse_spark.operators.dedup as dd

    # driver_max_edges=0 forces the DISTRIBUTED contraction path — this
    # test exists to pin the star loop's round bound, which the r9
    # driver union-find gate would otherwise bypass on graphs this small
    # path 0-1-2-...-63
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id1 BIGINT, id2 BIGINT"
    )
    labels = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components(path, driver_max_edges=0).collect()
    }
    assert labels == {i: 0 for i in range(64)}
    assert dd.LAST_CC_ROUNDS <= 10, dd.LAST_CC_ROUNDS

    # skewed: two hub-and-spoke stars (hubs 0 and 1000) joined by one
    # bridge, plus a disjoint pair and an isolated self-contained triangle
    edges = (
        [(0, i) for i in range(1, 200)]          # big star at 0
        + [(1000, 1000 + i) for i in range(1, 50)]  # star at 1000
        + [(199, 1000)]                           # bridge: one component
        + [(5000, 5001)]                          # separate pair
        + [(7000, 7001), (7001, 7002), (7000, 7002)]  # triangle
    )
    g = spark.createDataFrame(edges, "id1 BIGINT, id2 BIGINT")
    got = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components(g, driver_max_edges=0).collect()
    }
    assert all(got[n] == 0 for n in list(range(200)) + [1000 + i for i in range(50)])
    assert got[5000] == got[5001] == 5000
    assert got[7000] == got[7001] == got[7002] == 7000
    assert dd.LAST_CC_ROUNDS <= 10, dd.LAST_CC_ROUNDS

    # duplicate/reversed input edges must not affect the labeling
    g2 = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 2)], "id1 BIGINT, id2 BIGINT"
    )
    got2 = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components(g2, driver_max_edges=0).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 1}


def test_connected_components_driver_gate_equivalence(spark):
    """r9: the size-gated driver union-find must label every graph
    identically to the distributed star contraction, set LAST_CC_ROUNDS
    to 0, and hand over to the distributed path when the edge count
    exceeds the gate."""
    import pgwarehouse_spark.operators.dedup as dd

    graphs = [
        [(i, i + 1) for i in range(63)],                     # chain
        [(0, i) for i in range(1, 200)] + [(199, 1000)]      # star+bridge
        + [(1000, 1000 + i) for i in range(1, 50)]
        + [(5000, 5001), (7000, 7001), (7001, 7002), (7000, 7002)],
        [(2, 1), (1, 2), (2, 3), (3, 2)],                    # dup/reversed
        [(9, 9)],                                            # self-loop only
    ]
    for edges in graphs:
        g = spark.createDataFrame(edges, "id1 BIGINT, id2 BIGINT")
        fast = {
            r.doc_id: r.cluster_id for r in dd.connected_components(g).collect()
        }
        assert dd.LAST_CC_ROUNDS == 0  # gate took the driver path
        slow = {
            r.doc_id: r.cluster_id
            for r in dd.connected_components(g, driver_max_edges=0).collect()
        }
        assert fast == slow

    # over-gate edge sets run the distributed loop (rounds > 0)
    g = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 BIGINT, id2 BIGINT"
    )
    labels = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components(g, driver_max_edges=10).collect()
    }
    assert labels == {i: 0 for i in range(41)}
    assert dd.LAST_CC_ROUNDS > 0


def test_embedding_cosine_all_pairs_guard(spark):
    """The exact all-pairs cosine refuses oversized inputs, naming the
    ANN alternatives, instead of silently launching an O(N^2) join."""
    from pgwarehouse_spark.operators.dedup import embedding_cosine_pairs

    e = spark.range(100).selectExpr(
        "id AS vec_id", "array(cast(id as float), 1.0f) AS embedding"
    )
    with pytest.raises(ValueError, match="ann_topk_lsh"):
        embedding_cosine_pairs(e, 0.9, max_vectors=50)
    # under the cap it runs
    assert embedding_cosine_pairs(e, 0.999999, max_vectors=200).count() > 0


def test_substring_spans_catch_what_doc_jaccard_misses(spark, tmp_path):
    """A 40-token verbatim run shared by two otherwise-different docs is
    below the document-level Jaccard threshold but must surface in the
    substring-span pass (the Lee-et-al modality's point)."""
    import os

    from pgwarehouse_spark.operators.dedup import (
        dedup_substring_spans,
        ngram_jaccard_pairs,
        shingles_expr,
    )
    from pyspark.sql import functions as F

    shared_run = " ".join(f"quote{j}" for j in range(40))
    docs = [
        (1, " ".join(f"a{j}" for j in range(200)) + " " + shared_run),
        (2, shared_run + " " + " ".join(f"b{j}" for j in range(200))),
        (3, " ".join(f"c{j}" for j in range(200))),
        # run starts at token offset 3 — misaligned with doc 1's start
        # offset mod any stride > 1 (regression for the positional-stride
        # recall hole: must still be caught)
        (4, "x0 x1 x2 " + shared_run + " " + " ".join(f"d{j}" for j in range(200))),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").write.parquet(
        os.path.join(sf, "documents.parquet")
    )

    # doc-level jaccard: 1 and 2 share ~38/~440 trigrams — far below 0.8
    sh = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", shingles_expr(F.col("text")).alias("shingles")
    )
    assert ngram_jaccard_pairs(sh).count() == 0

    spans = dedup_substring_spans(spark, sf).collect()
    assert spans, "shared 40-token run must produce duplicated spans"
    assert all(r.min_doc == 1 for r in spans)
    # all three run-carrying docs share the run's interior windows,
    # including the arbitrarily-offset doc 4
    assert max(r.n_docs for r in spans) == 3


def test_semdedup_precision_and_recall_vs_exact(spark, sf_dir):
    """SemDeDup's within-cluster pairs are a subset of the exact all-pairs
    cosine dups (precision 1 by construction — the cosine test is the
    same decimal-exact expression); recall < 1 only because cross-cluster
    pairs are unseen. On this near-uniform testdata (adversarial for
    clustering) recall still must clear a floor."""
    from pgwarehouse_spark.operators.dedup import (
        _SEMDEDUP_TAU,
        embedding_cosine_pairs,
        semdedup_centroid,
    )
    from pgwarehouse_spark.operators._helpers import t

    e = t(spark, sf_dir, "embeddings")
    exact_dup_ids = {
        r.id2 for r in embedding_cosine_pairs(e, _SEMDEDUP_TAU).collect()
    }
    verdicts = semdedup_centroid(spark, sf_dir).collect()
    flagged = {r.vec_id for r in verdicts if r.is_dup == 1}
    assert flagged, "semdedup flagged nothing at tau on testdata"
    assert flagged <= exact_dup_ids  # precision 1 vs the exact baseline
    assert len(flagged) / len(exact_dup_ids) >= 0.2  # recall floor
    # every vector got exactly one verdict and one cluster
    assert len(verdicts) == e.count()
