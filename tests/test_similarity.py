"""ANN recall vs the exact brute-force top-k baseline."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def exact_topk(spark, sf_dir):
    from pgwarehouse_spark.operators.similarity import sim_topk_bruteforce

    return {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }


def test_lsh_recall(spark, sf_dir, exact_topk):
    from pgwarehouse_spark.operators.similarity import sim_topk_lsh

    ann = {(r.query_id, r.neighbor_id) for r in sim_topk_lsh(spark, sf_dir).collect()}
    recall = len(ann & exact_topk) / len(exact_topk)
    # Random-hyperplane LSH with 4×8 bits on near-uniform vectors is a
    # coarse filter; just require meaningfully-better-than-random recall
    # and exact ranking on whatever candidates it returns.
    assert recall >= 0.2, f"LSH recall {recall:.2f}"


def test_ivf_recall(spark, sf_dir, exact_topk):
    from pgwarehouse_spark.operators.similarity import sim_topk_ivf

    ann = {(r.query_id, r.neighbor_id) for r in sim_topk_ivf(spark, sf_dir).collect()}
    recall = len(ann & exact_topk) / len(exact_topk)
    assert recall >= 0.2, f"IVF recall {recall:.2f}"


def test_bruteforce_is_exact_k(spark, sf_dir):
    from pgwarehouse_spark.operators.similarity import (
        TOPK,
        N_QUERIES,
        sim_topk_bruteforce,
    )

    rows = sim_topk_bruteforce(spark, sf_dir).collect()
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    assert len(per_query) == N_QUERIES
    for q, rs in per_query.items():
        assert len(rs) == TOPK
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_kmeans_recall_at_least_seed_variant(spark, sf_dir, exact_topk):
    """Trained centroids must not lose recall versus the seed-centroid
    IVF at the same nprobe (usually they gain), and must beat random."""
    from pgwarehouse_spark.operators.similarity import (
        sim_topk_ivf,
        sim_topk_ivf_kmeans,
    )

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    trained = pairs(sim_topk_ivf_kmeans(spark, sf_dir))
    seed = pairs(sim_topk_ivf(spark, sf_dir))
    r_trained = len(trained & exact_topk) / len(exact_topk)
    r_seed = len(seed & exact_topk) / len(exact_topk)
    assert r_trained >= max(0.2, r_seed - 0.05), (r_trained, r_seed)


def test_pq_recall(spark, sf_dir, exact_topk):
    """PQ-ADC with a PQ_RERANK exact re-rank: the shortlist is ADC-
    approximate but the final ranking is exact cosine, so recall is
    bounded by P(true neighbor in shortlist)."""
    from pgwarehouse_spark.operators.similarity import sim_topk_pq

    ann = {(r.query_id, r.neighbor_id) for r in sim_topk_pq(spark, sf_dir).collect()}
    recall = len(ann & exact_topk) / len(exact_topk)
    assert recall >= 0.2, f"PQ recall {recall:.2f}"


def test_pq_codes_shape_and_compression(spark, sf_dir):
    """Every vector gets exactly PQ_M codes, each in [0, PQ_K)."""
    from pgwarehouse_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        embedding_pq_codes,
    )

    rows = embedding_pq_codes(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)
        assert r.recon_err >= 0.0


def test_ivfpq_recall(spark, sf_dir, exact_topk):
    """IVF-PQ composes two approximations (cell probe + ADC); its recall
    floor is accordingly looser than either alone, but it must still
    beat random and return exactly k rows per query."""
    from pgwarehouse_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
        sim_topk_ivfpq,
    )

    rows = sim_topk_ivfpq(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES * TOPK
    ann = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(ann & exact_topk) / len(exact_topk)
    assert recall >= 0.1, f"IVF-PQ recall {recall:.2f}"


def test_ivf_layout_partition_pruned_probes(spark, sf_dir, tmp_path):
    """The cell-partitioned IVF layout (r4): writing the index
    partitioned by centroid_id makes a probe a PARTITION-PRUNED read —
    the scan's PartitionFilters carry the centroid predicate and only
    the probed cells' files are listed. Hot cells are hash-sub-split so
    no partition exceeds the row cap; probes read all subcells of a
    probed cell, so results are unchanged."""
    import os

    from pgwarehouse_spark.operators.similarity import (
        read_ivf_probes,
        write_ivf_layout,
    )
    from pgwarehouse_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_index")
    # tiny cap forces the sub-split machinery to engage on every cell
    write_ivf_layout(e, path, max_cell_rows=20)

    # every (centroid, subcell) partition respects the cap
    laid = spark.read.parquet(path)
    sizes = laid.groupBy("centroid_id", "subcell").count().collect()
    assert sizes and max(r["count"] for r in sizes) <= 20
    # hot cells did split: at least one centroid has >1 subcell
    per_cell = {}
    for r in sizes:
        per_cell.setdefault(r["centroid_id"], set()).add(r["subcell"])
    assert any(len(v) > 1 for v in per_cell.values())

    # probing 2 cells returns exactly those cells' vectors…
    cells = sorted(per_cell)[:2]
    probe = read_ivf_probes(spark, path, cells)
    assert set(
        r["centroid_id"] for r in probe.select("centroid_id").distinct().collect()
    ) == set(cells)
    # …and no vector is lost or duplicated across the whole layout
    assert laid.count() == e.count()
    assert laid.select("vec_id").distinct().count() == e.count()

    # plan shape: the centroid predicate is a PartitionFilter on the
    # scan (pruned listing), not a post-scan Filter over all files
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "centroid_id" in pf.group(1), plan


def test_retrieval_eval_zero_relevant_label(spark, sf_dir, tmp_path):
    """A query whose label is UNIQUE in the corpus (n_relevant = 0) must
    yield ndcg_micro = 0, not crash: the IDCG element_at index is
    clamped to 1 because Spark evaluates it before the n_relevant == 0
    guard and index 0 throws under ANSI (review finding, r6). The
    oracle handles the same case via its CASE branch — both engines
    must agree on the degenerate row."""
    import os
    import sys

    from pgwarehouse_spark.registry import all_queries

    sys.path.insert(0, os.path.dirname(__file__))
    from pgwarehouse_spark.oraclecheck import compare, duckdb_conn

    # single-FILE parquet (Spark's writer emits a directory, which the
    # DuckDB side's read_parquet('<file>') registration does not glob)
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = tbl.to_pandas()
    df.loc[df["vec_id"] == 3, "label"] = 999  # label nobody else has
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "embeddings.parquet"),
    )

    spec = all_queries()["retrieval_eval_metrics"]
    con = duckdb_conn(str(tmp_path))
    report = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert report["ok"], report
    row = [
        r
        for r in spec.fn(spark, str(tmp_path)).collect()
        if r.query_id == 3
    ][0]
    assert row.n_hits == 0 and row.ndcg_micro == 0 and row.rr_micro == 0


def test_lsh_buckets_one_tree_matches_unrolled(spark, sf_dir):
    """r10: lsh_buckets computes all (table, plane) sign bits from ONE
    lambda-indexed expression tree; this pins it bit-equal to the
    original unrolled form (48 separate _hyperplane_sign trees) so the
    plan-size optimization can never drift the hash family."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.similarity import (
        LSH_PLANES_PER_TABLE,
        LSH_TABLES,
        _hyperplane_sign,
        lsh_buckets,
    )
    from pgwarehouse_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    # reference: the pre-r10 unrolled form, verbatim
    tables = []
    for ti in range(LSH_TABLES):
        bucket = F.lit(0)
        for pi in range(LSH_PLANES_PER_TABLE):
            bucket = bucket + F.shiftleft(
                _hyperplane_sign(F.col("embedding"), ti, pi), pi
            )
        tables.append(
            F.struct(F.lit(ti).alias("table_id"), bucket.alias("bucket"))
        )
    ref = (
        e.select("vec_id", F.explode(F.array(*tables)).alias("tb"))
        .select("vec_id", "tb.table_id", "tb.bucket")
    )
    got = {(r.vec_id, r.table_id): r.bucket for r in lsh_buckets(e).collect()}
    want = {(r.vec_id, r.table_id): r.bucket for r in ref.collect()}
    assert got == want
