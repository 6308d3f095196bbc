"""Z-order layout tests: the Morton curve must give every output file a
bounded rectangle of the 2-D key plane (both-dimension pruning), where a
single-column sort gives one thin stripe (no pruning on the second key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgwarehouse_spark.operators.zorder import write_zorder_layout, z_value


def _per_file_extents(spark, path, a, b):
    df = (
        spark.read.parquet(path)
        .withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            (F.max(a) - F.min(a)).alias("ext_a"),
            (F.max(b) - F.min(b)).alias("ext_b"),
        )
    )
    rows = df.collect()
    n = len(rows)
    return (
        sum(r["ext_a"] for r in rows) / n,
        sum(r["ext_b"] for r in rows) / n,
    )


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    from pgwarehouse_spark.sources.tables import load_table

    o = load_table(spark, str(sf_dir), "orders").select(
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("dd"),
    )
    glob_ck = o.agg(F.max("ck") - F.min("ck")).collect()[0][0]
    glob_dd = o.agg(F.max("dd") - F.min("dd")).collect()[0][0]

    zpath = str(tmp_path / "zordered")
    write_zorder_layout(o, zpath, "ck", "dd", n_files=16)
    z_ck, z_dd = _per_file_extents(spark, zpath, "ck", "dd")

    # single-column sort on ck: perfect on ck, useless on dd
    spath = str(tmp_path / "cksorted")
    (
        o.repartitionByRange(16, "ck")
        .sortWithinPartitions("ck")
        .write.mode("overwrite")
        .parquet(spath)
    )
    s_ck, s_dd = _per_file_extents(spark, spath, "ck", "dd")

    # z-order: BOTH dimensions bounded well below global extent
    assert z_ck < 0.5 * glob_ck, (z_ck, glob_ck)
    assert z_dd < 0.5 * glob_dd, (z_dd, glob_dd)
    # single-column sort leaves the second dimension effectively global
    assert s_dd > 0.9 * glob_dd, (s_dd, glob_dd)
    # and z-order's second-dimension extent beats it by a wide margin
    assert z_dd < 0.6 * s_dd, (z_dd, s_dd)


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a bigint, b bigint"
    ).select("a", "b", z_value("a", "b").alias("z"))
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b, z, ref(a, b))
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_layout_accepts_date_columns(spark, sf_dir, tmp_path):
    """ADVICE r03: the layout writer (and CLI `optimize --zorder`)
    advertises date columns — a raw DateType key must work end-to-end,
    producing bounded rectangles on (custkey, DAY) without the caller
    pre-converting, and reload must preserve the rows."""
    from pgwarehouse_spark.sources.tables import load_table

    o = load_table(spark, str(sf_dir), "orders").select(
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    zpath = str(tmp_path / "z_date")
    write_zorder_layout(o, zpath, "ck", "od", n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == o.count()
    assert dict(back.dtypes)["od"] == "date"
    # both-dimension locality: per-file extents far below global extents
    ext = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            (F.max("ck") - F.min("ck")).alias("ext_ck"),
            F.datediff(F.max("od"), F.min("od")).alias("ext_od"),
        )
    ).collect()
    g_ck = o.agg(F.max("ck") - F.min("ck")).collect()[0][0]
    g_od = o.agg(F.datediff(F.max("od"), F.min("od"))).collect()[0][0]
    assert len(ext) > 1
    avg_ck = sum(r["ext_ck"] for r in ext) / len(ext)
    avg_od = sum(r["ext_od"] for r in ext) / len(ext)
    assert avg_ck < g_ck and avg_od < g_od


def test_zorder_layout_rejects_unsupported_types_up_front(spark, tmp_path):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    with _pytest.raises(TypeError, match="z-order column 's'"):
        write_zorder_layout(df, str(tmp_path / "z"), "k", "s")


def test_rowgroup_stats_match_duckdb_parquet_metadata(spark, sf_dir, tmp_path):
    """Distributed footer inspection (r4): rowgroup_stats (binaryFile
    listing + executor-side pyarrow footer parse, data pages untouched)
    must agree with DuckDB's parquet_metadata() on every (file, row
    group, column) row count and min/max — and on a z-ordered layout
    the FOOTER stats alone must show bounded rectangles on both
    dimensions (the actual pruning mechanism, not a data re-scan)."""
    import duckdb

    from pgwarehouse_spark.operators.zorder import rowgroup_stats
    from pgwarehouse_spark.sources.tables import load_table

    o = load_table(spark, str(sf_dir), "orders").select(
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("dd"),
    )
    zpath = str(tmp_path / "z")
    write_zorder_layout(o, zpath, "ck", "dd", n_files=8)

    got = {
        (r["file"], r["row_group"], r["col_name"]): (
            r["n_rows"], r["min_val"], r["max_val"],
        )
        for r in rowgroup_stats(spark, zpath, ["ck", "dd"]).collect()
    }
    want = {
        (f, rg, col): (n, mn, mx)
        for f, rg, col, n, mn, mx in duckdb.sql(
            f"SELECT file_name, row_group_id, path_in_schema, "
            f"row_group_num_rows, stats_min_value, stats_max_value "
            f"FROM parquet_metadata('{zpath}/*.parquet') "
            f"WHERE path_in_schema IN ('ck', 'dd')"
        ).fetchall()
    }
    assert got == want and len(got) > 2

    # footer-only locality proof: per-row-group extents ≪ global extents
    by_rg: dict = {}
    for (f, rg, col), (_n, mn, mx) in got.items():
        by_rg.setdefault((f, rg), {})[col] = int(mx) - int(mn)
    g_ck = o.agg(F.max("ck") - F.min("ck")).collect()[0][0]
    g_dd = o.agg(F.max("dd") - F.min("dd")).collect()[0][0]
    ext_ck = sum(v["ck"] for v in by_rg.values()) / len(by_rg)
    ext_dd = sum(v["dd"] for v in by_rg.values()) / len(by_rg)
    assert ext_ck <= g_ck * 0.6 and ext_dd <= g_dd * 0.6, (ext_ck, ext_dd)
