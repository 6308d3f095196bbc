"""CLI round-trip: init → sync → listwh → extract/load (reference
test_list/test_extract/test_extract_load scenarios)."""

from __future__ import annotations

import os
import sys

import pytest

from pgwarehouse_spark.cli import main


@pytest.fixture()
def config_file(tmp_path, sf_dir):
    cfg = tmp_path / "pgw.yaml"
    cfg.write_text(
        f"""
source:
  type: parquet
  path: {sf_dir}
warehouse:
  path: {tmp_path}/wh
tables:
  nation:
    primary_key: n_nationkey
  region: {{}}
"""
    )
    return str(cfg)


def test_init_scaffold(tmp_path, capsys):
    cfg = str(tmp_path / "new.yaml")
    assert main(["init", "--config", cfg]) == 0
    assert os.path.exists(cfg)
    # refuses to clobber
    assert main(["init", "--config", cfg]) == 1


def test_sync_and_listwh(spark, config_file, capsys):
    assert main(["sync", "all", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "nation: created" in out and "region: created" in out
    assert main(["listwh", None, "--config", config_file][:2] + ["--config", config_file], spark=spark) == 0
    out = capsys.readouterr().out
    assert "nation\t25" in out and "region\t5" in out


def test_list_source(spark, config_file, capsys):
    assert main(["list", "--config", config_file], spark=spark) == 0
    out = capsys.readouterr().out
    assert "nation\t25" in out


def test_extract_load_roundtrip(spark, config_file, tmp_path, capsys):
    data = str(tmp_path / "staged")
    assert main(["extract", "nation", "--config", config_file, "--data", data], spark=spark) == 0
    assert os.path.exists(os.path.join(data, "nation"))
    assert main(["load", "nation", "--config", config_file, "--data", data, "--buckets", "2"], spark=spark) == 0
    assert main(["listwh", "--config", config_file], spark=spark) == 0
    assert "nation\t25" in capsys.readouterr().out


def test_sync_single_with_last_modified_flag(spark, config_file, capsys):
    rc = main(
        ["sync", "nation", "--config", config_file, "--buckets", "2",
         "--last-modified", "n_nationkey"],
        spark=spark,
    )
    assert rc == 0
    assert "nation: created" in capsys.readouterr().out


def test_queries_inventory(spark, capsys):
    assert main(["queries"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\taggregate\toracle" in out
    assert "q3_shipping_priority\tanalytics\toracle" in out
    assert "dedup_minhash_lsh" in out


def test_query_command_runs(spark, sf_dir, capsys):
    rc = main(
        ["query", "scan_project_filter", "--sf-dir", sf_dir, "--limit", "5"],
        spark=spark,
    )
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_query_command_unknown(spark, capsys):
    assert main(["query", "nope"], spark=spark) == 1
    assert "unknown query" in capsys.readouterr().err


def test_publish_to_jdbc(spark, config_file, tmp_path, capsys):
    """CLI publish: sync locally, then push into a live embedded-Derby
    database; re-publishing is a zero-row noop (remote watermark)."""
    db = str(tmp_path / "clidb")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    assert main(["sync", "nation", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    capsys.readouterr()
    assert (
        main(
            ["publish", "nation", "--config", config_file,
             "--jdbc-url", url, "--jdbc-driver", driver],
            spark=spark,
        )
        == 0
    )
    assert "published nation: 25 rows" in capsys.readouterr().out
    assert (
        main(
            ["publish", "nation", "--config", config_file,
             "--jdbc-url", url, "--jdbc-driver", driver],
            spark=spark,
        )
        == 0
    )
    assert "published nation: 0 rows" in capsys.readouterr().out


def test_verify_command(spark, config_file, capsys):
    assert main(["sync", "nation", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    capsys.readouterr()
    assert main(["verify", "nation", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    assert "nation: ok" in capsys.readouterr().out


def test_compact_command_and_publish_requires_pk(spark, config_file, tmp_path, capsys):
    assert main(["sync", "all", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    capsys.readouterr()
    assert main(["compact", "nation", "--config", config_file, "--buckets", "2"], spark=spark) == 0
    assert "compacted nation:" in capsys.readouterr().out
    # region has no primary key in the fixture config → publish skips it
    db = str(tmp_path / "nopkdb")
    assert (
        main(
            ["publish", "region", "--config", config_file,
             "--jdbc-url", f"jdbc:derby:{db};create=true",
             "--jdbc-driver", "org.apache.derby.jdbc.EmbeddedDriver"],
            spark=spark,
        )
        == 0
    )
    err = capsys.readouterr().err
    assert "skipped" in err


def test_dotenv_loading(tmp_path, monkeypatch):
    """VERDICT r01 item 8: CLI loads .env at startup (reference
    __main__.py:7); real environment wins over the file."""
    import os

    from pgwarehouse_spark.cli import load_dotenv

    env = tmp_path / ".env"
    env.write_text(
        "# comment\n"
        "PGW_TEST_A=plain\n"
        'export PGW_TEST_B="quoted value"\n'
        "PGW_TEST_C='single'\n"
        "PGW_TEST_EXISTING=from_file\n"
        "not a kv line\n"
    )
    monkeypatch.setenv("PGW_TEST_EXISTING", "from_env")
    for k in ("PGW_TEST_A", "PGW_TEST_B", "PGW_TEST_C"):
        monkeypatch.delenv(k, raising=False)
    applied = load_dotenv(str(env))
    assert applied == {
        "PGW_TEST_A": "plain",
        "PGW_TEST_B": "quoted value",
        "PGW_TEST_C": "single",
    }
    assert os.environ["PGW_TEST_EXISTING"] == "from_env"
    for k in applied:
        monkeypatch.delenv(k)


def test_interactive_init_backend_choice(tmp_path, monkeypatch, capsys):
    """Interactive init parity (reference pgwarehouse.py:130-160): a TTY
    user picks the source backend; non-TTY keeps the stock template."""
    import io

    from pgwarehouse_spark import cli

    cfg = tmp_path / "pgw.yaml"
    monkeypatch.setattr(sys.stdin, "isatty", lambda: True, raising=False)
    monkeypatch.setattr("builtins.input", lambda prompt="": "3")
    assert cli.main(["init", "--config", str(cfg)]) == 0
    text = cfg.read_text()
    # the DIRECTIVE line must change (a naive replace would mangle the
    # '# type: parquet | csv | jdbc' comment instead and still contain
    # the substring "type: jdbc")
    assert "\n  type: jdbc\n" in text
    assert "\n  type: parquet\n" not in text
    assert "# type: parquet | csv | jdbc" in text  # comment untouched

    cfg2 = tmp_path / "pgw2.yaml"
    monkeypatch.setattr(sys.stdin, "isatty", lambda: False, raising=False)
    assert cli.main(["init", "--config", str(cfg2)]) == 0
    assert "\n  type: parquet\n" in cfg2.read_text()


def test_explain_command(spark, capsys):
    """`explain <query>` prints the formatted physical plan (pushdown /
    shuffle drill-down for one registered query)."""
    from pgwarehouse_spark import cli

    rc = cli.main(
        ["explain", "agg_basic", "--sf-dir", "/root/testdata/sf0.001"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "ReadSchema" in out
    assert cli.main(["explain", "nope_not_a_query"], spark=spark) == 1


def test_sql_command(spark, capsys):
    """`sql '<stmt>'` registers the warehouse tables as views and runs
    arbitrary ANSI SQL through Catalyst."""
    from pgwarehouse_spark import cli

    rc = cli.main(
        [
            "sql",
            "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "r_name" in out
    assert cli.main(["sql"], spark=spark) == 1


def test_history_and_vacuum_commands(spark, tmp_path, capsys):
    """`history` lists committed versions of a transactional table;
    `vacuum` trims old ones."""
    import yaml

    from pgwarehouse_spark import cli
    from pgwarehouse_spark.sources.tables import load_table

    src_dir = tmp_path / "src"
    o = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    o.limit(300).write.parquet(str(src_dir / "orders"))
    cfg = tmp_path / "pgw.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "source": {"type": "parquet", "path": str(src_dir)},
                "warehouse": {"path": str(tmp_path / "wh")},
                "tables": {
                    "orders": {
                        "primary_key": "o_orderkey",
                        "last_modified": "o_orderdate",
                        "transactional": True,
                    }
                },
            }
        )
    )
    assert cli.main(["sync", "orders", "--config", str(cfg)], spark=spark) == 0
    # second sync commits another version (idempotent re-merge at the
    # boundary watermark)
    assert cli.main(["sync", "orders", "--config", str(cfg)], spark=spark) == 0
    capsys.readouterr()
    assert cli.main(["history", "orders", "--config", str(cfg)], spark=spark) == 0
    out = capsys.readouterr().out
    assert out.startswith("v0\t")
    assert cli.main(
        ["vacuum", "orders", "--config", str(cfg), "--keep-last", "1"],
        spark=spark,
    ) == 0
    capsys.readouterr()
    assert cli.main(["history", "orders", "--config", str(cfg)], spark=spark) == 0
    out = capsys.readouterr().out
    assert "300 rows" in out
    # non-transactional / unknown table errors cleanly
    assert cli.main(["history", "nope", "--config", str(cfg)], spark=spark) == 1


def test_bench_stdout_budget():
    """VERDICT r02 item 1: the driver tail-captures 2000 bytes of stdout,
    so bench.py's one JSON line must fit even at worst-case payload size
    (every headline query present with a long name and a large timing)."""
    import json as _json

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    timings = {n: 123.4567 for n in bench.HEADLINE}
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "sf1": {
            "sf": 1.0,
            "queries": {n: 999.9999 for n in bench.HEAVY},
            "total": 12345.6789,
            "slope_vs_base": {n: 10.25 for n in bench.HEAVY},
            "output_normalized": {
                n: {"per_row_cost_ratio": 99.999}
                for n in bench.OUTPUT_NORMALIZED
            },
        },
        "all_queries": {
            "sf_dir": "/root/testdata/sf0.01",
            "n": 270,
            "total": 12345.67,
            "max_name": "a_rather_long_query_name_here",
            "max_sec": 123.4567,
            "queries": {},
        },
        "contention": {
            "spread_p90": 99.999,
            "spread_max": 99.999,
            "micro_sec_start": 123.4567,
            "micro_sec_end": 123.4567,
            "disagree_ratio": 1.5,
            "max_extra_runs": 2,
        },
    }
    line = bench.compact_line(payload)
    assert len(line) <= bench.STDOUT_BUDGET, len(line)
    parsed = _json.loads(line)
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["value"] == payload["value"]
    assert parsed["sf1"]["slope_vs_base"]
    assert parsed["sf1"]["out_norm"]["dedup_containment"] == 99.999
    assert parsed["allq"]["n"] == 270 and parsed["allq"]["max_sec"] == 123.46
    assert parsed["contention"]["spread_p90"] == 99.999
    assert len(parsed["queries"]) > 0


def test_queries_sample_selfcheck(spark, sf_dir, capsys):
    """`queries --sample N --seed S`: the driver's oracle gate, locally
    invocable (VERDICT r02 item 9). Seeded → reproducible subset."""
    rc = main(
        ["queries", "--sample", "3", "--seed", "7", "--sf-dir", str(sf_dir)],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.strip().splitlines() if not l.startswith("#")]
    assert len(lines) == 3
    assert all(l.endswith("green") for l in lines)
    assert "3/3 green" in out
    # same seed → same subset
    main(["queries", "--sample", "3", "--seed", "7", "--sf-dir", str(sf_dir)],
         spark=spark)
    assert [l.split("\t")[0] for l in lines] == [
        l.split("\t")[0]
        for l in capsys.readouterr().out.strip().splitlines()
        if not l.startswith("#")
    ]


def test_optimize_zorder_cli(spark, sf_dir, tmp_path, capsys):
    """`optimize <table> --zorder a,b`: plain tables rewrite z-ordered
    (data identical); bucketed tables refuse with guidance."""
    import yaml

    src_dir = str(sf_dir)
    cfg = tmp_path / "pg.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "source": {"type": "parquet", "path": src_dir},
                "warehouse": {"path": str(tmp_path / "wh")},
                "tables": {
                    "orders": {},  # no PK -> plain layout
                    "customer": {"primary_key": "c_custkey"},
                },
            }
        )
    )
    assert main(["sync", "orders", "--config", str(cfg)], spark=spark) == 0
    assert main(["sync", "customer", "--config", str(cfg)], spark=spark) == 0
    wh_orders = str(tmp_path / "wh" / "orders")
    before = {
        tuple(r) for r in spark.read.parquet(wh_orders).collect()
    }
    rc = main(
        ["optimize", "orders", "--config", str(cfg),
         "--zorder", "o_custkey,o_orderkey"],
        spark=spark,
    )
    assert rc == 0
    after_df = spark.read.parquet(wh_orders)
    assert {tuple(r) for r in after_df.collect()} == before
    # bucketed table refuses
    capsys.readouterr()
    rc = main(
        ["optimize", "customer", "--config", str(cfg),
         "--zorder", "c_custkey,c_nationkey"],
        spark=spark,
    )
    assert rc == 1
    assert "merge-key layout" in capsys.readouterr().err
    # missing flag
    rc = main(["optimize", "orders", "--config", str(cfg)], spark=spark)
    assert rc == 1


def test_queries_sample_red_exits_nonzero(spark, sf_dir, capsys, monkeypatch):
    """A hash-mismatching query must print RED and exit 1."""
    from pgwarehouse_spark import registry
    from pgwarehouse_spark.registry import QuerySpec

    registry._ensure_loaded()
    bad = QuerySpec(
        name="zz_broken",
        fn=lambda s, d: s.range(1).selectExpr("CAST(1 AS BIGINT) AS a"),
        oracle="SELECT CAST(2 AS BIGINT) AS a",
        category="test",
    )
    monkeypatch.setattr(registry, "_REGISTRY", {"zz_broken": bad})
    rc = main(
        ["queries", "--sample", "1", "--seed", "0", "--sf-dir", str(sf_dir)],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 1
    assert "RED" in out and "0/1 green" in out


def test_backend_flag_precedence(spark, config_file, tmp_path):
    """--backend forces the warehouse type per invocation (reference
    __main__.py:18); the explicit flag wins over the config's
    warehouse.type in both directions."""
    from pgwarehouse_spark import cli
    from pgwarehouse_spark.sync.duckdb_sink import DuckDBSyncEngine
    from pgwarehouse_spark.sync.engine import SyncEngine

    # config has no type (parquet lake); flag forces live DuckDB
    args = cli._build_parser().parse_args(
        ["sync", "nation", "--config", config_file, "--backend", "duckdb"]
    )
    eng, cfg = cli._engine(args, spark=spark)
    assert isinstance(eng, DuckDBSyncEngine)
    assert cfg.warehouse["type"] == "duckdb"

    # same config without the flag -> parquet-lake engine
    args = cli._build_parser().parse_args(
        ["sync", "nation", "--config", config_file]
    )
    eng, _ = cli._engine(args, spark=spark)
    assert isinstance(eng, SyncEngine) and not isinstance(eng, DuckDBSyncEngine)

    # config pins duckdb; flag overrides it back to the parquet lake
    import yaml  # noqa: F401  (config is plain text; write directly)

    cfg2 = tmp_path / "pgw_duck.yaml"
    cfg2.write_text(
        open(config_file).read().replace(
            "warehouse:", "warehouse:\n  type: duckdb"
        )
    )
    args = cli._build_parser().parse_args(
        ["sync", "nation", "--config", str(cfg2), "--backend", "parquet"]
    )
    eng, cfg = cli._engine(args, spark=spark)
    assert isinstance(eng, SyncEngine) and not isinstance(eng, DuckDBSyncEngine)
    assert cfg.warehouse["type"] == "parquet"


def test_backend_flag_live_sync(spark, config_file, tmp_path, capsys):
    """End-to-end: --backend duckdb syncs into a live DuckDB file from a
    config that would otherwise use the parquet lake."""
    import duckdb

    assert main(
        ["sync", "nation", "--config", config_file, "--backend", "duckdb"],
        spark=spark,
    ) == 0
    wh = config_file.replace("pgw.yaml", "wh")
    con = duckdb.connect(wh)
    n = con.execute("SELECT count(*) FROM nation").fetchone()[0]
    con.close()
    assert n == 25


def test_queries_sample_out_artifact(spark, tmp_path, capsys):
    """`queries --sample N --out F` writes a CORRECTNESS-shaped JSON
    artifact (VERDICT r04 item 2) whose rows carry the driver's field
    names and whose greens agree with the printed report."""
    import json as _json

    out = tmp_path / "oracle_local.json"
    rc = main(
        ["queries", "--sample", "3", "--seed", "7",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(out)],
        spark=spark,
    )
    assert rc == 0
    data = _json.loads(out.read_text())
    assert len(data) == 3
    for name, row in data.items():
        assert set(row) == {
            "rows_match", "schema_match", "hash_match",
            "spark_rows", "oracle_rows", "err",
        }, name
        assert row["rows_match"] and row["schema_match"] and row["hash_match"]
        assert row["err"] is None


def test_queries_rotation_excludes_prior_artifacts(spark, tmp_path, capsys):
    """`queries --sample N --exclude-artifacts G` (VERDICT r8 task 3):
    queries already present in prior CORRECTNESS-shaped artifacts are
    excluded from the pick, and the --out artifact carries a
    _rotation_meta entry with the cumulative coverage count."""
    import json as _json

    from pgwarehouse_spark.registry import all_queries

    # fabricate a prior artifact covering ALL BUT three queries
    names = sorted(n for n, s in all_queries().items() if s.oracle)
    keep = names[:3]
    prior = {n: {"hash_match": True} for n in names if n not in keep}
    prior_path = tmp_path / "prior_artifact.json"
    prior_path.write_text(_json.dumps(prior))

    out = tmp_path / "rotation.json"
    rc = main(
        ["queries", "--sample", "10", "--seed", "7",
         "--sf-dir", "/root/testdata/sf0.001",
         "--exclude-artifacts", str(prior_path), "--out", str(out)],
        spark=spark,
    )
    assert rc == 0
    data = _json.loads(out.read_text())
    meta = data.pop("_rotation_meta")
    # only the three uncovered queries remain eligible and all ran
    assert sorted(data) == keep
    assert all(row["hash_match"] for row in data.values())
    assert meta["prior_covered"] == len(prior)
    assert meta["run_here"] == 3 and meta["excluded_here"] == len(prior)
    assert meta["registry_total"] == len(all_queries())
    assert meta["cumulative_covered"] == len(prior) + 3


def test_backend_clickhouse_snowflake_refuse_with_publish_recipe(
    spark, config_file, capsys
):
    """No live ClickHouse/Snowflake loader exists in this build: forcing
    them as the sync warehouse must FAIL LOUDLY with the publish recipe,
    never silently write the parquet lake while the user believes the
    warehouse was loaded."""
    for backend in ("clickhouse", "snowflake"):
        rc = main(
            ["sync", "nation", "--config", config_file, "--backend", backend],
            spark=spark,
        )
        err = capsys.readouterr().err
        assert rc == 1
        assert "publish" in err and backend in err


def test_spark_local_dir_is_workspace_owned(spark):
    """Shuffle/blockmgr scratch must live in a workspace-owned dir, not
    /tmp (VERDICT r6 task 1: a /tmp reaper deleted temp_shuffle_* files
    out from under the gate's bench subprocess mid-suite). Every session
    built by get_spark — suite, bench.py, gate subprocesses — shares
    this config."""
    local_dir = spark.conf.get("spark.local.dir")
    assert local_dir, "spark.local.dir unset — shuffle scratch is on /tmp"
    assert not local_dir.rstrip("/").startswith("/tmp"), local_dir
    assert os.path.isdir(local_dir), local_dir


def test_bench_time_query_contention_escalation():
    """VERDICT r6 item 2: when best-of-2 disagrees by more than
    DISAGREE_RATIO, time_query must take up to MAX_EXTRA_RUNS more
    samples before reporting the min; when runs agree, it must not."""
    import time as _time

    import bench

    class _FakeDF:
        def __init__(self, sleeps):
            self._sleeps = sleeps

        def count(self):
            _time.sleep(self._sleeps.pop(0))
            return 1

    # one contention spike then steady: 2 base runs disagree 6x -> escalate
    spiky = [0.3, 0.05, 0.05, 0.05]
    best, runs, n = bench.time_query(
        lambda s, d: _FakeDF(spiky), None, "", runs=2
    )
    assert len(runs) == 2 + bench.MAX_EXTRA_RUNS, runs
    assert best == min(runs) and n == 1

    # steady runs: no escalation
    steady = [0.05, 0.05]
    _, runs2, _ = bench.time_query(lambda s, d: _FakeDF(steady), None, "", runs=2)
    assert len(runs2) == 2, runs2


def test_bench_heavy_is_subset_of_headline():
    """The fresh-JVM coordinator (bench._coordinate) measures light
    headline queries in chunk children and gets the HEAVY queries' base
    timings from the heavy+sf1 child — so a HEAVY entry missing from
    HEADLINE would silently drop out of the merged headline artifact.
    Pin the invariant the merge relies on."""
    import bench

    missing = [n for n in bench.HEAVY if n not in bench.HEADLINE]
    assert not missing, (
        f"HEAVY queries not in HEADLINE (their base timings would vanish "
        f"from the coordinated artifact): {missing}"
    )


def test_bench_coordinator_defers_to_children_when_narrowed(monkeypatch):
    """Narrowed and all-only invocations (the scaling gate's subprocess
    shapes) must never recurse into the coordinator; the full run at
    headline scale must; tiny scales default to single-JVM unless
    forced."""
    import bench

    for var in ("SPARK_GRAFT_BENCH_FRESH_JVM", "SPARK_GRAFT_BENCH_QUERIES",
                "SPARK_GRAFT_BENCH_ALL_ONLY"):
        monkeypatch.delenv(var, raising=False)
    assert bench._should_coordinate(0.1)
    assert not bench._should_coordinate(0.001)  # tiny scale: single JVM
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FRESH_JVM", "1")
    assert bench._should_coordinate(0.001)      # unless forced on
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FRESH_JVM", "0")
    assert not bench._should_coordinate(0.1)    # or forced off
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FRESH_JVM")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_QUERIES", "q1_pricing_summary")
    assert not bench._should_coordinate(0.1)    # narrowed: child mode
    monkeypatch.delenv("SPARK_GRAFT_BENCH_QUERIES")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ALL_ONLY", "1")
    assert not bench._should_coordinate(0.1)    # all-only: child mode


def test_local_dir_explicit_override_fails_loudly(monkeypatch):
    """An operator-pinned SPARK_GRAFT_LOCAL_DIR that cannot be honored
    must raise, not silently fall back to a tempdir (the variable
    exists precisely to keep shuffle spill OFF other disks)."""
    from pgwarehouse_spark.session import _workspace_local_dir

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/proc/nonexistent/spill")
    with pytest.raises(OSError):
        _workspace_local_dir()
    # default path still resolves to the workspace dir
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR")
    assert _workspace_local_dir().endswith(".spark-local")
