"""JdbcSource option assembly (pure; no live database in this
environment — the reader construction is what we can and do verify)."""

from __future__ import annotations

from pgwarehouse_spark.sync.engine import JdbcSource, make_source


def _src(**kw) -> JdbcSource:
    return JdbcSource("jdbc:postgresql://db:5432/app", user="u", password="p", **kw)


def test_plain_query_pushdown():
    opts = _src().jdbc_options("users", where="id > 100")
    assert opts["query"] == "SELECT * FROM users WHERE id > 100"
    assert opts["user"] == "u" and opts["password"] == "p"
    assert "partitionColumn" not in opts


def test_partitioned_read_requires_bounds():
    s = _src(partition_columns={"users": "id"})
    # no bounds yet → falls back to single-cursor query (valid config)
    assert "partitionColumn" not in s.jdbc_options("users")
    s.partition_bounds["users"] = (1, 1_000_000)
    opts = s.jdbc_options("users", where="id > 100")
    assert opts["dbtable"] == "(SELECT * FROM users WHERE id > 100) AS src"
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "8"
    assert "query" not in opts  # query+partitionColumn is invalid in Spark


def test_make_source_jdbc():
    src = make_source(
        {
            "type": "jdbc",
            "url": "jdbc:postgresql://db/x",
            "num_partitions": 4,
            "partition_columns": {"t": "pk"},
        }
    )
    assert isinstance(src, JdbcSource)
    assert src.num_partitions == 4
