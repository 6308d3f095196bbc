"""Engine catalog: per-table sync metadata + YAML config.

Spark schemas carry no key constraints, so the PK/watermark metadata the
reference scrapes from `psql \\d` (pgwarehouse.py:248-252,305-335) lives
here as explicit engine state. The config file mirrors the reference's
YAML shape (README.md:43-96: `postgres:`/`warehouse:`/`tables:` stanzas,
env-var fallbacks pgwarehouse.py:200-210) with `source:` generalizing
`postgres:`.

Also implements the per-table options the reference *documents but never
wired up* (`skip: true`, scheduled `reload: sun` / day-of-month —
README.md:190-215 vs the `reload == True`-only check at
pgwarehouse.py:181).
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field
from typing import Any

_DAYS = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]


@dataclass
class TableSpec:
    name: str
    primary_key: list[str] = field(default_factory=list)
    last_modified: str | None = None  # watermark column → upsert strategy
    reload: bool | str | int = False  # True | weekday name | day-of-month
    skip: bool = False
    max_records: int | None = None
    transactional: bool = False  # versioned TxTable layout (snapshot isolation)

    @property
    def strategy(self) -> str:
        if self.last_modified:
            return "upsert"
        if self.primary_key:
            return "append"
        return "reload"  # no PK: reference's reload-only fallback (README.md:175-177)

    def should_reload(self, today: dt.date | None = None) -> bool:
        """True/'sun'/<day-of-month> reload scheduling (implements the
        documented-but-missing reference behavior)."""
        if self.reload is True:
            return True
        if not self.reload:
            return False
        today = today or dt.date.today()
        r = self.reload
        if isinstance(r, str) and r.lower()[:3] in _DAYS:
            return _DAYS[today.weekday()] == r.lower()[:3]
        try:
            return today.day == int(r)
        except (TypeError, ValueError):
            return False

    @classmethod
    def from_opts(cls, name: str, opts: dict[str, Any] | None) -> "TableSpec":
        opts = opts or {}
        # a present-but-empty YAML key ('primary_key:') parses to None —
        # treat it as absent instead of TypeError-ing on list(None)
        pk = opts.get("primary_key", opts.get("pk")) or []
        if isinstance(pk, str):
            pk = [pk]
        return cls(
            name=name,
            primary_key=list(pk),
            last_modified=opts.get("last_modified"),
            reload=opts.get("reload", False),
            skip=bool(opts.get("skip", False)),
            max_records=opts.get("max_records"),
            transactional=bool(opts.get("transactional", False)),
        )


# Default PK/watermark metadata for the driver testdata tables.
TESTDATA_SPECS: dict[str, TableSpec] = {
    "region": TableSpec("region", ["r_regionkey"]),
    "nation": TableSpec("nation", ["n_nationkey"]),
    "customer": TableSpec("customer", ["c_custkey"]),
    "supplier": TableSpec("supplier", ["s_suppkey"]),
    "part": TableSpec("part", ["p_partkey"]),
    "orders": TableSpec("orders", ["o_orderkey"], last_modified="o_orderdate"),
    "lineitem": TableSpec(
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],  # composite
        last_modified="l_shipdate",
    ),
    "events": TableSpec("events", ["event_id"], last_modified="ts"),
    "documents": TableSpec("documents", ["doc_id"]),
    "embeddings": TableSpec("embeddings", ["vec_id"]),
}


@dataclass
class Config:
    source: dict[str, Any]
    warehouse: dict[str, Any]
    tables: dict[str, TableSpec]

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        source = dict(raw.get("source", raw.get("postgres", {})) or {})
        warehouse = dict(raw.get("warehouse", {}) or {})
        # Env fallbacks, mirroring the reference's credential resolution
        # (pgwarehouse.py:200-210: every credential falls back to env).
        for key, env in [
            ("url", "PGW_SOURCE_URL"),
            ("path", "PGW_SOURCE_PATH"),
            ("user", "PGW_SOURCE_USER"),
            ("password", "PGW_SOURCE_PASSWORD"),
        ]:
            if not source.get(key) and os.environ.get(env):
                source[key] = os.environ[env]
        if not warehouse.get("path") and os.environ.get("PGW_WAREHOUSE_PATH"):
            warehouse["path"] = os.environ["PGW_WAREHOUSE_PATH"]
        tables_raw = raw.get("tables") or {}
        tables = {
            name: TableSpec.from_opts(name, opts) for name, opts in tables_raw.items()
        }
        return cls(source=source, warehouse=warehouse, tables=tables)


CONFIG_TEMPLATE = """\
# pgwarehouse_spark config (init scaffold — reference A30 semantics)
source:
  # type: parquet | csv | jdbc
  type: parquet
  path: /root/testdata/sf0.001
  # For jdbc sources:
  # url: jdbc:postgresql://host:5432/db   (env: PGW_SOURCE_URL)
  # user: ...                             (env: PGW_SOURCE_USER)
  # password: ...                         (env: PGW_SOURCE_PASSWORD)
warehouse:
  path: ./warehouse
tables:
  orders:
    primary_key: o_orderkey
    last_modified: o_orderdate   # enables upsert strategy
    # transactional: true        # versioned snapshots + time travel
  customer:
    primary_key: c_custkey       # append strategy
  # region:
  #   reload: sun                # scheduled full reload
  #   skip: true                 # exclude from `sync all`
"""
