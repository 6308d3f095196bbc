"""pgwarehouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of scottpersinger/pgwarehouse.

The reference (/root/reference, v0.1.6) is a Postgres→warehouse batch ELT
sync tool; its capability surface is (a) the sync/ELT operator set it
executes itself (extract, schema/type translation, bulk load, incremental
append, last-modified upsert, reload, catalog ops — SURVEY.md §2-A) and
(b) the relational analytic query surface it provisions by loading data
into a columnar warehouse (SURVEY.md §2-B).

This package rebuilds both layers Spark-first:

- ``sync/``       — the ELT engine (watermark incremental, upsert-merge,
                    reload) as DataFrame reads/writes, Catalyst-planned.
- ``operators/``  — the relational query surface + large-scale pipeline
                    operators (dedup, similarity search, text analysis,
                    multimodal plumbing).
- ``sources/``    — parquet/CSV/JDBC readers with pushdown + partitioned
                    parallel extract.
- ``functions/``  — reusable column expressions (vector math, text).
- ``streaming/``  — Structured Streaming generalization of the reference's
                    high-watermark incremental loop.
- ``plans/``      — plan-inspection helpers (assert pushdown/broadcast).

Nothing here is copied from the reference — it is a re-expression of its
semantics on the Spark DataFrame/SQL engine.
"""

__version__ = "0.1.0"
