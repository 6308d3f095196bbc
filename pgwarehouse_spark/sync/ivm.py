"""Incremental JOIN-view maintenance: keep a materialized join (or
join+aggregate) view up to date from base-table deltas without
recomputing the join — the second half of the classic IVM decomposition
(sync/rollup.py maintains the aggregate half).

For an inner-join view V = A ⋈ B and insert-only deltas dA, dB, the
exact view delta is the three-term expansion

    dV = (dA ⋈ B_old) ∪ (A_old ⋈ dB) ∪ (dA ⋈ dB)

(equivalently (A_old ∪ dA) ⋈ (B_old ∪ dB) minus A_old ⋈ B_old, but the
expansion never touches the old-⋈-old term — the whole point).

Scale design: dA and dB are batch-sized, so both cross terms are a
delta-⋈-base equi-join — the base side is scanned once with the join
key pushed into the scan partitioning (at 100 TB the base is the
bucket-partitioned table write_bucketed lays out, so only buckets
containing delta keys are read, mirroring merge_into_bucketed's
pruning). The dA ⋈ dB term is delta-sized on both sides. Nothing ever
recomputes A_old ⋈ B_old, which is what makes a continuously-maintained
100 TB join view affordable: per-batch cost is O(|delta| + matched
base rows), not O(|view|).

Contract: insert-only deltas (the append / watermark sync strategies).
Updates-as-upserts require retraction tuples (old row with -1 weight) —
the standard bag-algebra extension; `join_view_delta` accepts
pre-retracted inputs because it is linear in each argument.

Delivery semantics: like rollup maintenance, applying a delta twice
double-counts; pair with exactly-once delivery (streaming checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Exact delta of the inner-join view A ⋈ B under insert-only deltas.

    The delta frames are broadcast (they are batch-sized by contract);
    the base frames stream past them — no base-side shuffle. Callers
    with delta batches above the broadcast threshold should drop the
    hint and let AQE pick the strategy.
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        F.broadcast(da).join(b_old, on)
        .unionByName(a_old.join(F.broadcast(db), on))
        .unionByName(F.broadcast(da).join(db, on))
    )


def maintain_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """New view contents = old view ∪ join_view_delta (bag semantics —
    an inner join of bags is linear, so union IS the merge)."""
    return view_old.unionByName(join_view_delta(a_old, da, b_old, db, on))
