"""Per-batch / per-partition lineage records (SURVEY.md §2.4 A1).

BASELINE.json north_star requires "per-partition lineage (source offset
range, rows applied, merge conflicts) and throughput metrics". Lineage is
computed with one small aggregation per micro-batch (map-side combined by
Catalyst) and persisted inside the lake table's snapshot metadata, so a
snapshot fully explains which batch produced it and what it applied.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_module_spark import model


@dataclass
class BatchLineage:
    batch_id: int
    checkpoint_id: str
    n_events: int
    n_winners: int
    n_conflicts: int  # events superseded by LWW within the batch
    n_deletes: int
    min_emitted_at: int | None
    max_emitted_at: int | None
    buckets: list[int] = field(default_factory=list)
    per_partition: list[dict] = field(default_factory=list)

    def to_dict(self) -> dict:
        return asdict(self)


def lineage_from_batch(
    events: DataFrame, winners: DataFrame, batch_id: int, checkpoint_id: str
) -> BatchLineage:
    """Aggregate lineage for one micro-batch.

    ``events`` = parsed change rows (pre-dedup, with bucket column);
    ``winners`` = post-LWW rows. Two cheap aggregations; the per-partition
    breakdown groups by the ingest bucket (the engine's unit of parallelism
    and of file replacement), giving the "source offset range, rows applied"
    per partition demanded by the north rule.
    """
    per_part_rows = (
        events.groupBy(model.BUCKET_COLUMN)
        .agg(
            F.count("*").alias("events"),
            F.min(model.META_EMITTED).alias("min_emitted_at"),
            F.max(model.META_EMITTED).alias("max_emitted_at"),
            F.min(model.META_SEQ).alias("min_seq"),
            F.max(model.META_SEQ).alias("max_seq"),
        )
        .collect()
    )
    per_partition = [r.asDict() for r in per_part_rows]
    n_events = sum(p["events"] for p in per_partition)
    min_e = min((p["min_emitted_at"] for p in per_partition), default=None)
    max_e = max((p["max_emitted_at"] for p in per_partition), default=None)
    win_stats = winners.agg(
        F.count("*").alias("n"),
        F.sum((F.col(model.META_OP) == "d").cast("long")).alias("d"),
    ).collect()[0]
    n_winners = win_stats["n"] or 0
    return BatchLineage(
        batch_id=batch_id,
        checkpoint_id=checkpoint_id,
        n_events=n_events,
        n_winners=n_winners,
        n_conflicts=n_events - n_winners,
        n_deletes=int(win_stats["d"] or 0),
        min_emitted_at=min_e,
        max_emitted_at=max_e,
        buckets=sorted(int(p[model.BUCKET_COLUMN]) for p in per_partition),
        per_partition=per_partition,
    )
