"""Run metrics — batch sizes, throughput, shard counts (SURVEY §7 plan).

The reference logs per-batch record counts and last-PK-synced
(http_record_writer.go:121-133); we record the same per micro-batch plus
events/sec, which is the BASELINE.json headline metric."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class BatchMetrics:
    batch_id: int
    events: int
    rows_after: int
    affected_buckets: int
    seconds: float
    schema_changes: list[str] = field(default_factory=list)
    # quarantined undecodable lines this batch (-1 = quarantine not enabled
    # or not a decode path); counted from the written rejects partition's
    # parquet footers — driver metadata read, no extra job
    n_rejects: int = -1

    @property
    def events_per_sec(self) -> float:
        return self.events / self.seconds if self.seconds > 0 else 0.0


@dataclass
class RunMetrics:
    batches: list[BatchMetrics] = field(default_factory=list)
    started_at: float = field(default_factory=time.monotonic)

    def add(self, m: BatchMetrics) -> None:
        self.batches.append(m)

    @property
    def total_events(self) -> int:
        return sum(b.events for b in self.batches)

    @property
    def wall_seconds(self) -> float:
        return time.monotonic() - self.started_at

    @property
    def events_per_sec(self) -> float:
        w = self.wall_seconds
        return self.total_events / w if w > 0 else 0.0

    def to_json(self) -> str:
        return json.dumps(
            {
                "total_events": self.total_events,
                "wall_seconds": round(self.wall_seconds, 3),
                "events_per_sec": round(self.events_per_sec, 1),
                "batches": [
                    {
                        "batch_id": b.batch_id,
                        "events": b.events,
                        "rows_after": b.rows_after,
                        "affected_buckets": b.affected_buckets,
                        "seconds": round(b.seconds, 3),
                        "schema_changes": b.schema_changes,
                        "n_rejects": b.n_rejects,
                    }
                    for b in self.batches
                ],
            }
        )
