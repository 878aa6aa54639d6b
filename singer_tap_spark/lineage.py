"""Per-partition lineage (STATE bookmarks) — operators O18/O19/O9 (SURVEY §2.1).

The reference tracks a base64 protobuf ``TableCursor`` per (stream, shard)
(types.go:455-484), merges saved bookmarks over a generated empty state
(sync.go:41-58, generateEmptyState :174-188), emits STATE only AFTER records
are flushed (sync.go:96-142), and hard-errors when the binlog was purged past
the cursor (planetscale_edge_database.go:117-126).

Here the cursor is ``{shard: {offset, batch_id, snapshot_id, last_pk}}`` JSON,
written atomically AFTER each lake MERGE commits (flush-before-state).  On a
crash between MERGE and lineage write, the batch replays and the merge's
(ts, seq) guard makes it a no-op — at-least-once delivery + idempotent upsert
= exactly-once table state, the same argument the reference makes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any


class StaleCheckpointError(RuntimeError):
    """Checkpointed offsets predate the retained change log — the analogue of
    'Cannot replicate because the master purged required binary logs'
    (planetscale_edge_database.go:40, 117-126).  Demands a full re-sync."""


@dataclass
class ShardCursor:
    offset: int = -1  # last applied change-log offset (GTID analogue)
    batch_id: int = -1
    snapshot_id: str = ""
    last_pk: dict[str, Any] | None = None  # mid-table resume (O8)

    def to_json(self) -> dict[str, Any]:
        return {
            "offset": self.offset,
            "batch_id": self.batch_id,
            "snapshot_id": self.snapshot_id,
            "last_pk": self.last_pk,
        }


@dataclass
class Lineage:
    """streams -> shards -> cursor; Singer State analogue (types.go:455-469)."""

    streams: dict[str, dict[str, ShardCursor]] = field(default_factory=dict)

    # -- construction / merge (O19) ----------------------------------------
    @staticmethod
    def empty(stream: str, shards: list[str]) -> "Lineage":
        """generateEmptyState analogue (sync.go:174-188)."""
        return Lineage({stream: {s: ShardCursor() for s in shards}})

    def merged_with_saved(self, saved: "Lineage | None") -> "Lineage":
        """Overlay saved bookmarks on this empty/base state: known shards
        keep their bookmark, new shards start empty, saved-but-unknown
        streams are retained (sync.go:41-58 semantics)."""
        if saved is None:
            return self
        out = Lineage({s: dict(sh) for s, sh in self.streams.items()})
        for stream, shards in saved.streams.items():
            tgt = out.streams.setdefault(stream, {})
            for shard, cur in shards.items():
                tgt[shard] = cur
        return out

    # -- persistence (O18, O21) --------------------------------------------
    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {
                    "streams": {
                        s: {"shards": {k: c.to_json() for k, c in sh.items()}}
                        for s, sh in self.streams.items()
                    }
                },
                f,
                indent=2,
            )
        os.replace(tmp, path)  # atomic: lineage is never half-written

    @staticmethod
    def load(path: str) -> "Lineage | None":
        if not os.path.exists(path):
            return None
        with open(path) as f:
            doc = json.load(f)
        # accept both bare and {"type":"STATE","value":...} wrapped forms,
        # mirroring parseSavedStateContents (parser.go:20-43)
        if doc.get("type") == "STATE":
            doc = doc.get("value", {})
        streams: dict[str, dict[str, ShardCursor]] = {}
        for s, body in doc.get("streams", {}).items():
            streams[s] = {
                k: ShardCursor(
                    offset=c.get("offset", -1),
                    batch_id=c.get("batch_id", -1),
                    snapshot_id=c.get("snapshot_id", ""),
                    last_pk=c.get("last_pk"),
                )
                for k, c in body.get("shards", {}).items()
            }
        return Lineage(streams)

    # -- staleness (O9) ------------------------------------------------------
    def check_not_stale(
        self, stream: str, retained_min_offsets: dict[str, int]
    ) -> None:
        """Raise :class:`StaleCheckpointError` if, for any shard, events in
        (saved_offset, retained_min) were purged from the log — i.e. resume
        would silently skip changes."""
        shards = self.streams.get(stream, {})
        stale = {
            shard: (cur.offset, retained_min_offsets[shard])
            for shard, cur in shards.items()
            if cur.offset >= 0
            and shard in retained_min_offsets
            and cur.offset < retained_min_offsets[shard] - 1
        }
        if stale:
            raise StaleCheckpointError(
                "state is stale, a full re-sync is required "
                f"(saved offset < min retained offset - 1): {stale}"
            )

    def advance(
        self,
        stream: str,
        shard_max_offsets: dict[str, int],
        batch_id: int,
        snapshot_id: str,
    ) -> None:
        shards = self.streams.setdefault(stream, {})
        for shard, off in shard_max_offsets.items():
            cur = shards.setdefault(shard, ShardCursor())
            if off > cur.offset:
                cur.offset = off
            cur.batch_id = batch_id
            cur.snapshot_id = snapshot_id
