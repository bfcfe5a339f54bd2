"""Checkpointed sync-offset state (SURVEY.md §2.9 T1/T3).

The reference keeps a JSON blob per chain in Airflow Variables:
``{last_synced_block, last_synced_block_date, latest_block,
latest_block_date}`` (``airflow/bitquery.py:185-205, 271-285``) — a
mutable key-value store with no history. Here the state is an
append-only JSON log per stream under a checkpoint directory: each
commit writes a new versioned record, the current state is the
highest version, and history is retained for debugging/replay —
the shape of a Structured Streaming offset/commit log, kept
human-readable.

Driver-side file IO is deliberate: state is O(bytes) and belongs
next to the job's checkpoint location, not in a distributed table.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from datetime import date


@dataclass
class SyncState:
    """Watermark tuple (reference ``airflow/bitquery.py:271-284``)."""

    last_synced_block: int
    last_synced_block_date: str
    latest_block: int
    latest_block_date: str

    @classmethod
    def initial(cls) -> "SyncState":
        return cls(-1, "1970-01-01", -1, "1970-01-01")


class SyncStateStore:
    """Versioned JSON state log: ``{root}/{stream}/NNNNNNNNNN.json``."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, stream: str) -> str:
        return os.path.join(self.root, stream)

    def _versions(self, stream: str) -> list[int]:
        d = self._dir(stream)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")
        )

    def get(self, stream: str) -> SyncState:
        """Read the committed state (reference ``get_synced_status``,
        ``airflow/bitquery.py:185-205``); initial sentinel when the
        stream has never committed."""
        versions = self._versions(stream)
        if not versions:
            return SyncState.initial()
        path = os.path.join(self._dir(stream), f"{versions[-1]:010d}.json")
        with open(path) as f:
            return SyncState(**json.load(f))

    def commit(self, stream: str, state: SyncState) -> int:
        """Append a new state version atomically (write temp + rename)."""
        d = self._dir(stream)
        os.makedirs(d, exist_ok=True)
        version = (self._versions(stream) or [-1])[-1] + 1
        path = os.path.join(d, f"{version:010d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(state), f)
        os.replace(tmp, path)
        return version

    def history(self, stream: str) -> list[SyncState]:
        out = []
        for v in self._versions(stream):
            with open(os.path.join(self._dir(stream), f"{v:010d}.json")) as f:
                out.append(SyncState(**json.load(f)))
        return out
