"""Checkpoint / resume helpers (M4).

The single source of truth for progress is the icelite snapshot itself:
the committed-epoch set rides the same atomic pointer swap as the data,
so there is no window where data is visible but the marker is not (or
vice versa). "Resuming from a checkpoint" is therefore just: read the
snapshot, skip committed epochs, continue. These helpers expose that as
an explicit API and locate the resume point for a file-tail source.

Reference analog: the staging layer + re-run idempotence — a re-run of
the reference pipeline regenerates staging files deterministically
(SURVEY.md §1.1 D3); here a re-run replays only uncommitted epochs.
"""

from __future__ import annotations

from .engine import CDCEngine, list_epochs
from .icelite import IceliteTable


def committed_epochs(table_root: str) -> set[int]:
    return IceliteTable(table_root).committed_epochs()


def resume_point(table_root: str, events_dir: str) -> list[int]:
    """Epochs present in the source but not yet committed, in order."""
    done = committed_epochs(table_root)
    return [k for k in list_epochs(events_dir) if k not in done]


def resume(engine: CDCEngine, events_dir: str) -> dict:
    """Continue a replay from wherever the last run stopped."""
    todo = resume_point(engine.table.root, events_dir)
    return engine.replay(events_dir, epochs=todo)
