"""Deterministic synthetic CDC change-stream generator (M0).

Produces a binlog/WAL-style change-event stream over the ``transcripts``
table shape (FIXTURES.md F2): ops I/U/D/UPSERT ~ 70/20/5/5%, global
``lsn`` order, ~2% duplicate-LSN redeliveries, bounded out-of-order
ingest, Zipf-skewed conversation sizes (hot keys), and an optional
schema-evolution point (epochs before ``evolve_epoch`` are written
WITHOUT the ``tool`` column — the reference's edition-over-edition
column drift, ``/root/reference/config/{2020,2023}/in/data/staging/``).

Everything is a pure function of (seed, n_events, ...): vectorized numpy,
chunk-written one parquet file per epoch under ``out_dir/epoch=<k>/``.
An exact replay oracle (DuckDB) is provided for tests.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


@dataclass(frozen=True)
class StreamSpec:
    seed: int = 42
    n_events: int = 10_000  # target logical change count (pre-duplicate)
    n_epochs: int = 4
    evolve_epoch: int | None = None  # epochs < this lack the `tool` column
    dup_rate: float = 0.02  # duplicate-LSN redelivery rate
    shuffle_window: int = 64  # max ingest-order displacement vs lsn order
    zipf_a: float = 1.5  # conversation-length skew (hot keys)
    max_turns: int = 500  # cap on conversation length
    text_pad: int = 0  # extra deterministic filler chars per turn text
    # (agent-transcript turns are typically hundreds of chars; bench uses
    # ~256 so per-row cost is realistic rather than metadata-dominated)
    rows_per_file: int = 125_000  # chunk epochs into multiple files, like
    # a real binlog tail does — a single giant file serializes the scan


def _role_idx(conv: np.ndarray, turn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic role/tool assignment from (conv, turn), as small-int
    dictionary indices (no Python string objects — scales to 10^8 rows)."""
    mix = (conv * 31 + turn * 7) % 20
    role = (turn % 2).astype(np.int8)  # 0=user, 1=assistant
    tool_mask = mix == 7
    role[tool_mask] = 2  # tool
    role[(turn == 0) & (conv % 13 == 0)] = 3  # system
    tool_idx = ((conv + turn) % 5).astype(np.int8)
    return role, np.where(tool_mask, tool_idx, -1).astype(np.int8)


_ROLE_DICT = ["user", "assistant", "tool", "system"]
_TOOL_DICT = [f"tool_{i}" for i in range(5)]


def generate_stream(out_dir: str, spec: StreamSpec = StreamSpec()) -> dict:
    """Write a deterministic change stream to ``out_dir/epoch=<k>/``.

    Returns summary stats (total events written incl. duplicates, epochs,
    distinct keys).
    """
    rng = np.random.default_rng(spec.seed)

    # --- 1. conversation universe (Zipf-skewed lengths => hot keys) -------
    t_ins = max(int(spec.n_events * 0.70), 4)
    lens = np.minimum(rng.zipf(spec.zipf_a, size=t_ins), spec.max_turns)
    cum = np.cumsum(lens)
    n_convs = min(int(np.searchsorted(cum, t_ins) + 1), len(lens))
    lens = lens[:n_convs].copy()
    lens[-1] = max(1, t_ins - (int(cum[n_convs - 2]) if n_convs > 1 else 0))
    t_ins = int(lens.sum())

    conv_of_turn = np.repeat(np.arange(n_convs, dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    turn_idx = np.arange(t_ins, dtype=np.int64) - np.repeat(starts, lens)

    # conversation start times interleave conversations in the global log
    conv_start = rng.uniform(0, t_ins, size=n_convs)
    ins_time = conv_start[conv_of_turn] + turn_idx.astype(np.float64)

    # --- 2. logical ops: I / U / D / UPSERT -------------------------------
    n_upd = round(t_ins * 20 / 70)
    n_del = round(t_ins * 5 / 70)
    n_ups = round(t_ins * 5 / 70)

    upd_pick = rng.integers(0, t_ins, n_upd)
    del_pick = rng.integers(0, t_ins, n_del)
    # upserts: half touch existing turns, half create brand-new turns
    ups_exist = rng.integers(0, t_ins, n_ups // 2)
    n_ups_new = n_ups - len(ups_exist)
    ups_new_conv = rng.integers(0, n_convs, n_ups_new)
    ups_new_turn = lens[ups_new_conv] + rng.integers(0, 3, n_ups_new)

    conv = np.concatenate(
        [conv_of_turn, conv_of_turn[upd_pick], conv_of_turn[del_pick],
         conv_of_turn[ups_exist], ups_new_conv]
    )
    turn = np.concatenate(
        [turn_idx, turn_idx[upd_pick], turn_idx[del_pick],
         turn_idx[ups_exist], ups_new_turn]
    )
    # op codes: 0=I, 1=U, 2=D, 3=UPSERT (dictionary-encoded at write)
    op = np.concatenate(
        [
            np.zeros(t_ins, dtype=np.int8),
            np.full(n_upd, 1, dtype=np.int8),
            np.full(n_del, 2, dtype=np.int8),
            np.full(n_ups // 2 + n_ups_new, 3, dtype=np.int8),
        ]
    )
    span = float(t_ins)
    ev_time = np.concatenate(
        [ins_time,
         ins_time[upd_pick] + rng.exponential(span * 0.05, n_upd) + 1e-3,
         ins_time[del_pick] + rng.exponential(span * 0.10, n_del) + 1e-3,
         ins_time[ups_exist] + rng.exponential(span * 0.05, len(ups_exist)) + 1e-3,
         conv_start[ups_new_conv] + ups_new_turn + rng.exponential(span * 0.05, n_ups_new)]
    )

    # --- 3. global LSN order ----------------------------------------------
    order = np.argsort(ev_time, kind="stable")
    conv, turn, op = conv[order], turn[order], op[order]
    n = len(conv)
    lsn = np.arange(1, n + 1, dtype=np.int64)

    # --- 4. bounded out-of-order ingest + duplicate redeliveries ----------
    pos = np.arange(n, dtype=np.float64) + rng.uniform(0, spec.shuffle_window, n)
    n_dup = int(round(n * spec.dup_rate))
    dup_src = rng.integers(0, n, n_dup)
    idx = np.concatenate([np.arange(n), dup_src])
    pos = np.concatenate([pos, pos[dup_src] + rng.uniform(1, 32, n_dup)])
    ingest_order = np.argsort(pos, kind="stable")
    idx = idx[ingest_order]  # row index (into lsn-ordered arrays) per ingest slot

    conv, turn, op, lsn = conv[idx], turn[idx], op[idx], lsn[idx]
    total = len(idx)
    ingest_ts = _BASE_TS + (np.arange(total, dtype=np.int64) * 1_000_000).astype(
        "timedelta64[us]"
    )

    # --- 5. payload columns (vectorized Arrow — no Python objects) ---------
    import pyarrow.compute as pc

    # payload ts is a pure function of (conv, turn): monotone per conversation
    ts = _BASE_TS + (
        (conv_start[conv] * 60_000_000).astype(np.int64)
        + turn * 60_000_000
    ).astype("timedelta64[us]")
    is_del = op == 2

    # large_string throughout: pyarrow's conservative (4 B/char) capacity
    # check rejects plain utf8 for >~70M rows even when actual bytes fit
    conv_id = pc.binary_join_element_wise(
        pa.scalar("c", pa.large_string()),
        pc.utf8_lpad(pc.cast(pa.array(conv), pa.large_string()), 7, "0"),
        pa.scalar("", pa.large_string()),
    )
    filler = ""
    if spec.text_pad:
        filler = " " + (
            "the quick brown fox jumps over the lazy dog "
            * (spec.text_pad // 44 + 1)
        )[: spec.text_pad]
    # large_string: total text bytes exceed the 2 GB int32-offset limit
    # of plain string arrays at >~7M padded rows
    pieces = [
        conv_id,
        pa.scalar("turn", pa.large_string()),
        pc.cast(pa.array(turn), pa.large_string()),
        pa.scalar("rev", pa.large_string()),
        pc.cast(pa.array(lsn), pa.large_string()),
    ]
    if filler:
        pieces.append(pa.scalar(filler.strip(), pa.large_string()))
    text = pc.binary_join_element_wise(*pieces, pa.scalar(" ", pa.large_string()))
    del_mask = pa.array(is_del)
    text = pc.if_else(del_mask, pa.scalar(None, pa.large_string()), text)

    epoch = (np.arange(total, dtype=np.int64) * spec.n_epochs) // total

    role_idx, tool_idx = _role_idx(conv, turn)
    role = pa.DictionaryArray.from_arrays(
        pa.array(role_idx, mask=is_del), pa.array(_ROLE_DICT)
    )
    tool_mask = is_del | (tool_idx < 0)
    if spec.evolve_epoch is not None:
        # a redelivered record carries its ORIGINAL serialization: an
        # event first emitted before the schema evolution has no `tool`
        # field, so a duplicate of it delivered after the boundary must
        # still read tool=NULL (otherwise two copies of one LSN differ in
        # payload and any max-LSN tie-break — engine's or oracle's —
        # becomes nondeterministic; observed as a real divergence when a
        # duplicate straddled the boundary)
        first_slot = np.full(n + 1, total, dtype=np.int64)
        np.minimum.at(first_slot, lsn, np.arange(total, dtype=np.int64))
        emit_epoch = epoch[first_slot[lsn]]
        tool_mask = tool_mask | (emit_epoch < spec.evolve_epoch)
    tool = pa.DictionaryArray.from_arrays(
        pa.array(
            np.where(tool_idx < 0, 0, tool_idx).astype(np.int8),
            mask=tool_mask,
        ),
        pa.array(_TOOL_DICT),
    )

    # --- 6. write one parquet per epoch ------------------------------------
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    tbl = pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "epoch": pa.array(epoch, pa.int64()),
            "op": pa.DictionaryArray.from_arrays(
                pa.array(op), pa.array(["I", "U", "D", "UPSERT"])
            ),
            "conv_id": conv_id,
            "turn_idx": pa.array(turn.astype(np.int32), pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(ts),
            "ingest_ts": pa.array(ingest_ts),
        }
    )
    bounds = np.searchsorted(epoch, np.arange(spec.n_epochs + 1))
    for k in range(spec.n_epochs):
        sl = tbl.slice(bounds[k], bounds[k + 1] - bounds[k])
        if spec.evolve_epoch is not None and k < spec.evolve_epoch:
            sl = sl.drop_columns(["tool"])
        d = os.path.join(out_dir, f"epoch={k}")
        os.makedirs(d, exist_ok=True)
        names = []
        for j, off in enumerate(range(0, max(sl.num_rows, 1), spec.rows_per_file)):
            name = f"part-{j:03d}.parquet"
            pq.write_table(sl.slice(off, spec.rows_per_file), os.path.join(d, name))
            names.append(name)
        # producer-side epoch-completeness marker: the producer DECLARES
        # the epoch's full file set once everything is durable. Consumers
        # (streaming tail) must trust only this — on an object store a
        # directory LIST is eventually consistent and a producer may
        # still be writing, while a GET of a known key is strongly
        # consistent. The leading underscore keeps Spark/Hadoop file
        # listings from treating it as data (the _SUCCESS convention).
        with open(os.path.join(d, "_DONE"), "w") as f:
            json.dump({"files": names}, f)
            f.flush()
            os.fsync(f.fileno())

    return {
        "total_events": total,
        "logical_events": n,
        "n_epochs": spec.n_epochs,
        "n_convs": n_convs,
        "distinct_keys": int(np.unique(conv * 1024 + turn).size),
    }


def oracle_final(events_dir: str) -> pd.DataFrame:
    """Expected final table state: max-LSN event per key, non-deleted.

    Independent replay in DuckDB (the engine never touches this path).
    """
    import duckdb

    con = duckdb.connect()
    df = con.execute(
        f"""
        WITH ev AS (
          SELECT * FROM read_parquet('{events_dir}/epoch=*/*.parquet',
                                     union_by_name=true)
        ), ranked AS (
          SELECT conv_id, turn_idx, role, text, tool, ts, op,
                 row_number() OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY lsn DESC) AS rn
          FROM ev
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx, ts
        """
    ).fetchdf()
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
