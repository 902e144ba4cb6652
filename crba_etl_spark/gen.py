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


def _roles(conv: np.ndarray, turn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic role/tool assignment from (conv, turn)."""
    mix = (conv * 31 + turn * 7) % 20
    role = np.where(turn % 2 == 0, "user", "assistant").astype(object)
    tool_mask = mix == 7
    role[tool_mask] = "tool"
    role[(turn == 0) & (conv % 13 == 0)] = "system"
    tool = np.where(tool_mask, "tool_", None).astype(object)
    tool[tool_mask] = np.char.add(
        "tool_", ((conv[tool_mask] + turn[tool_mask]) % 5).astype(str)
    )
    return role, tool


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
    op = np.concatenate(
        [np.repeat("I", t_ins), np.repeat("U", n_upd), np.repeat("D", n_del),
         np.repeat("UPSERT", n_ups // 2 + n_ups_new)]
    ).astype(object)
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

    # --- 5. payload columns -----------------------------------------------
    # payload ts is a pure function of (conv, turn): monotone per conversation
    ts = _BASE_TS + (
        (conv_start[conv] * 60_000_000).astype(np.int64)
        + turn * 60_000_000
    ).astype("timedelta64[us]")
    conv_id = pd.Series(conv).astype(str).str.zfill(7).radd("c").to_numpy(object)
    role, tool = _roles(conv, turn)
    text = (
        pd.Series(conv_id, dtype=object)
        + " turn " + pd.Series(turn).astype(str)
        + " rev " + pd.Series(lsn).astype(str)
    ).to_numpy(object)
    is_del = op == "D"
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    epoch = (np.arange(total, dtype=np.int64) * spec.n_epochs) // total

    # --- 6. write one parquet per epoch ------------------------------------
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    tbl = pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "epoch": pa.array(epoch, pa.int64()),
            "op": pa.array(op, pa.string()),
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
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
        pq.write_table(sl, os.path.join(d, "part-0.parquet"))

    return {
        "total_events": total,
        "logical_events": n,
        "n_epochs": spec.n_epochs,
        "n_convs": n_convs,
        "distinct_keys": int(pd.DataFrame({"c": conv_id, "t": turn}).drop_duplicates().shape[0]),
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
