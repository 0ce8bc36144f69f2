"""Materialize the deterministic Erigon-shaped fixtures to parquet so the
flagship domain pipeline sits under the driver's DuckDB hash gate.

Two layers land on disk (``/root/repo/fixtures_parquet``):

- RAW tables (``account_changesets``/``storage_changesets``/``plain_state``/
  ``plain_code_hash``): byte-for-byte what ``fixtures.generate`` emits —
  the Spark queries read these and run the REAL pipeline (Arrow-batched
  blob decode → broadcast code-hash recovery → transpose → re-key).
- DECODED tables (``d_*``): the same rows decoded by the pure-Python
  reference decoder (functions.decode), PRE-recovery. The DuckDB oracle
  starts from these and performs the SQL-expressible semantics itself —
  code-hash recovery join, +1 PlainState shift (erigon_extract.c:2373-2387),
  lag re-keying (2409-2433) and the genesis filter (2421-2426) — so a defect
  in ANY Spark stage (decode included) breaks the value hash.

Snapshot tables (``snap60_*``, ``snap_tip_*``) feed the incremental-update
query; its oracle is the SAME state-history SQL because base@60 + delta must
equal the full rebuild (tests/test_incremental.py proves the equivalence).

Everything is a pure function of ``PARAMS`` (seed=42); files are written
once and committed, and ``ensure()`` regenerates them only when the marker
params drift.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from erigon_extract_spark import fixtures as fxmod
from erigon_extract_spark.functions.decode import (
    _decode_account_one,
    _decode_storage_one,
)

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "fixtures_parquet"
PARAMS = {"seed": 42, "n_addresses": 8, "n_blocks": 120, "n_body_blocks": 10}
_MARKER = "_VERSION.json"
_VERSION = 4

RAW_TABLES = (
    "account_changesets",
    "storage_changesets",
    "plain_state",
    "plain_code_hash",
)


def _write(path: Path, names: list[str], types: list[pa.DataType], rows: list[tuple]):
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    arrays = [pa.array(list(c), type=t) for c, t in zip(cols, types)]
    pq.write_table(
        pa.table(dict(zip(names, arrays))),
        path,
        compression="snappy",
        # stable file bytes across rewrites: no embedded creation metadata
        # beyond what pyarrow always writes
    )


def _decoded_account_rows(rows: list[tuple]) -> list[tuple]:
    """(block, address, blob) → decoded pre-recovery frame rows."""
    out = []
    for block, address, blob in rows:
        nonce, balance, inc, ch, err = _decode_account_one(blob)
        if err is not None:  # fixtures are well-formed by construction
            raise ValueError(f"fixture blob failed decode: {err}")
        out.append((block, address, nonce, balance, inc, ch))
    return out


def _decoded_storage_rows(rows: list[tuple]) -> list[tuple]:
    """(block, address, incarnation, blob) → decoded frame rows."""
    out = []
    for block, address, inc, blob in rows:
        slot, value, err = _decode_storage_one(blob)
        if err is not None:
            raise ValueError(f"fixture storage blob failed decode: {err}")
        out.append((block, address, inc, slot, value))
    return out


def generate_all(target: Path) -> None:
    target.mkdir(parents=True, exist_ok=True)
    fx = fxmod.generate(**PARAMS)
    i64, binary = pa.int64(), pa.binary()

    # --- raw tables (inputs to the Spark pipeline) ---
    _write(
        target / "account_changesets.parquet",
        ["block", "address", "account_blob"],
        [i64, binary, binary],
        fx.account_changesets,
    )
    _write(
        target / "storage_changesets.parquet",
        ["block", "address", "incarnation", "storage_blob"],
        [i64, binary, i64, binary],
        fx.storage_changesets,
    )
    _write(
        target / "plain_state.parquet",
        ["key", "value", "block"],
        [binary, binary, i64],
        fx.plain_state,
    )
    _write(
        target / "plain_code_hash.parquet",
        ["address", "incarnation", "code_hash"],
        [binary, i64, binary],
        fx.plain_code_hash,
    )

    # --- decoded tables (inputs to the DuckDB oracle) ---
    acct_names = ["block", "address", "nonce", "balance", "incarnation", "code_hash"]
    acct_types = [i64, binary, i64, binary, i64, binary]
    stor_names = ["block", "address", "incarnation", "slot", "value"]
    stor_types = [i64, binary, i64, binary, binary]

    _write(
        target / "d_account_changes.parquet",
        acct_names,
        acct_types,
        _decoded_account_rows(fx.account_changesets),
    )
    _write(
        target / "d_storage_changes.parquet",
        stor_names,
        stor_types,
        _decoded_storage_rows(fx.storage_changesets),
    )
    ps_acct = [
        (addr, blob, blk) for addr, blob, blk in fx.plain_state if len(addr) == 20
    ]
    ps_stor = [
        (key, blob, blk) for key, blob, blk in fx.plain_state if len(key) == 28
    ]
    _write(
        target / "d_ps_account.parquet",
        acct_names,
        acct_types,
        _decoded_account_rows([(blk, addr, blob) for addr, blob, blk in ps_acct]),
    )
    _write(
        target / "d_ps_storage.parquet",
        stor_names,
        stor_types,
        _decoded_storage_rows(
            [
                (blk, key[:20], int.from_bytes(key[20:28], "big"), blob)
                for key, blob, blk in ps_stor
            ]
        ),
    )

    # --- snapshots for the incremental-maintenance query ---
    t_split = PARAMS["n_blocks"] // 2  # 60, matching erigon_incremental_q
    for tag, at_block in (("snap60", t_split), ("snap_tip", fx.latest_block)):
        _write(
            target / f"{tag}_account.parquet",
            acct_names,
            acct_types,
            fxmod.account_snapshot_rows(fx, at_block),
        )
        _write(
            target / f"{tag}_storage.parquet",
            stor_names,
            stor_types,
            fxmod.storage_snapshot_rows(fx, at_block),
        )

    # --- tx-bodies pipeline (S5/S6/K4/A2) ---
    _write(
        target / "block_bodies.parquet",
        ["block", "block_hash", "body_rlp"],
        [i64, binary, binary],
        fx.block_bodies,
    )
    _write(
        target / "block_transactions.parquet",
        ["tx_id", "tx_rlp"],
        [i64, binary],
        fx.block_transactions,
    )
    from erigon_extract_spark.functions.decode import _decode_body_one

    d_bodies = []
    for block, block_hash, body_rlp in fx.block_bodies:
        tx_index, tx_amount, uncles, err = _decode_body_one(body_rlp)
        if err is not None:
            raise ValueError(f"fixture body RLP failed decode: {err}")
        d_bodies.append((block, block_hash, tx_index, tx_amount, uncles))
    _write(
        target / "d_block_bodies.parquet",
        ["block", "block_hash", "tx_index", "tx_amount", "uncles"],
        [i64, binary, i64, i64, binary],
        d_bodies,
    )

    # --- reference-dialect golden file (merged full-history layout) ---
    # The expected state-history rows, encoded byte-exactly in the
    # reference's merged-file format (256-byte header + strategy-0 stream
    # with 4 KiB restart pages). Decoding it with codec/refstream must
    # reproduce the rows the oracle SQL derives — that puts the format
    # codec itself under the driver's hash gate.
    from erigon_extract_spark.codec import refstream as rs

    items = []
    for addr, kind, inc, slot, block_from, nonce, bal, ch, val in (
        fxmod.expected_state_history(fx)
    ):
        if kind == 0:
            items.append(rs.AccountItem(block_from, addr, nonce, bal, inc, ch))
        else:
            items.append(rs.StorageItem(block_from, addr, inc, slot, val))
    (target / "full-history.dat").write_bytes(
        rs.encode_full_history_file(
            items, block_start=0, block_end=fx.latest_block + 1
        )
    )

    (target / _MARKER).write_text(
        json.dumps({"version": _VERSION, "params": PARAMS}, sort_keys=True)
    )


def ensure(target: Path | str | None = None) -> Path:
    """Idempotently materialize the fixture parquet sidecar; returns its path."""
    target = Path(target) if target else FIXTURE_DIR
    marker = target / _MARKER
    want = json.dumps({"version": _VERSION, "params": PARAMS}, sort_keys=True)
    if marker.exists() and marker.read_text() == want:
        return target
    generate_all(target)
    return target


if __name__ == "__main__":
    print(ensure())
