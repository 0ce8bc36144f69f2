"""Opcode-stream codec for sorted state-history rows — the engine's own
compact, page-restartable encoding (capability parity with the reference's
K1/K2/S8 sink/source, SURVEY.md §2.1/§2.2; deliberately NOT byte-identical
— the analytic store is Parquet; this codec exists for format-fidelity use
cases and as the ``mapInPandas`` custom-sink/source exemplar).

Format (SPST1):
  stream  := page*
  page    := record* padding?          (pages are PAGE_SIZE bytes, encoder
                                        state fully resets at each boundary →
                                        every page decodes independently,
                                        giving sorted-file O(log N) seeks
                                        like the reference's 4 KiB restart
                                        pages, erigon_extract.c:802-822)
  record  := OP_ADDRESS(0x01) addr20
           | OP_ACCOUNT(0x02) flags varint(block_delta)
                [varint(zigzag nonce_delta)] [varint(len) balance_trimmed]
                [varint(incarnation)] [code_hash32]
           | OP_STORAGE(0x03) flags varint(block_delta) varint(incarnation)
                slot32 [varint(len) value_trimmed]
           | OP_PAD(0x00)               (zero fill to page end)

  flags bits (account): 1=nonce delta present (absent ⇒ unchanged),
                        2=balance present (absent ⇒ zero),
                        4=incarnation present, 8=code_hash present
  flags bits (storage): 1=value present
  block_delta is vs the previous record of the SAME address (reset on
  OP_ADDRESS and page restart) — run-length address suppression + delta
  blocks, the reference's W1/W7 wins re-expressed.

Distributed contract: rows must arrive sorted by the state key within each
partition (build_state_history guarantees this); each partition encodes to
one independent blob row ``(first_address, n_rows, n_pages, blob)``, so
encode is a single ``mapInPandas`` pass and the global output is a set of
independently decodable runs — exactly how a 1000-executor job writes 100 TB
without any coordination.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PAGE_SIZE = 4096
OP_PAD, OP_ADDRESS, OP_ACCOUNT, OP_STORAGE = 0, 1, 2, 3

BLOB_SCHEMA = "first_address binary, n_rows long, n_pages long, blob binary"
ROW_SCHEMA = (
    "address binary, kind int, incarnation long, slot binary, block_from long, "
    "nonce long, balance binary, code_hash binary, value binary"
)


def _varint(v: int) -> bytes:
    if v < 0:
        raise ValueError("varint needs non-negative")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(v: int) -> int:
    return (v >> 1) if not v & 1 else -((v + 1) >> 1)


class _Encoder:
    def __init__(self) -> None:
        self.out = bytearray()
        self.addr: bytes | None = None
        self.key: tuple | None = None  # (kind, incarnation, slot) delta base
        self.block = 0
        self.nonce = 0

    def _reset_state(self) -> None:
        self.addr = None
        self.key = None
        self.block = 0
        self.nonce = 0

    def _emit(self, rec: bytes) -> None:
        """Page-restart discipline: a record never crosses a PAGE_SIZE
        boundary; pad + reset instead (every page self-describing)."""
        page_off = len(self.out) % PAGE_SIZE
        if page_off + len(rec) > PAGE_SIZE:
            self.out.extend(b"\x00" * (PAGE_SIZE - page_off))
            self._reset_state()
            raise _NeedsReplay
        self.out.extend(rec)

    def add_row(self, address, kind, incarnation, slot, block_from, nonce,
                balance, code_hash, value) -> None:
        while True:
            try:
                self._add_once(address, kind, incarnation, slot, block_from,
                               nonce, balance, code_hash, value)
                break
            except _NeedsReplay:
                continue  # state was reset at the page boundary; re-encode
        # A record that ends exactly on the page boundary starts a fresh page
        # for the next record — the decoder resets there, so must we.
        if self.out and len(self.out) % PAGE_SIZE == 0:
            self._reset_state()

    def _add_once(self, address, kind, incarnation, slot, block_from, nonce,
                  balance, code_hash, value) -> None:
        if self.addr != address:
            self._emit(bytes([OP_ADDRESS]) + address)
            self.addr = address
            self.key = None
            self.block = 0
            self.nonce = 0
        # Block-delta baseline is per version-key: accounts share one run per
        # address; each (incarnation, slot) starts a fresh run (blocks restart
        # when the slot changes within an address).
        key = ("A",) if kind == 0 else (incarnation, slot)
        base = self.block if key == self.key else 0
        delta = block_from - base
        if delta < 0:
            raise ValueError("rows must be sorted by block within key")
        if kind == 0:
            flags = 0
            body = bytearray()
            nonce = nonce or 0
            # absent nonce means "unchanged from previous record" (decoder
            # carries state), so flag on nonzero DELTA, not nonzero value
            if nonce != self.nonce:
                flags |= 1
                body += _varint(_zigzag(nonce - self.nonce))
            bal = (balance or b"").lstrip(b"\x00")
            if bal:
                flags |= 2
                body += _varint(len(bal)) + bal
            if incarnation:
                flags |= 4
                body += _varint(incarnation)
            if code_hash and code_hash.strip(b"\x00"):
                flags |= 8
                body += code_hash
            rec = bytes([OP_ACCOUNT, flags]) + _varint(delta) + bytes(body)
            self._emit(rec)
            self.nonce = nonce
            self.key = key
        else:
            flags = 0
            body = bytearray()
            val = (value or b"").lstrip(b"\x00")
            if val:
                flags |= 1
            body += _varint(incarnation) + slot
            if val:
                body += _varint(len(val)) + val
            rec = bytes([OP_STORAGE, flags]) + _varint(delta) + bytes(body)
            self._emit(rec)
            self.key = key
        self.block = block_from


class _NeedsReplay(Exception):
    pass


def encode_rows(rows) -> tuple[bytes, int, int]:
    """Encode an iterable of sorted state rows → (blob, n_rows, n_pages)."""
    enc = _Encoder()
    n = 0
    for r in rows:
        enc.add_row(*r)
        n += 1
    n_pages = (len(enc.out) + PAGE_SIZE - 1) // PAGE_SIZE
    return bytes(enc.out), n, n_pages


def decode_blob(blob: bytes) -> list[tuple]:
    """Decode a blob (or any whole-page suffix of one) back to rows."""
    rows: list[tuple] = []
    pos = 0
    addr: bytes | None = None
    key: tuple | None = None
    block = 0
    nonce = 0
    n = len(blob)
    while pos < n:
        # page boundary → full state reset (mirrors encoder)
        if pos % PAGE_SIZE == 0:
            addr, key, block, nonce = None, None, 0, 0
        op = blob[pos]
        if op == OP_PAD:
            pos = ((pos // PAGE_SIZE) + 1) * PAGE_SIZE  # skip to next page
            continue
        pos += 1
        if op == OP_ADDRESS:
            addr = blob[pos : pos + 20]
            pos += 20
            key = None
            block = 0
            nonce = 0
        elif op == OP_ACCOUNT:
            flags = blob[pos]
            pos += 1
            delta, pos = _read_varint(blob, pos)
            block = (block if key == ("A",) else 0) + delta
            key = ("A",)
            if flags & 1:
                zz, pos = _read_varint(blob, pos)
                nonce += _unzigzag(zz)
            bal = b""
            if flags & 2:
                ln, pos = _read_varint(blob, pos)
                bal = blob[pos : pos + ln]
                pos += ln
            inc = 0
            if flags & 4:
                inc, pos = _read_varint(blob, pos)
            ch = b"\x00" * 32
            if flags & 8:
                ch = blob[pos : pos + 32]
                pos += 32
            rows.append(
                (addr, 0, inc, None, block, nonce, bal.rjust(32, b"\x00"), ch, None)
            )
        elif op == OP_STORAGE:
            flags = blob[pos]
            pos += 1
            delta, pos = _read_varint(blob, pos)
            inc, pos = _read_varint(blob, pos)
            slot = blob[pos : pos + 32]
            pos += 32
            block = (block if key == (inc, slot) else 0) + delta
            key = (inc, slot)
            val = b""
            if flags & 1:
                ln, pos = _read_varint(blob, pos)
                val = blob[pos : pos + ln]
                pos += ln
            rows.append(
                (addr, 1, inc, slot, block, None, None, None, val.rjust(32, b"\x00"))
            )
        else:
            raise ValueError(f"bad opcode {op} at {pos - 1}")
    return rows


# ---------------------------------------------------------------------------
# Spark-facing operators
# ---------------------------------------------------------------------------

_COLS = ["address", "kind", "incarnation", "slot", "block_from", "nonce",
         "balance", "code_hash", "value"]


def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    enc = _Encoder()
    n = 0
    first_addr = None
    for pdf in batches:
        for r in pdf.itertuples(index=False):
            row = tuple(getattr(r, c) for c in _COLS)
            row = tuple(None if isinstance(v, float) and pd.isna(v) else v for v in row)
            if first_addr is None:
                first_addr = row[0]
            enc.add_row(
                bytes(row[0]),
                int(row[1]),
                int(row[2]) if row[2] is not None else 0,
                None if row[3] is None else bytes(row[3]),
                int(row[4]),
                None if row[5] is None else int(row[5]),
                None if row[6] is None else bytes(row[6]),
                None if row[7] is None else bytes(row[7]),
                None if row[8] is None else bytes(row[8]),
            )
            n += 1
    n_pages = (len(enc.out) + PAGE_SIZE - 1) // PAGE_SIZE
    yield pd.DataFrame(
        [(first_addr, n, n_pages, bytes(enc.out))] if n else [],
        columns=["first_address", "n_rows", "n_pages", "blob"],
    )


def encode_state_history(state_history: DataFrame) -> DataFrame:
    """Sorted state_history → one encoded blob row per partition.

    Upstream must already be range-partitioned + sorted (build_state_history
    output). No shuffle here — pure map work, embarrassingly parallel."""
    return state_history.select(*_COLS).mapInPandas(
        encode_partition, schema=BLOB_SCHEMA
    )


def decode_state_history(blobs: DataFrame) -> DataFrame:
    """Inverse of encode_state_history: blob rows → state rows."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["blob"]:
                rows = decode_blob(bytes(blob))
                yield pd.DataFrame(rows, columns=_COLS)

    return blobs.mapInPandas(dec, schema=ROW_SCHEMA)
