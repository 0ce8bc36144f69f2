"""Deterministic Erigon-shaped fixture generator + pure-Python oracle.

The reference ships no tests (SURVEY.md §5); its correctness mechanisms are
runtime asserts on real chain data. This module synthesizes the FIXTURES.md
Group A tables — including every documented edge case: empty blobs, every
fieldset subset, code-hash elision with/without PlainCodeHash recovery,
balance decreases, incarnation bumps (the mainnet block 10094566
self-destruct/create/sstore anomaly, reference comment
erigon_extract.c:912-944), genesis entries, fork blocks, and
account+storage changes for one address in one block.

The companion oracle functions re-implement the decode / lookup / re-key
semantics in plain Python over small lists, so Spark pipeline tests have an
independent expected output.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from erigon_extract_spark.schemas import EMPTY_CODE_HASH, ZERO_HASH

ZERO20 = b"\x00" * 20
ZERO32 = b"\x00" * 32


def _be_trim(v: int) -> bytes:
    """Big-endian minimal-length encoding (no leading zero bytes)."""
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def encode_account_blob(
    nonce: int,
    balance: int,
    incarnation: int,
    code_hash: bytes,
    elide_code_hash: bool = False,
) -> bytes:
    """Erigon fieldset encoding (reference decode loop erigon_extract.c:199-260):
    fieldset byte, then per set bit a length byte + big-endian payload.
    Zero-valued fields are omitted (bit unset), like Erigon's encoder."""
    fieldset = 0
    body = b""
    if nonce:
        fieldset |= 1
        p = _be_trim(nonce)
        body += bytes([len(p)]) + p
    if balance:
        fieldset |= 2
        p = _be_trim(balance)
        body += bytes([len(p)]) + p
    if incarnation:
        fieldset |= 4
        p = _be_trim(incarnation)
        body += bytes([len(p)]) + p
    if code_hash != ZERO_HASH and not elide_code_hash:
        fieldset |= 8
        body += bytes([32]) + code_hash
    if fieldset == 0:
        return b""
    return bytes([fieldset]) + body


def encode_storage_blob(slot: bytes, value: bytes) -> bytes:
    """slot(32) ‖ value stripped of leading zeros (erigon_extract.c:320-349)."""
    return slot + value.lstrip(b"\x00")


def rlp_int(v: int) -> bytes:
    if v < 0x80:
        return bytes([v]) if v > 0 else b"\x80"
    p = _be_trim(v)
    return bytes([0x80 + len(p)]) + p


def rlp_body(tx_index: int, tx_amount: int, uncles: bytes) -> bytes:
    payload = rlp_int(tx_index) + rlp_int(tx_amount)
    total = len(payload) + len(uncles)
    if total < 56:
        head = bytes([0xC0 + total])
    else:
        ln = _be_trim(total)
        head = bytes([0xF7 + len(ln)]) + ln
    return head + payload + uncles


@dataclass
class AccountVersion:
    set_block: int  # block from which this value is effective
    nonce: int
    balance: int
    incarnation: int
    code_hash: bytes


@dataclass
class Fixtures:
    latest_block: int
    sync_stage: list = field(default_factory=list)
    account_changesets: list = field(default_factory=list)  # (block, address, blob)
    storage_changesets: list = field(default_factory=list)  # (block, addr, inc, blob)
    plain_state: list = field(default_factory=list)  # (key, value, block)
    plain_code_hash: list = field(default_factory=list)  # (addr, inc, code_hash)
    block_bodies: list = field(default_factory=list)  # (block, hash, body_rlp)
    block_transactions: list = field(default_factory=list)  # (tx_id, tx_rlp)
    # truth for oracle
    account_timelines: dict = field(default_factory=dict)  # addr -> [AccountVersion]
    storage_timelines: dict = field(default_factory=dict)  # (addr,inc,slot) -> [(blk, val)]


def generate(
    seed: int = 42,
    n_addresses: int = 40,
    n_blocks: int = 2000,
    n_body_blocks: int = 200,
    hot_addresses: int = 2,
) -> Fixtures:
    rng = random.Random(seed)
    latest = n_blocks
    fx = Fixtures(latest_block=latest)
    fx.sync_stage.append(("Execution", latest))
    fx.sync_stage.append(("Bodies", latest))

    addresses = [rng.randbytes(20) for _ in range(n_addresses)]
    code_hash_map: dict[tuple[bytes, int], bytes] = {}

    def rand_hash() -> bytes:
        h = rng.randbytes(32)
        while h in (ZERO_HASH, EMPTY_CODE_HASH):
            h = rng.randbytes(32)
        return h

    for i, addr in enumerate(addresses):
        is_contract = i % 3 == 0
        genesis_alloc = i % 7 == 0
        n_changes = rng.randint(1, 8) + (20 if i < hot_addresses else 0)
        blocks = sorted(rng.sample(range(1, latest + 1), n_changes))
        if genesis_alloc:
            blocks = [0] + blocks
        versions: list[AccountVersion] = []
        nonce, balance, inc, ch = 0, 0, 0, ZERO_HASH
        for b in blocks:
            nonce += rng.randint(0, 3)
            # balance moves both directions (delta sign-invert path,
            # erigon_extract.c:892-896), occasionally needing full 32 bytes
            if rng.random() < 0.1:
                balance = rng.getrandbits(255)
            else:
                balance = max(0, balance + rng.randint(-(10**18), 2 * 10**18))
            if is_contract and (inc == 0 or rng.random() < 0.15):
                inc += 1  # create / self-destruct+create (block 10094566 case)
                ch = rand_hash()
                code_hash_map[(addr, inc)] = ch
            versions.append(AccountVersion(b, nonce, balance, inc, ch))
        fx.account_timelines[addr] = versions

        # changeset rows: pre-state before each change block
        prev = AccountVersion(0, 0, 0, 0, ZERO_HASH)
        for v in versions:
            # elide code hash from blob ~half the time when recoverable
            elide = prev.incarnation > 0 and rng.random() < 0.5
            blob = encode_account_blob(
                prev.nonce, prev.balance, prev.incarnation, prev.code_hash, elide
            )
            fx.account_changesets.append((v.set_block, addr, blob))
            prev = v
        last = versions[-1]
        fx.plain_state.append(
            (
                addr,
                encode_account_blob(
                    last.nonce, last.balance, last.incarnation, last.code_hash,
                    elide_code_hash=last.incarnation > 0 and rng.random() < 0.5,
                ),
                latest,
            )
        )

        if is_contract:
            n_slots = rng.randint(1, 4) + (30 if i < hot_addresses else 0)
            for s in range(n_slots):
                slot = rng.randbytes(32)
                # storage exists per incarnation; pick the incarnations alive
                for v_inc in sorted({v.incarnation for v in versions if v.incarnation}):
                    first_blk = min(
                        v.set_block for v in versions if v.incarnation == v_inc
                    )
                    n_writes = rng.randint(1, 3)
                    wblocks = sorted(
                        rng.sample(range(max(1, first_blk), latest + 1),
                                   min(n_writes, latest + 1 - max(1, first_blk)))
                    )
                    vals: list[tuple[int, bytes]] = []
                    cur = ZERO32
                    for wb in wblocks:
                        # values with leading zeros (trim path) and with the
                        # high bit set (invert path, erigon_extract.c:1244-1247)
                        nv = (
                            (b"\x00" * rng.randint(0, 28)) + rng.randbytes(4)
                            if rng.random() < 0.5
                            else (b"\xff" + rng.randbytes(31))
                        )
                        nv = nv[-32:].rjust(32, b"\x00")
                        fx.storage_changesets.append(
                            (wb, addr, v_inc, encode_storage_blob(slot, cur))
                        )
                        vals.append((wb, nv))
                        cur = nv
                    if not vals:
                        continue
                    key = (addr, v_inc, slot)
                    fx.storage_timelines[key] = vals
                    if v_inc == last.incarnation and cur != ZERO32:
                        fx.plain_state.append(
                            (
                                addr + v_inc.to_bytes(8, "big"),
                                encode_storage_blob(slot, cur),
                                latest,
                            )
                        )

    for (addr, inc), ch in code_hash_map.items():
        fx.plain_code_hash.append((addr, inc, ch))

    # block bodies + transactions: contiguous tx ids, fork duplicates
    tx_id = 0
    for b in range(1, n_body_blocks + 1):
        tx_amount = rng.randint(0, 5)
        uncles = rng.randbytes(rng.randint(0, 8))
        body = rlp_body(tx_id, tx_amount, uncles)
        fx.block_bodies.append((b, rng.randbytes(32), body))
        if rng.random() < 0.05:  # fork duplicate with different hash, same span
            fx.block_bodies.append((b, rng.randbytes(32), body))
        for t in range(tx_amount):
            fx.block_transactions.append((tx_id + t, rng.randbytes(rng.randint(1, 64))))
        tx_id += tx_amount
    return fx


# ---------------------------------------------------------------------------
# Pure-Python oracle: expected state_history via the reference merge semantics
# ---------------------------------------------------------------------------

def expected_state_history(fx: Fixtures) -> list[tuple]:
    """Apply decode + code-hash recovery + plain-state +1 shift + first-block
    re-keying (reference merge loop erigon_extract.c:2358-2433) in plain
    Python. Returns rows shaped like schemas.STATE_HISTORY, sorted."""
    lookup = {(a, i): ch for a, i, ch in fx.plain_code_hash}

    def recover(addr: bytes, nonce, bal, inc, ch):
        if ch in (ZERO_HASH, EMPTY_CODE_HASH) and inc != 0:
            ch = lookup.get((addr, inc), ch)
        if ch == EMPTY_CODE_HASH:
            ch = ZERO_HASH
        return nonce, bal, inc, ch

    # Gather merge-input rows: (sort key..., block, payload)
    items: list[tuple] = []
    prevs: dict[bytes, AccountVersion] = {}
    for addr, versions in fx.account_timelines.items():
        prev = AccountVersion(0, 0, 0, 0, ZERO_HASH)
        for v in versions:
            n, b, i, c = recover(addr, prev.nonce, prev.balance, prev.incarnation,
                                 prev.code_hash)
            items.append((addr, 0, i, None, v.set_block, n, b, c, None))
            prev = v
        n, b, i, c = recover(addr, prev.nonce, prev.balance, prev.incarnation,
                             prev.code_hash)
        items.append((addr, 0, i, None, fx.latest_block + 1, n, b, c, None))
        prevs[addr] = prev
    for (addr, inc, slot), writes in fx.storage_timelines.items():
        cur = ZERO32
        for wb, nv in writes:
            items.append((addr, 1, inc, slot, wb, None, None, None, cur))
            cur = nv
        if inc == prevs[addr].incarnation and cur != ZERO32:
            items.append((addr, 1, inc, slot, fx.latest_block + 1, None, None, None, cur))

    # Sort by full key; group key excludes block. Account rows key on address
    # only (incarnation is payload); storage keys include incarnation+slot —
    # reference comparator erigon_extract.c:2102-2129.
    def key_inc(row):
        kind, inc = row[1], row[2]
        return inc if kind == 1 else 0

    def sort_key(row):
        addr, kind, slot, block = row[0], row[1], row[3], row[4]
        return (addr, kind, key_inc(row), slot or b"", block)

    items.sort(key=sort_key)
    out = []
    prev_key = None
    next_block_change = 0
    for row in items:
        addr, kind, slot, block = row[0], row[1], row[3], row[4]
        inc = row[2]
        key = (addr, kind, key_inc(row), slot)
        adjusted = 0 if key != prev_key else next_block_change
        prev_key = key
        next_block_change = block
        if adjusted >= block and adjusted == 0:
            continue  # genesis entry
        out.append((addr, kind, inc, slot, adjusted) + row[5:])
    # expected balances as 32-byte binaries
    final = []
    for r in out:
        bal = r[6]
        final.append(
            r[:6] + (None if bal is None else int(bal).to_bytes(32, "big"),) + r[7:]
        )
    return final


def account_snapshot_rows(fx: Fixtures, at_block: int) -> list[tuple]:
    """Decoded-frame-shaped account snapshot (PlainState equivalent) at
    ``at_block``: (block, address, nonce, balance32, incarnation, code_hash)
    — values byte-identical to decode+recover output."""
    rows = []
    for addr, versions in fx.account_timelines.items():
        alive = [v for v in versions if v.set_block <= at_block]
        if not alive:
            continue
        v = alive[-1]
        rows.append(
            (
                at_block,
                addr,
                v.nonce,
                int(v.balance).to_bytes(32, "big"),
                v.incarnation,
                v.code_hash,
            )
        )
    return rows


def storage_snapshot_rows(fx: Fixtures, at_block: int) -> list[tuple]:
    """Nonzero storage values at ``at_block`` per (addr, inc, slot):
    (block, address, incarnation, slot, value)."""
    rows = []
    for (addr, inc, slot), writes in fx.storage_timelines.items():
        cur = None
        for wb, nv in writes:
            if wb <= at_block:
                cur = nv
        if cur is not None and cur != ZERO32:
            rows.append((at_block, addr, inc, slot, cur))
    return rows


def account_state_at_oracle(fx: Fixtures, block: int) -> dict[bytes, AccountVersion]:
    """Ground truth account state as of ``block`` from the timelines."""
    out = {}
    for addr, versions in fx.account_timelines.items():
        eligible = [v for v in versions if v.set_block <= block]
        if eligible:
            out[addr] = eligible[-1]
    return out


def realistic_state_history_rows(n_addrs: int = 150, seed: int = 7) -> list[tuple]:
    """State history with real-data-shaped redundancy, for compression
    measurement: per-address runs of versions, small block gaps,
    incrementing nonces, near-constant balances, storage values with few
    significant bytes. Rows are shaped like schemas.STATE_HISTORY. Shared
    by tests/test_compression.py and tools/measure_compression.py so the
    committed ratio and the regression guard measure the same corpus."""
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n_addrs):
        addr = rng.randbytes(20)
        code_hash = rng.randbytes(32) if rng.random() < 0.3 else b"\x00" * 32
        block, nonce, bal = 0, 0, rng.randint(0, 10**12)
        for _ in range(rng.randint(5, 60)):
            block += rng.randint(1, 300)
            nonce += rng.randint(0, 2)
            bal = max(0, bal + rng.randint(-(10**9), 10**9))
            out.append(
                (addr, 0, 1, None, block,
                 nonce, bal.to_bytes(32, "big"), code_hash, None)
            )
        for _ in range(rng.randint(0, 3)):
            slot = rng.randint(0, 50).to_bytes(32, "big")
            block = 0
            for _ in range(rng.randint(1, 20)):
                block += rng.randint(1, 500)
                val = rng.randint(0, 10**9).to_bytes(32, "big")
                out.append((addr, 1, 1, slot, block, None, None, None, val))
    return out
