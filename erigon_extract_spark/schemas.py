"""Explicit StructType schemas for the engine's tables.

The reference's schemas are implicit C struct layouts with hand-written
key/value length validation (erigon_extract.c:1561-1576, 1703-1726,
1840-1846). Here they are explicit, enforced at read time.

Type mapping (SURVEY.md §1.2): 20/32-byte binaries stay BinaryType
(compare unsigned-lexicographic, identical to the reference's memcmp);
block numbers / nonces / incarnations are LongType; 256-bit balances and
storage values stay 32-byte BinaryType with u256 UDF arithmetic
(DecimalType caps at 38 digits < the 78 needed).
"""

from __future__ import annotations

from pyspark.sql import types as T

ADDRESS_LEN = 20  # erigon_extract.c:165
HASH_LEN = 32

# keccak256 of empty code — accounts carrying it are normalized to zeros on
# write (erigon_extract.c:173-179, 832-838).
EMPTY_CODE_HASH = bytes.fromhex(
    "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
)
ZERO_HASH = b"\x00" * 32
ZERO_BALANCE = b"\x00" * 32

# ---------------------------------------------------------------------------
# Raw source tables (mirror the reference's seven MDBX tables, FIXTURES.md A1-A7)
# ---------------------------------------------------------------------------

SYNC_STAGE = T.StructType(
    [
        T.StructField("stage_name", T.StringType(), False),
        T.StructField("block", T.LongType(), False),
    ]
)

ACCOUNT_CHANGESETS = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("address", T.BinaryType(), False),
        T.StructField("account_blob", T.BinaryType(), False),
    ]
)

STORAGE_CHANGESETS = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("address", T.BinaryType(), False),
        T.StructField("incarnation", T.LongType(), False),
        T.StructField("storage_blob", T.BinaryType(), False),
    ]
)

PLAIN_STATE = T.StructType(
    [
        T.StructField("key", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("block", T.LongType(), False),
    ]
)

PLAIN_CODE_HASH = T.StructType(
    [
        T.StructField("address", T.BinaryType(), False),
        T.StructField("incarnation", T.LongType(), False),
        T.StructField("code_hash", T.BinaryType(), False),
    ]
)

BLOCK_BODIES = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("block_hash", T.BinaryType(), False),
        T.StructField("body_rlp", T.BinaryType(), False),
    ]
)

BLOCK_TRANSACTIONS = T.StructType(
    [
        T.StructField("tx_id", T.LongType(), False),
        T.StructField("tx_rlp", T.BinaryType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Decoded / derived tables (FIXTURES.md A8)
# ---------------------------------------------------------------------------

ACCOUNTS_DECODED = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("address", T.BinaryType(), False),
        T.StructField("nonce", T.LongType(), False),
        T.StructField("balance", T.BinaryType(), False),  # 32-byte BE u256
        T.StructField("incarnation", T.LongType(), False),
        T.StructField("code_hash", T.BinaryType(), False),
    ]
)

STORAGE_DECODED = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("address", T.BinaryType(), False),
        T.StructField("incarnation", T.LongType(), False),
        T.StructField("slot", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), False),  # 32-byte, left-zero-padded
    ]
)

# Unified state-history rows after transpose + first-block re-keying.
# kind: 0 = account, 1 = storage (account sorts before storage at the same
# address — reference comparator erigon_extract.c:2110-2113).
STATE_HISTORY = T.StructType(
    [
        T.StructField("address", T.BinaryType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("incarnation", T.LongType(), False),
        T.StructField("slot", T.BinaryType(), True),  # null for accounts
        T.StructField("block_from", T.LongType(), False),
        T.StructField("nonce", T.LongType(), True),
        T.StructField("balance", T.BinaryType(), True),
        T.StructField("code_hash", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
    ]
)

STATE_HISTORY_KEY = ["address", "kind", "incarnation", "slot", "block_from"]

TX_BODIES_OUT = T.StructType(
    [
        T.StructField("block", T.LongType(), False),
        T.StructField("tx_amount", T.LongType(), False),
        T.StructField("uncles", T.BinaryType(), True),
        T.StructField("txs", T.ArrayType(T.BinaryType()), True),
    ]
)

GENERIC_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
