"""Incremental state-history maintenance — append-only updates to the
sorted state_history store.

The reference is strictly batch: one snapshot txn, full rebuild every run
(erigon_extract.c:2708-2713); its README only *aspires* to in-place update
(reference README.md:52-56, "can be updated in place"). This module makes
the aspiration real, and the math says the update is APPEND-ONLY:

Let a key's old changeset blocks be L1 < … < Lm (≤ old tip T) and the new
batch's blocks B1 < … < Bk (in (T, T']). First-block re-keying assigns each
row the PREVIOUS row's block, so a full rebuild at T' produces

    …, (L(m-1), v@Lm), (Lm, v@B1), (B1, v@B2), …, (B(k-1), v@Bk), (Bk, latest)

The seam row (Lm, v@B1) is exactly the old store's open row: the changeset
at B1 carries the value *before* B1, which is the value the old snapshot
held at T. Every row of the old store is reproduced verbatim; the delta is
the tail (B1, v@B2) … (Bk, latest). So incremental maintenance is:

  1. lag-rekey WITHIN the new batch only (changesets + new snapshot rows),
  2. drop each existing key's first batch row (it re-derives the old open
     row — and `seam_violations` checks it actually matches: a mismatch
     means the batch doesn't continue the store it's being applied to),
  3. keep first rows of brand-new keys with block_from = 0 (reference
     genesis semantics, erigon_extract.c:2409-2419).

Prefix-consistency requires the store to carry explicit ZERO versions for
keys deleted at snapshot time (absent from PlainState = value zero). A
store built without them can't recover "the value was zero from Lm until
B1" when the key is later re-created, because Lm is recorded nowhere.
``zero_tombstones`` synthesizes those snapshot rows; build the base store
and every increment with them. Queries are unaffected — a zero version
means "not present", which is also what absence meant.

Scale (100 TB): the window runs over the BATCH only (90k blocks of
changesets, not the archive); the store is touched by (a) the existing-key
anti-join — pass ``old_keys`` (the latest-state/key side table you already
maintain for PlainState, bucketed by address) so it's a co-located join
instead of a full-store distinct — and (b) the append itself, which is a
new sorted Parquet segment per increment; periodic ``apply_increment``
rewrites (compacts) the affected address ranges only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erigon_extract_spark.plans.transpose import (
    KIND_STORAGE,
    union_state_parts,
    with_version_key,
)

VERSION_KEY = ["address", "kind", "__key_inc", "slot"]
HISTORY_COLS = [
    "address",
    "kind",
    "incarnation",
    "slot",
    "block_from",
    "nonce",
    "balance",
    "code_hash",
    "value",
]

_ZERO32 = bytes(32)


def zero_tombstones(
    storage_decoded: DataFrame,
    plain_state_storage: DataFrame | None,
    snapshot_block: int,
) -> DataFrame:
    """Synthetic snapshot rows (value = 32 zero bytes) for storage keys that
    appear in the changesets but not in PlainState — i.e. keys whose value
    at the snapshot is zero (deleted). Shaped like decoded plain-state
    storage rows; append to ``plain_state_storage`` before building.

    PlainState omits zero values (reference stores no explicit deletes), so
    without these rows the store loses the block at which the key zeroed
    once the key is later re-created."""
    keys = storage_decoded.select("address", "incarnation", "slot").distinct()
    if plain_state_storage is not None:
        keys = keys.join(
            plain_state_storage.select("address", "incarnation", "slot"),
            ["address", "incarnation", "slot"],
            "left_anti",
        )
    return keys.select(
        "address",
        "incarnation",
        "slot",
        F.lit(snapshot_block).cast("long").alias("block"),
        F.lit(_ZERO32).alias("value"),
        F.lit(None).cast("string").alias("decode_error"),
    ).drop("decode_error")


def incremental_history_delta(
    old_history: DataFrame,
    new_accounts: DataFrame,
    new_storage: DataFrame,
    new_plain_accounts: DataFrame | None = None,
    new_plain_storage: DataFrame | None = None,
    old_keys: DataFrame | None = None,
) -> DataFrame:
    """Rows to APPEND to ``old_history`` so that it equals a full rebuild
    over (old inputs ∪ new batch). Inputs are decoded frames for the blocks
    in (old tip, new tip] plus the new-tip snapshot (restricted internally
    to keys the batch touches).

    ``old_keys``: optional (address, kind, incarnation, slot) frame of keys
    present in the store — pass the maintained latest-state table at scale;
    defaults to a distinct over ``old_history``."""
    if new_plain_accounts is not None:
        new_plain_accounts = new_plain_accounts.join(
            new_accounts.select("address").distinct(), "address", "left_semi"
        )
    if new_plain_storage is not None:
        new_plain_storage = new_plain_storage.join(
            new_storage.select("address", "incarnation", "slot").distinct(),
            ["address", "incarnation", "slot"],
            "left_semi",
        )
    batch = with_version_key(
        union_state_parts(
            new_accounts, new_storage, new_plain_accounts, new_plain_storage
        )
    )

    # Re-key within the batch: lag with NO default → the first row of each
    # key surfaces as block_from IS NULL (the seam).
    w = Window.partitionBy(*VERSION_KEY).orderBy(F.col("block").asc())
    rekeyed = batch.withColumn("block_from", F.lag("block", 1).over(w))
    closed = rekeyed.filter(F.col("block_from").isNotNull())
    seam = rekeyed.filter(F.col("block_from").isNull())

    if old_keys is None:
        old_keys = old_history.select(
            "address", "kind", "incarnation", "slot"
        ).distinct()
    old_keys = with_version_key(old_keys).select(*VERSION_KEY).alias("ok")

    # Brand-new keys: keep the seam row with genesis semantics (block_from
    # 0; drop pure genesis rows, reference P7 erigon_extract.c:2421-2426).
    # slot is NULL on account rows — the key match must be null-safe.
    seam = seam.alias("sm")
    cond = None
    for c in VERSION_KEY:
        eq = F.col(f"sm.{c}").eqNullSafe(F.col(f"ok.{c}"))
        cond = eq if cond is None else (cond & eq)
    new_key_rows = (
        seam.join(old_keys, cond, "left_anti")
        .withColumn("block_from", F.lit(0).cast("long"))
        .filter(~((F.col("block_from") == 0) & (F.col("block") == 0)))
    )

    return closed.unionByName(new_key_rows).select(*HISTORY_COLS)


def derive_snapshot_at(
    acct_decoded: DataFrame,
    stor_decoded: DataFrame,
    tip_accounts: DataFrame,
    tip_storage: DataFrame,
    at_block: int,
    touched_accounts: DataFrame,
    touched_storage: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Reconstruct the PlainState-equivalent snapshot at ``at_block`` from
    the CHANGESET STREAM plus one tip snapshot — no archive read, no
    snapshot file at ``at_block`` required. This is what lets increments
    chain: each batch's boundary snapshot is derived, so the maintainer
    only ever holds the changeset feed and the current tip.

    The algebra: a changeset at block b carries the value BEFORE b, so a
    key's state at ``at_block`` is the before-value of its FIRST changeset
    after ``at_block``; a key with no later changeset is unchanged since,
    so the tip value applies; a storage key with neither (zero at tip, no
    later write) was zeroed at or before ``at_block`` — the zero32 fill is
    its tombstone (the same rows ``zero_tombstones`` synthesizes).

    ``touched_*`` restrict the output to the batch's keys (all an
    increment needs — ``incremental_history_delta`` left-semi's anyway).
    Accounts with neither a later changeset nor a tip row are absent from
    state at ``at_block`` and are dropped, mirroring PlainState omission.

    Scale: two batch-bounded window rank-1 scans + broadcast-sized joins
    against the touched-key set; the archive is never read.
    """
    wa = Window.partitionBy("address").orderBy(F.col("block").asc())
    first_a = (
        acct_decoded.filter(F.col("block") > at_block)
        .withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .select(
            "address",
            F.col("nonce").alias("__fn"),
            F.col("balance").alias("__fb"),
            F.col("incarnation").alias("__fi"),
            F.col("code_hash").alias("__fc"),
        )
    )
    tip_a = tip_accounts.select(
        "address",
        F.col("nonce").alias("__tn"),
        F.col("balance").alias("__tb"),
        F.col("incarnation").alias("__ti"),
        F.col("code_hash").alias("__tc"),
    )
    psa = (
        touched_accounts.select("address")
        .distinct()
        .join(first_a, "address", "left")
        .join(tip_a, "address", "left")
        .filter(F.col("__fb").isNotNull() | F.col("__tb").isNotNull())
        .select(
            F.lit(at_block).cast("long").alias("block"),
            "address",
            F.coalesce("__fn", "__tn").alias("nonce"),
            F.coalesce("__fb", "__tb").alias("balance"),
            F.coalesce("__fi", "__ti").alias("incarnation"),
            F.coalesce("__fc", "__tc").alias("code_hash"),
        )
    )

    skey = ["address", "incarnation", "slot"]
    ws = Window.partitionBy(*skey).orderBy(F.col("block").asc())
    first_s = (
        stor_decoded.filter(F.col("block") > at_block)
        .withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") == 1)
        .select(*skey, F.col("value").alias("__fv"))
    )
    tip_s = tip_storage.select(*skey, F.col("value").alias("__tv"))
    pss = (
        touched_storage.select(*skey)
        .distinct()
        .join(first_s, skey, "left")
        .join(tip_s, skey, "left")
        .select(
            F.lit(at_block).cast("long").alias("block"),
            *skey,
            F.coalesce("__fv", "__tv", F.lit(_ZERO32)).alias("value"),
        )
    )
    return psa, pss


def seam_violations(
    old_history: DataFrame,
    new_accounts: DataFrame,
    new_storage: DataFrame,
) -> DataFrame:
    """Consistency check for an increment: the first batch changeset row per
    key carries the value *before* its block, which must equal the old
    store's open (latest) version of that key. Non-empty result = the batch
    does not continue this store (gap or wrong base) — refuse the append.
    Analogous to the reference's monotonic re-key warning
    (erigon_extract.c:2421-2433) but across the batch seam."""
    batch = with_version_key(union_state_parts(new_accounts, new_storage))
    w = Window.partitionBy(*VERSION_KEY).orderBy(F.col("block").asc())
    first = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *VERSION_KEY,
            F.col("nonce").alias("b_nonce"),
            F.col("balance").alias("b_balance"),
            F.col("code_hash").alias("b_code_hash"),
            F.col("value").alias("b_value"),
        )
    )
    wl = Window.partitionBy(*VERSION_KEY).orderBy(F.col("block_from").desc())
    latest = (
        with_version_key(old_history)
        .withColumn("__rn", F.row_number().over(wl))
        .filter(F.col("__rn") == 1)
        .select(*VERSION_KEY, "nonce", "balance", "code_hash", "value")
    )
    # null-safe key match: slot is NULL on account rows
    first = first.alias("fb")
    latest = latest.alias("ol")
    cond = None
    for c in VERSION_KEY:
        eq = F.col(f"fb.{c}").eqNullSafe(F.col(f"ol.{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = first.join(latest, cond, "inner")
    neq = lambda a, b: ~(F.col(a).eqNullSafe(F.col(b)))  # noqa: E731
    return joined.filter(
        neq("b_nonce", "nonce")
        | neq("b_balance", "balance")
        | neq("b_code_hash", "code_hash")
        | neq("b_value", "value")
    )


def apply_increment(
    old_history: DataFrame,
    delta: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """Compacted view: old store ∪ appended rows, restored to the global
    sort order of the store (repartitionByRange + in-partition sort — the
    same one-shuffle shape as the full build). In steady state run this
    periodically; between compactions readers union the sorted base with
    the small sorted increments (both prune on column stats)."""
    merged = old_history.select(*HISTORY_COLS).unionByName(
        delta.select(*HISTORY_COLS)
    )
    merged = with_version_key(merged)
    if num_partitions:
        merged = merged.repartitionByRange(num_partitions, *VERSION_KEY)
    else:
        merged = merged.repartitionByRange(*VERSION_KEY)
    return merged.sortWithinPartitions(*VERSION_KEY, "block_from").select(
        *HISTORY_COLS
    )
