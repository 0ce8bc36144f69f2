"""Stage C/E equivalent: transpose block-major history to address-major
order and re-key to first-block semantics — the core semantic transform of
the reference (transpose_blockrange erigon_extract.c:2166-2264 + merge_files
2290-2469), collapsed into ONE declarative plan.

Why this shape survives 100 TB:
- The reference sorts 100k-block runs in RAM (7.5 GiB/thread, max 6
  threads, erigon_extract.c:2577-2585) then k-way merges them on a single
  thread ("cannot parallelise the merge step", 2732-2733). Here the global
  sort is ``repartitionByRange`` over the state key + per-partition sort:
  every range partition sorts AND re-keys independently, because the lag
  window only needs per-key locality and range partitioning never splits a
  key across partitions. The single-thread merge bottleneck is gone.
- AQE handles hot-address skew (a few contracts own most storage rows);
  range partitioning with sampled bounds spreads them.
- Output written sorted by the state key: Parquet row-group min/max stats
  then serve the same role as the reference's 4 KiB restartable pages
  (O(log N) point access, reference README.md:37-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erigon_extract_spark.operators.windows import rekey_first_block

KIND_ACCOUNT = 0
KIND_STORAGE = 1


def union_state_parts(
    accounts_decoded: DataFrame,
    storage_decoded: DataFrame,
    plain_state_accounts: DataFrame | None = None,
    plain_state_storage: DataFrame | None = None,
) -> DataFrame:
    """Union decoded account/storage changesets (+ optional latest-state
    snapshot) into the common pre-transpose row shape
    (address, kind, incarnation, slot, block, nonce, balance, code_hash,
    value). PlainState rows get the +1 block shift so last-block comparison
    semantics line up before re-keying (reference comment
    erigon_extract.c:2373-2387). Shared by the full build and the
    incremental-maintenance plan."""
    acct = accounts_decoded.select(
        "address",
        F.lit(KIND_ACCOUNT).alias("kind"),
        F.col("incarnation"),
        F.lit(None).cast("binary").alias("slot"),
        "block",
        "nonce",
        "balance",
        "code_hash",
        F.lit(None).cast("binary").alias("value"),
    )
    stor = storage_decoded.select(
        "address",
        F.lit(KIND_STORAGE).alias("kind"),
        F.col("incarnation"),
        "slot",
        "block",
        F.lit(None).cast("long").alias("nonce"),
        F.lit(None).cast("binary").alias("balance"),
        F.lit(None).cast("binary").alias("code_hash"),
        "value",
    )
    parts = [acct, stor]
    if plain_state_accounts is not None:
        parts.append(
            plain_state_accounts.select(
                "address",
                F.lit(KIND_ACCOUNT).alias("kind"),
                F.col("incarnation"),
                F.lit(None).cast("binary").alias("slot"),
                (F.col("block") + 1).alias("block"),  # +1 shift, c.f. 2373-2387
                "nonce",
                "balance",
                "code_hash",
                F.lit(None).cast("binary").alias("value"),
            )
        )
    if plain_state_storage is not None:
        parts.append(
            plain_state_storage.select(
                "address",
                F.lit(KIND_STORAGE).alias("kind"),
                F.col("incarnation"),
                "slot",
                (F.col("block") + 1).alias("block"),
                F.lit(None).cast("long").alias("nonce"),
                F.lit(None).cast("binary").alias("balance"),
                F.lit(None).cast("binary").alias("code_hash"),
                "value",
            )
        )

    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned


def with_version_key(df: DataFrame) -> DataFrame:
    """Add the normalized version-group incarnation column ``__key_inc``:
    incarnation is part of the version key for storage rows only — payload
    for accounts (reference comparator compare_keys_except_block,
    erigon_extract.c:2102-2129)."""
    return df.withColumn(
        "__key_inc",
        F.when(F.col("kind") == KIND_STORAGE, F.col("incarnation")).otherwise(F.lit(0)),
    )


def build_state_history(
    accounts_decoded: DataFrame,
    storage_decoded: DataFrame,
    plain_state_accounts: DataFrame | None = None,
    plain_state_storage: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Union account + storage history (+ optional latest-state snapshot),
    transpose to address-major order, re-key to first-block semantics.

    Inputs are decoded frames (see plans.extract). Returns STATE_HISTORY
    rows sorted within range partitions by
    (address, kind, incarnation, slot, block_from) — account rows sort
    before storage rows at the same address via kind 0 < 1, matching the
    reference comparator (erigon_extract.c:2110-2113).
    """
    unioned = union_state_parts(
        accounts_decoded,
        storage_decoded,
        plain_state_accounts,
        plain_state_storage,
    )

    unioned = with_version_key(unioned)

    # Transpose: one range-partitioning shuffle replaces the reference's
    # RAM-bound per-run qsort + single-threaded k-way merge. The group key
    # for re-keying is a PREFIX of the range key, so no key straddles a
    # partition boundary and the window below is shuffle-free.
    key_no_block = ["address", "kind", "__key_inc", "slot"]
    if num_partitions:
        unioned = unioned.repartitionByRange(num_partitions, *key_no_block)
    else:
        unioned = unioned.repartitionByRange(*key_no_block)

    rekeyed = rekey_first_block(
        unioned, key_no_block, block_col="block", out_col="block_from"
    )
    return (
        rekeyed.sortWithinPartitions(*key_no_block, "block_from")
        .select(
            "address",
            "kind",
            "incarnation",
            "slot",
            "block_from",
            "nonce",
            "balance",
            "code_hash",
            "value",
        )
    )
