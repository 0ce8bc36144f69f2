"""Deterministic, oracle-gateable Lloyd k-means over an embedding column.

Why this exists next to ``pyspark.ml.clustering.KMeans`` (already used as
an internal trainer by the PQ/IVF operators in ``operators/similarity.py``):
MLlib's KMeans is seeded but NOT reproducible across engines — k-means||
init, sampling, and float reduction order are implementation details, so
its output cannot be put under the DuckDB value-hash gate. Corpus-curation
pipelines use k-means directly (topic bucketing, cluster-balanced
sampling, SemDeDup's cluster stage), so the clustering itself deserves a
gate, not just operators built on top of it.

This module implements textbook Lloyd iterations with every source of
cross-engine nondeterminism pinned:

- **init**: the k vectors with the smallest ids, elementwise-rounded to
  6 dp (no sampling, no RNG);
- **assignment**: squared L2 distance quantized to 9 dp before the
  argmin, ties broken by smallest centroid id (the same
  quantize-before-argmax trick the MMR rerank uses — float sums of 64
  products differ between numpy's pairwise summation and a SQL fold in
  the last ulp, ~1e-14, far below the 0.5e-9 quantization grid). The
  quantizer is ``oracle_compat.np_round_half_away`` — DuckDB ROUND
  semantics, NOT np.round: half-even vs half-away genuinely split the
  argmin winner on values that land exactly on the grid line
  (constructible from coarse-decimal embeddings; see
  tests/test_tie_semantics.py), so both engines must share the rule;
- **update**: new centroid = elementwise mean rounded to 6 dp with the
  same half-away rule (mean error from summation order is ~1e-13 for
  1e6 members, far below the 0.5e-6 grid), an empty cluster keeps its
  previous centroid;
- state is re-quantized every iteration, so the two engines can never
  drift apart between steps.

Scale shape (the part that matters at 100 TB): each iteration is ONE
map-only pass — ``mapInPandas`` emits per-Arrow-batch partial sums
(cluster id, member count, elementwise sum), so the rows crossing the
wire per iteration number k x n_batches, not N. Those partials are
reduced on the driver (bounded by k x n_batches, the same documented
bounded-collect precedent as the BPE trainer's per-round argmax); no
shuffle of the corpus ever happens. This is the DataFrame rendering of
MLlib's own ``treeAggregate`` pattern. Iterations are a fixed small
constant. The final assignment is one more map-only pass.
"""
from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from erigon_extract_spark.oracle_compat import np_round_half_away


def _partial_sums_pass(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
) -> List[Tuple[int, int, np.ndarray]]:
    """One assignment pass returning per-cluster (cid, count, sumvec),
    reduced from per-batch partials. Distances are quantized to 9 dp
    with DuckDB ROUND (half-away) semantics before the argmin;
    ``np.argmin`` takes the first minimum, i.e. the smallest centroid
    id — matching the oracle's ``ORDER BY round(dist, 9), cid``
    row_number rule-for-rule."""
    k, d = centroids.shape
    cent = centroids  # captured; tiny (k x d), rides the task closure

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # squared L2 to every centroid, quantized before argmin
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(np_round_half_away(d2, 9), axis=1)
            rows = []
            for cid in np.unique(assign):
                sel = x[assign == cid]
                rows.append(
                    (int(cid), int(len(sel)),
                     [float(s) for s in sel.sum(axis=0)])
                )
            yield pd.DataFrame(rows, columns=["cid", "cnt", "sums"])

    partials = df.select(id_col, vec_col).mapInPandas(
        emit, schema="cid int, cnt long, sums array<double>"
    ).collect()  # bounded: k x n_arrow_batches rows, never N
    return [(r.cid, r.cnt, np.asarray(r.sums, dtype=np.float64))
            for r in partials]


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = False,
) -> Tuple[DataFrame, List[List[float]]]:
    """Deterministic Lloyd k-means. Returns ``(assignments, centroids)``:
    assignments is a DataFrame ``(id_col, cid int)`` from a final
    assignment pass against the post-iteration centroids; centroids is
    the plain-python k x d list (each element already 6-dp rounded).

    Semantics, shared exactly with the SQL oracle: init = k smallest-id
    vectors rounded to 6 dp; ``iters`` x (assign with 9-dp-quantized
    squared-L2 argmin, smallest-cid ties; update = 6-dp-rounded
    elementwise mean, empty cluster keeps its centroid); then one final
    assignment against the settled centroids.

    The lifecycle reads the corpus ``iters + 2`` times (init sort,
    one map-only pass per iteration, final assignment). At bench scale
    that is noise; at 100 TB the repeated scans ARE the dominant cost,
    so ``persist=True`` caches the projected ``(id, vector)`` frame
    (MEMORY_AND_DISK) for the init + iteration passes and unpersists
    before returning — the source is then read ~twice (once filling the
    cache, once by the caller evaluating the returned lazy assignment)
    regardless of ``iters``; tests/test_clustering.py counts the scans
    with an accumulator below the cache. Callers that already hold a
    cached frame should pass it directly and leave ``persist=False``
    (the pass never shuffles the corpus either way, so the persist is
    purely a scan-count lever, not a correctness one).
    """
    src = df.select(id_col, vec_col)
    if persist:
        from pyspark import StorageLevel

        src = src.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _kmeans_lloyd_impl(df, src, k, iters, id_col, vec_col)
    finally:
        if persist:
            src.unpersist(blocking=False)


def _kmeans_lloyd_impl(
    df: DataFrame,
    src: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> Tuple[DataFrame, List[List[float]]]:
    init_rows = (
        src.orderBy(id_col).limit(k).collect()
    )  # bounded: k rows
    if not init_rows:
        # empty input: an empty assignment table (same schema) and no
        # centroids — not a numpy shape error three calls deep
        id_type = dict(df.dtypes)[id_col]
        empty = df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cid int"
        )
        return empty, []
    cent = np_round_half_away(
        np.asarray([np.asarray(r[1], dtype=np.float64) for r in init_rows]),
        6,
    )
    kk = cent.shape[0]

    for _ in range(iters):
        partials = _partial_sums_pass(src, cent, id_col, vec_col)
        sums = np.zeros_like(cent)
        cnts = np.zeros(kk, dtype=np.int64)
        for cid, cnt, s in partials:
            sums[cid] += s
            cnts[cid] += cnt
        new = cent.copy()  # empty cluster keeps its previous centroid
        nz = cnts > 0
        new[nz] = np_round_half_away(sums[nz] / cnts[nz, None], 6)
        cent = new

    centroids = [[float(x) for x in c] for c in cent]
    return kmeans_assign(df, centroids, id_col=id_col, vec_col=vec_col), \
        centroids


def kmeans_assign(
    df: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign vectors to FIXED centroids — the production shape of
    k-means at 100 TB: train once (``kmeans_lloyd``, or load a persisted
    centroid sidecar), then assign every new batch without ever touching
    the training corpus again. Stateless map-only pass (broadcastable
    k x d closure, zero Exchange), so it composes with ``readStream``
    unchanged — the same batch==stream contract as the CDC chunker.
    Same pinned semantics as the training iterations: 9-dp-quantized
    squared L2, argmin with smallest-cid ties."""
    if not centroids:
        # the train-once/assign-forever path can feed an empty centroid
        # list (kmeans_lloyd on an empty training subset); mirror its
        # empty-input contract instead of a numpy broadcast error.
        # Derive the empty frame FROM df (not createDataFrame) so a
        # streaming input stays streaming — the readStream composability
        # contract in the docstring holds for this edge too.
        return df.select(
            F.col(id_col), F.lit(0).cast("int").alias("cid")
        ).where(F.lit(False))
    id_type = dict(df.dtypes)[id_col]
    final = np.asarray(centroids, dtype=np.float64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = ((x[:, None, :] - final[None, :, :]) ** 2).sum(axis=2)
            cid = np.argmin(np_round_half_away(d2, 9), axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "cid": cid.astype(np.int32),
            })

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {id_type}, cid int"
    )


def kmeans_summary(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = False,
) -> DataFrame:
    """Per-cluster signature of a ``kmeans_lloyd`` fit: member count plus
    two scalar centroid checksums (elementwise sum and L2 norm, both
    6-dp rounded — scalars, not arrays, so the value hash is
    format-independent). Clusters that end up empty still appear with
    n = 0: the summary is driven from the centroid table, LEFT-joined
    with the counts, exactly as the oracle does. ``persist`` passes
    through to :func:`kmeans_lloyd` (the iters+2 scan-count lever)."""
    assignments, cent = kmeans_lloyd(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        persist=persist,
    )
    spark = df.sparkSession
    c = np.asarray(cent, dtype=np.float64)
    cent_rows = [
        (
            i,
            float(np_round_half_away(np.sum(c[i]), 6)),
            float(np_round_half_away(np.sqrt(np.sum(c[i] * c[i])), 6)),
        )
        for i in range(c.shape[0])
    ]
    cent_df = spark.createDataFrame(
        cent_rows, "cid int, cent_sum double, cent_norm double"
    )
    counts = assignments.groupBy("cid").agg(F.count("*").alias("n"))
    return (
        cent_df.join(F.broadcast(counts), "cid", "left")
        .select(
            "cid",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "cent_sum",
            "cent_norm",
        )
    )


# --------------------------------------------------------------------------
# Persisted model lifecycle (cli cluster-build / cluster-assign)
# --------------------------------------------------------------------------

_KMEANS_META = "_kmeans_meta.json"


def build_kmeans_model(
    df: DataFrame,
    out_dir: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> List[List[float]]:
    """Train-once half of the production lifecycle: fit the
    deterministic Lloyd k-means, write the full assignment table as
    Parquet under ``out_dir`` and the frozen centroids (plus the column
    contract) into a ``_kmeans_meta.json`` sidecar — the same
    sidecar-next-to-data pattern as the IVFPQ index
    (operators/similarity.build_ivfpq_index), so `cluster-assign` can
    label every future batch without touching the training corpus.
    Returns the centroids. ``persist`` defaults True here (the CLI is
    the at-scale entry point; the scan-count rationale is in
    :func:`kmeans_lloyd`)."""
    import json
    import os

    assignments, centroids = kmeans_lloyd(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        persist=persist,
    )
    assignments.write.mode("overwrite").parquet(out_dir)
    with open(os.path.join(out_dir, _KMEANS_META), "w") as fh:
        json.dump(
            {
                # actual centroid count — kmeans_lloyd seeds from the
                # available rows, so a corpus smaller than the requested
                # k yields fewer centroids; consumers sizing buckets from
                # the sidecar must see the truth, not the request
                "k": len(centroids),
                "k_requested": int(k),
                "iters": int(iters),
                "id_col": id_col,
                "vec_col": vec_col,
                "centroids": centroids,
            },
            fh,
        )
    return centroids


def load_kmeans_model(model_dir: str) -> dict:
    """Read the ``_kmeans_meta.json`` sidecar written by
    :func:`build_kmeans_model`."""
    import json
    import os

    with open(os.path.join(model_dir, _KMEANS_META)) as fh:
        return json.load(fh)


def assign_with_model(df: DataFrame, model_dir: str) -> DataFrame:
    """Assign-forever half: label a new vector batch against the frozen
    persisted centroids — one stateless map pass, zero Exchange, and
    identical under ``readStream`` (the batch==stream parity pytest).
    The sidecar's column contract travels with the model, so callers
    don't re-specify id/vector column names."""
    meta = load_kmeans_model(model_dir)
    return kmeans_assign(
        df, meta["centroids"],
        id_col=meta["id_col"], vec_col=meta["vec_col"],
    )
