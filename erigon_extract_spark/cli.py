"""Command-line entry points — the inspect/transform surface of the
reference binary (show_usage, erigon_extract.c:2595-2611), Spark-side.

    python -m erigon_extract_spark.cli show <file>          # reference -s
    python -m erigon_extract_spark.cli show -S <file>       # reference -S
    python -m erigon_extract_spark.cli show -T <file>       # reference -T
    python -m erigon_extract_spark.cli copy -T <in> <out>   # transcode (copy_file, 2047-2100)
    python -m erigon_extract_spark.cli build --fixtures <outdir>   # pipeline -> sorted parquet
    python -m erigon_extract_spark.cli dump <state_history_parquet>  # K5 canonical dump
    python -m erigon_extract_spark.cli state-at <parquet> --block N [--address hex]
    python -m erigon_extract_spark.cli state-at <merged.dat> --ref-file --block N --address hex [--slot hex]
    python -m erigon_extract_spark.cli ann-build <emb.parquet> <idx> # persisted IVFPQ
    python -m erigon_extract_spark.cli ann-query <idx> <probes.parquet> -k 10
    python -m erigon_extract_spark.cli index-build <docs.parquet> <idx>  # inverted text index
    python -m erigon_extract_spark.cli index-query <idx> term1 term2 --mode and
    python -m erigon_extract_spark.cli cluster-build <emb.parquet> <model> -k 8
    python -m erigon_extract_spark.cli cluster-assign <model> <new.parquet> [--out dir]

``show`` mirrors the reference's output line formats (print_account /
print_storage / the dim "(set ...)" trace lines, erigon_extract.c:361-424)
without ANSI color, so dumps diff cleanly against reference output.
"""

from __future__ import annotations

import argparse
import sys


def _print_number(b: bytes) -> str:
    """print_number (erigon_extract.c:89-103): hex with leading zero
    NIBBLES trimmed; '0' when all zero."""
    h = b.hex().lstrip("0")
    return h if h else "0"


def _show(args) -> int:
    from erigon_extract_spark.codec import refstream as rs

    data = open(args.file, "rb").read()
    start = 256 if args.merged else 0
    end = None
    if args.merged:
        hdr = rs.decode_header(data)
        start, end = hdr["header_size"], hdr["end_of_states"]
        print(f"(header end_of_states={end} page_shift={hdr['page_shift']} "
              f"blocks={hdr['block_start']}..{hdr['block_end']})")

    def trace(event, value):
        if event == "block":
            print(f"(set block={value})")
        elif event == "address":
            print(f"(set address={value.hex()})")
        elif event == "incarnation":
            print(f"(bytecode_incarnation={value})")

    reader = rs.RefReader(strategy=args.strategy, trace=trace)
    n = 0
    for it in reader.items(data, start, end):
        if it.is_storage:
            print(f"  Storage block={it.block} "
                  f"slot={it.address.hex()}/{it.slot.hex()}")
            print(f"          inc={it.incarnation} "
                  f"value={_print_number(it.value)}")
        else:
            code = (
                "0"
                if it.code_hash in (bytes(32), rs.EMPTY_CODE_HASH)
                else it.code_hash.hex()
            )
            print(f"  Account block={it.block} address={it.address.hex()}")
            print(f"          inc={it.incarnation} nonce={it.nonce} "
                  f"balance={_print_number(it.balance)} codeHash={code}")
        n += 1
    print(f"({n} items)", file=sys.stderr)
    return 0


def _copy(args) -> int:
    """copy_file equivalent (erigon_extract.c:2047-2100): decode with one
    strategy/layout, re-encode with another — the round-trip verifier."""
    from erigon_extract_spark.codec import refstream as rs

    data = open(args.infile, "rb").read()
    start, end = 0, None
    blocks = None
    if args.merged:
        hdr = rs.decode_header(data)
        start, end = hdr["header_size"], hdr["end_of_states"]
        blocks = (hdr["block_start"], hdr["block_end"])
    items = rs.decode_items(data, strategy=args.strategy, start=start, end=end)
    if args.out_merged:
        if blocks is None:
            blocks = (
                min((i.block for i in items), default=0),
                max((i.block for i in items), default=0),
            )
        out = rs.encode_full_history_file(
            items, block_start=blocks[0], block_end=blocks[1]
        )
    else:
        out = rs.encode_items(items, strategy=args.out_strategy)
    open(args.outfile, "wb").write(out)
    print(f"({len(items)} items -> {len(out)} bytes)", file=sys.stderr)
    return 0


def _spark():
    from erigon_extract_spark.session import get_spark

    return get_spark(app_name="cli")


def _build(args) -> int:
    """Run the flagship pipeline end-to-end and write the sorted store
    (the reference's full transformation run, erigon_extract.c:2663-2706)."""
    from pyspark.sql import functions as F  # noqa: F401

    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.plans.extract import (
        decode_account_changesets,
        decode_storage_changesets,
        recover_code_hashes,
        split_plain_state,
    )
    from erigon_extract_spark.plans.transpose import build_state_history
    from erigon_extract_spark.schemas import (
        ACCOUNT_CHANGESETS,
        PLAIN_CODE_HASH,
        PLAIN_STATE,
        STORAGE_CHANGESETS,
    )
    from erigon_extract_spark.sources.tables import (
        write_manifest,
        write_sorted_parquet,
    )

    spark = _spark()
    src = args.fixtures or str(fixture_store.ensure())
    acs = spark.read.schema(ACCOUNT_CHANGESETS).parquet(
        f"{src}/account_changesets.parquet"
    )
    scs = spark.read.schema(STORAGE_CHANGESETS).parquet(
        f"{src}/storage_changesets.parquet"
    )
    ps = spark.read.schema(PLAIN_STATE).parquet(f"{src}/plain_state.parquet")
    pch = spark.read.schema(PLAIN_CODE_HASH).parquet(
        f"{src}/plain_code_hash.parquet"
    )
    acct = recover_code_hashes(decode_account_changesets(acs).drop("decode_error"), pch)
    stor = decode_storage_changesets(scs).drop("decode_error")
    ps_a, ps_s = split_plain_state(ps)
    ps_acct = recover_code_hashes(
        decode_account_changesets(ps_a).drop("decode_error"), pch
    )
    ps_stor = decode_storage_changesets(ps_s).drop("decode_error")
    sh = build_state_history(acct, stor, ps_acct, ps_stor,
                             num_partitions=args.partitions)
    write_sorted_parquet(
        sh, args.out, ["address", "kind", "incarnation", "slot", "block_from"],
        num_partitions=args.partitions,
    )
    manifest = write_manifest(spark.read.parquet(args.out), args.out)
    print(manifest)
    return 0


def _dump(args) -> int:
    from erigon_extract_spark.operators.dump import dump_text

    spark = _spark()
    sys.stdout.write(dump_text(spark.read.parquet(args.store)))
    return 0


def _state_at(args) -> int:
    if args.ref_file:
        return _state_at_ref_file(args)
    from erigon_extract_spark.operators.dump import canonical_dump
    from erigon_extract_spark.plans.state import account_state_at

    spark = _spark()
    sh = spark.read.parquet(args.store)
    address = bytes.fromhex(args.address) if args.address else None
    out = account_state_at(sh, block=args.block, address=address)
    from pyspark.sql import functions as F

    rows = out.withColumn("kind", F.lit(0)).withColumn(
        "slot", F.lit(None).cast("binary")
    ).withColumn("value", F.lit(None).cast("binary"))
    for r in canonical_dump(rows).collect():
        print(r["line"])
    return 0


def _state_at_ref_file(args) -> int:
    """O(log N) as-of lookup INTO an encoded merged file (no Spark, no
    full decode — the reference README's headline read path): binary
    search over the file's 4 KiB restart pages via codec.refstream.
    point_lookup. With --slot, the account is looked up first to resolve
    the live incarnation as of the block — two O(log N) searches."""
    from erigon_extract_spark.codec import refstream as rs

    if not args.address:
        print("--ref-file requires --address", file=sys.stderr)
        return 2
    address = bytes.fromhex(args.address)
    it, stats = rs.point_lookup(args.store, address, args.block)
    if args.slot is not None:
        if it is None:
            print("(account not found; no incarnation for slot lookup)",
                  file=sys.stderr)
            return 1
        inc = args.incarnation if args.incarnation is not None else it.incarnation
        it, s2 = rs.point_lookup(
            args.store, address, args.block,
            slot=bytes.fromhex(args.slot), incarnation=inc,
        )
        for k in ("page_probes", "pages_fully_decoded", "bytes_read"):
            stats[k] += s2[k]
    if it is None:
        print("(not found)", file=sys.stderr)
        print(f"({stats['page_probes']} page probes, "
              f"{stats['pages_fully_decoded']} pages decoded, "
              f"{stats['bytes_read']} bytes of {stats['pages_total']} pages)",
              file=sys.stderr)
        return 1
    if it.is_storage:
        print(f"  Storage block={it.block} address={it.address.hex()}")
        print(f"          inc={it.incarnation} "
              f"value={_print_number(it.value)}")
    else:
        code = (
            "0"
            if it.code_hash in (bytes(32), rs.EMPTY_CODE_HASH)
            else it.code_hash.hex()
        )
        print(f"  Account block={it.block} address={it.address.hex()}")
        print(f"          inc={it.incarnation} nonce={it.nonce} "
              f"balance={_print_number(it.balance)} codeHash={code}")
    print(f"({stats['page_probes']} page probes, "
          f"{stats['pages_fully_decoded']} pages decoded, "
          f"{stats['bytes_read']} bytes of {stats['pages_total']} pages)",
          file=sys.stderr)
    return 0


def _profile(args) -> int:
    from erigon_extract_spark.operators.profile import profile_table
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-profile")
    df = spark.read.parquet(args.parquet)
    for r in sorted(
        profile_table(df, exact=not args.approx).collect(),
        key=lambda r: r.col_name,
    ):
        print(
            f"{r.col_name}: rows={r.n_rows} nulls={r.n_nulls} "
            f"distinct={r.n_distinct} min={r.min_s} max={r.max_s}"
        )
    return 0


def _compact(args) -> int:
    from erigon_extract_spark.session import get_spark
    from erigon_extract_spark.sources.compact import compact_parquet

    spark = get_spark(app_name="cli-compact")
    n = compact_parquet(
        spark,
        args.src,
        args.dst,
        target_rows_per_file=args.rows_per_file,
        sort_cols=args.sort_by.split(",") if args.sort_by else None,
    )
    print(f"compacted {args.src} -> {args.dst} ({n} files)")
    return 0


def _wds_pack(args) -> int:
    from erigon_extract_spark.session import get_spark
    from erigon_extract_spark.sources.webdataset import documents_to_shards

    spark = get_spark(app_name="cli-wds-pack")
    docs = spark.read.parquet(args.parquet)
    manifest = documents_to_shards(
        spark, docs, args.out_dir, n_shards=args.shards
    ).collect()
    for r in sorted(manifest, key=lambda r: r.shard):
        print(f"{r.shard}: {r.n_samples} samples, {r.n_bytes} bytes")
    print(f"packed {sum(r.n_samples for r in manifest)} samples "
          f"into {len(manifest)} shards at {args.out_dir}")
    return 0


def _media_probe(args) -> int:
    """Probe a local media file with the REAL kernels (PNG/WAV/GIF
    native, PIL fallback) — the single-file spot check for the cluster
    path."""
    with open(args.file, "rb") as f:
        payload = f.read()
    from erigon_extract_spark.operators.multimodal import _real_probe

    w, h, dur = _real_probe(payload)
    kind = "audio" if w is None else "image"
    print(f"{args.file}: {kind} bytes={len(payload)} "
          f"width={w} height={h} duration_ms={dur}")
    return 0


def _index_build(args) -> int:
    """Build a persisted inverted text index from a documents parquet:
    postings partitioned by term-hash bucket + JSON sidecar (the text
    retrieval sibling of ann-build)."""
    from erigon_extract_spark.operators.invindex import build_inverted_index
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-index-build")
    docs = spark.read.parquet(args.parquet)
    build_inverted_index(
        docs,
        args.out_dir,
        n_buckets=args.buckets,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    n = spark.read.parquet(args.out_dir).count()
    print(f"index at {args.out_dir}: {n} postings, {args.buckets} buckets")
    return 0


def _index_query(args) -> int:
    """Boolean term search against a persisted inverted index; prints
    (doc_id, n_terms, total_tf) ordered by total_tf desc."""
    from erigon_extract_spark.operators.invindex import query_inverted_index
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-index-query")
    out = query_inverted_index(
        spark, args.index, args.terms, mode=args.mode
    )
    rows = sorted(out.collect(), key=lambda r: (-r.total_tf, r.doc_id))
    for r in rows[: args.limit]:
        print(f"{r.doc_id}\t{r.n_terms}\t{r.total_tf}")
    print(f"# {len(rows)} docs match ({args.mode} of {args.terms})")
    return 0


def _ann_build(args) -> int:
    """Build a persisted ANN index (IVFPQ) from an embeddings parquet:
    cells as partition directories, PQ codes + raw vectors inside, the
    trained quantizer state in a JSON sidecar."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.similarity import (
        build_ivfpq_index,
        l2_norm,
    )
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-ann-build")
    emb = spark.read.parquet(args.parquet).select(
        args.id_col,
        F.col(args.vec_col).cast("array<double>").alias(args.vec_col),
    )
    if args.normalize:
        emb = emb.select(
            args.id_col,
            F.transform(
                args.vec_col, lambda x: x / l2_norm(F.col(args.vec_col))
            ).alias(args.vec_col),
        )
    build_ivfpq_index(
        emb, args.out_dir,
        n_lists=args.lists, m=args.m, n_codes=args.codes,
        id_col=args.id_col, vec_col=args.vec_col,
    )
    import json
    import os

    with open(os.path.join(args.out_dir, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    n = spark.read.parquet(args.out_dir).count()
    print(f"indexed {n} vectors into {meta['n_lists']} cells at "
          f"{args.out_dir} (m={meta['m']}, {meta['n_codes']} codes/"
          f"subspace, {1 + meta['m']} bytes/vector + refine vectors)")
    return 0


def _ann_add(args) -> int:
    """Append new vectors to a persisted IVFPQ index without
    retraining: the sidecar's frozen codebooks assign cells and PQ
    codes, and only the touched cell directories gain files."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.similarity import (
        add_to_ivfpq_index,
        l2_norm,
    )
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-ann-add")
    new = spark.read.parquet(args.parquet).select(
        args.id_col,
        F.col(args.vec_col).cast("array<double>").alias(args.vec_col),
    )
    if args.normalize:
        new = new.select(
            args.id_col,
            F.transform(
                args.vec_col, lambda x: x / l2_norm(F.col(args.vec_col))
            ).alias(args.vec_col),
        )
    n = add_to_ivfpq_index(spark, args.index, new)
    total = spark.read.parquet(args.index).count()
    print(f"added {n} vectors to {args.index} (index now {total} rows)")
    return 0


def _ann_query(args) -> int:
    """Query a persisted IVFPQ index with probe vectors from a parquet
    (same column contract as ann-build); prints per-probe top-k."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.similarity import (
        l2_norm,
        query_ivfpq_index,
    )
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-ann-query")
    probes = spark.read.parquet(args.probes).select(
        F.col(args.id_col).alias("probe_id"),
        F.col(args.vec_col).cast("array<double>").alias(args.vec_col),
    )
    if args.normalize:
        probes = probes.select(
            "probe_id",
            F.transform(
                args.vec_col, lambda x: x / l2_norm(F.col(args.vec_col))
            ).alias(args.vec_col),
        )
    out_df = query_ivfpq_index(
        spark, args.index, probes,
        k=args.k, n_probe=args.probe_cells, vec_col=args.vec_col,
        rerank=args.rerank,
    )
    id_name = out_df.columns[1]  # (probe_id, <index id col>, score)
    by_probe: dict = {}
    for r in out_df.collect():
        by_probe.setdefault(r.probe_id, []).append(r)
    for pid in sorted(by_probe):
        hits = sorted(by_probe[pid], key=lambda r: -r.score)
        ids = " ".join(f"{r[id_name]}:{r.score:.4f}" for r in hits)
        print(f"probe {pid}: {ids}")
    return 0


def _cluster_build(args) -> int:
    """Fit the deterministic k-means on an embeddings parquet, write the
    assignment table + frozen-centroid sidecar (the cluster sibling of
    ann-build: train once here, label forever with cluster-assign)."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.clustering import (
        build_kmeans_model,
    )
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-cluster-build")
    emb = spark.read.parquet(args.parquet)
    centroids = build_kmeans_model(
        emb, args.out_dir, k=args.k, iters=args.iters,
        id_col=args.id_col, vec_col=args.vec_col,
        persist=not args.no_persist,
    )
    sizes = {
        r["cid"]: r["n"]
        for r in spark.read.parquet(args.out_dir)
        .groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    total = sum(sizes.values())
    dist = " ".join(
        f"{cid}:{sizes.get(cid, 0)}" for cid in range(len(centroids))
    )
    print(f"clustered {total} vectors into k={len(centroids)} "
          f"(iters={args.iters}) at {args.out_dir}; sizes {dist}")
    return 0


def _cluster_assign(args) -> int:
    """Label a new vector batch against a persisted cluster model's
    frozen centroids — no retrain, no training-corpus read, one
    stateless map pass (the k-means analogue of ann-add's
    frozen-codebook discipline)."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.clustering import (
        assign_with_model,
        load_kmeans_model,
    )
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="cli-cluster-assign")
    meta = load_kmeans_model(args.model)
    new = spark.read.parquet(args.parquet)
    out = assign_with_model(new, args.model)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"assigned {n} vectors against {args.model} "
              f"(k={meta['k']}) -> {args.out}")
    else:
        sizes = {
            r["cid"]: r["n"]
            for r in out.groupBy("cid").agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(sizes.values())
        dist = " ".join(f"{c}:{sizes[c]}" for c in sorted(sizes))
        print(f"assigned {total} vectors against {args.model} "
              f"(k={meta['k']}); sizes {dist}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="erigon_extract_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("show", help="decode + print an encoded file (-s/-S/-T)")
    p.add_argument("file")
    p.add_argument("-S", dest="strategy", action="store_const", const=1,
                   default=0, help="strategy-1 file (reference -S)")
    p.add_argument("-T", dest="merged", action="store_true",
                   help="merged file with header+pages (reference -T)")
    p.set_defaults(fn=_show)

    p = sub.add_parser("copy", help="decode + re-encode (copy_file verifier)")
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("-S", dest="strategy", action="store_const", const=1, default=0)
    p.add_argument("-T", dest="merged", action="store_true")
    p.add_argument("--out-strategy", type=int, default=0)
    p.add_argument("--out-merged", action="store_true")
    p.set_defaults(fn=_copy)

    p = sub.add_parser("build", help="run the pipeline, write the sorted store")
    p.add_argument("--fixtures", default=None,
                   help="input dir (default: the committed fixture parquet)")
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.set_defaults(fn=_build)

    p = sub.add_parser("dump", help="K5 canonical text dump of a store")
    p.add_argument("store")
    p.set_defaults(fn=_dump)

    p = sub.add_parser("state-at", help="as-of account state query")
    p.add_argument("store", help="state-history parquet, or with "
                   "--ref-file a merged encoded .dat file")
    p.add_argument("--block", type=int, required=True)
    p.add_argument("--address", default=None, help="hex, no 0x")
    p.add_argument("--ref-file", action="store_true",
                   help="store is an encoded merged full-history file: "
                   "answer via O(log N) restart-page binary search "
                   "(no Spark, no full decode)")
    p.add_argument("--slot", default=None,
                   help="hex storage slot (--ref-file only): storage "
                   "as-of lookup, incarnation resolved via the account")
    p.add_argument("--incarnation", type=int, default=None,
                   help="override the slot lookup's incarnation")
    p.set_defaults(fn=_state_at)

    p = sub.add_parser("profile", help="per-column stats of a parquet table")
    p.add_argument("parquet")
    p.add_argument("--approx", action="store_true",
                   help="HLL cardinalities (the 100 TB mode)")
    p.set_defaults(fn=_profile)

    p = sub.add_parser("compact", help="rewrite a dataset into right-sized files")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--rows-per-file", type=int, default=1_000_000)
    p.add_argument("--sort-by", default=None, help="comma-separated columns")
    p.set_defaults(fn=_compact)

    p = sub.add_parser("wds-pack",
                       help="pack a documents parquet into WebDataset tars")
    p.add_argument("parquet")
    p.add_argument("out_dir")
    p.add_argument("--shards", type=int, default=4)
    p.set_defaults(fn=_wds_pack)

    p = sub.add_parser("media-probe",
                       help="probe one media file with the real kernels")
    p.add_argument("file")
    p.set_defaults(fn=_media_probe)

    p = sub.add_parser("ann-build",
                       help="build a persisted IVFPQ ANN index")
    p.add_argument("parquet")
    p.add_argument("out_dir")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--lists", type=int, default=16)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--codes", type=int, default=32)
    p.add_argument("--normalize", action="store_true",
                   help="L2-normalize vectors (cosine semantics)")
    p.set_defaults(fn=_ann_build)

    p = sub.add_parser("ann-add",
                       help="add vectors to a persisted IVFPQ index "
                            "(frozen codebooks, append-only)")
    p.add_argument("index")
    p.add_argument("parquet", help="parquet of vectors to add")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--normalize", action="store_true",
                   help="L2-normalize vectors (cosine semantics; must "
                        "match how the index was built)")
    p.set_defaults(fn=_ann_add)

    p = sub.add_parser("ann-query",
                       help="top-k probe against a persisted IVFPQ index")
    p.add_argument("index")
    p.add_argument("probes", help="parquet of probe vectors")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--probe-cells", type=int, default=4)
    p.add_argument("--rerank", type=int, default=50)
    p.add_argument("--normalize", action="store_true")
    p.set_defaults(fn=_ann_query)

    p = sub.add_parser("index-build",
                       help="build a persisted inverted text index")
    p.add_argument("parquet")
    p.add_argument("out_dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--buckets", type=int, default=64)
    p.set_defaults(fn=_index_build)

    p = sub.add_parser("index-query",
                       help="boolean term search against an inverted index")
    p.add_argument("index")
    p.add_argument("terms", nargs="+")
    p.add_argument("--mode", choices=("and", "any"), default="and")
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=_index_query)

    p = sub.add_parser("cluster-build",
                       help="fit deterministic k-means; persist "
                            "assignments + centroid sidecar")
    p.add_argument("parquet")
    p.add_argument("out_dir")
    p.add_argument("-k", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--no-persist", action="store_true",
                   help="skip caching the projected corpus across the "
                        "iteration passes")
    p.set_defaults(fn=_cluster_build)

    p = sub.add_parser("cluster-assign",
                       help="label new vectors with a persisted cluster "
                            "model's frozen centroids")
    p.add_argument("model", help="cluster-build output directory")
    p.add_argument("parquet", help="parquet of vectors to label")
    p.add_argument("--out", default=None,
                   help="write (id, cid) parquet here instead of "
                        "printing cluster sizes")
    p.set_defaults(fn=_cluster_assign)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
