"""CLI surface (erigon_extract_spark/cli.py) — the reference's -s/-S/-T
inspect and copy_file verify commands (erigon_extract.c:2595-2653,
2047-2100), plus the Spark-side build/dump/state-at entry points."""

from __future__ import annotations

import io
import sys

from erigon_extract_spark import cli
from erigon_extract_spark import fixture_store
from erigon_extract_spark.codec import refstream as rs


def _run(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_show_merged_prints_reference_format(capsys):
    d = str(fixture_store.ensure())
    rc, out = _run(["show", "-T", f"{d}/full-history.dat"], capsys)
    assert rc == 0
    lines = out.splitlines()
    assert lines[0].startswith("(header end_of_states=")
    assert any(l.startswith("  Account block=") for l in lines)
    assert any(l.startswith("  Storage block=") for l in lines)
    assert any(l.startswith("(set address=") for l in lines)
    assert any(l.startswith("(set block=") for l in lines)
    # item count == fixture state history rows
    n_acct = sum(1 for l in lines if l.startswith("  Account"))
    n_stor = sum(1 for l in lines if l.startswith("  Storage"))
    assert n_acct + n_stor == 429


def test_copy_merged_to_merged_is_byte_identical(tmp_path, capsys):
    d = str(fixture_store.ensure())
    src = f"{d}/full-history.dat"
    dst = str(tmp_path / "copy.dat")
    rc, _ = _run(["copy", "-T", src, dst, "--out-merged"], capsys)
    assert rc == 0
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_copy_transcode_roundtrip_preserves_items(tmp_path, capsys):
    d = str(fixture_store.ensure())
    src = f"{d}/full-history.dat"
    mid = str(tmp_path / "s1.dat")
    rc, _ = _run(["copy", "-T", src, mid, "--out-strategy", "1"], capsys)
    assert rc == 0
    _, orig = rs.decode_full_history_file(open(src, "rb").read())
    back = rs.decode_items(open(mid, "rb").read(), strategy=1)
    assert [i.astuple() for i in back] == [i.astuple() for i in orig]


def test_print_number_trims_leading_zero_nibbles():
    assert cli._print_number(bytes(32)) == "0"
    assert cli._print_number((0xF5E).to_bytes(32, "big")) == "f5e"
    assert cli._print_number((0x10).to_bytes(4, "big")) == "10"


def test_cli_build_dump_state_at_roundtrip(spark, tmp_path, capsys):
    """The Spark-side CLI chain: build writes the sorted store + manifest,
    dump emits canonical lines for every row, state-at answers an as-of
    query against the written store."""
    store = str(tmp_path / "store")
    rc = cli.main(["build", "--out", store, "--partitions", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "'total': 429" in out

    rc = cli.main(["dump", store])
    dump_out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in dump_out.splitlines() if l]
    assert len(lines) == 429
    assert any(l.startswith("A ") for l in lines)
    assert any(l.startswith("S ") for l in lines)

    rc = cli.main(["state-at", store, "--block", "100"])
    sa_out = capsys.readouterr().out
    assert rc == 0
    sa_lines = [l for l in sa_out.splitlines() if l]
    assert 0 < len(sa_lines) <= 8  # one row per address alive at block 100
    assert all(l.startswith("A ") and "@" in l for l in sa_lines)


def test_cli_profile_and_compact(spark, sf_dir, tmp_path, capsys):
    from erigon_extract_spark import cli

    rc = cli.main(["profile", f"{sf_dir}/documents.parquet"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.splitlines() if l]
    assert len(lines) == 5  # one per documents column
    assert any(l.startswith("doc_id:") and "nulls=0" in l for l in lines)

    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(16).write.parquet(src)
    rc = cli.main(["compact", src, dst, "--rows-per-file", "1000",
                   "--sort-by", "doc_id"])
    out = capsys.readouterr().out
    assert rc == 0 and "files)" in out
    assert (spark.read.parquet(dst).count()
            == spark.read.parquet(src).count())


def test_cli_media_probe_and_wds_pack(tmp_path, capsys, spark):
    import numpy as np

    from erigon_extract_spark.cli import main
    from erigon_extract_spark.functions.png import encode_png
    from erigon_extract_spark.functions.wav import encode_wav

    png = tmp_path / "a.png"
    png.write_bytes(encode_png(np.zeros((6, 9, 3), dtype=np.uint8)))
    assert main(["media-probe", str(png)]) == 0
    out = capsys.readouterr().out
    assert "image" in out and "width=9" in out and "height=6" in out

    wav = tmp_path / "b.wav"
    wav.write_bytes(encode_wav(np.zeros(4000, dtype=np.int16), 8000))
    assert main(["media-probe", str(wav)]) == 0
    out = capsys.readouterr().out
    assert "audio" in out and "duration_ms=500" in out

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "hello", "en", "s0"), (2, "welt", "de", "s1")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(src))
    dst = tmp_path / "wds"
    assert main(["wds-pack", str(src), str(dst), "--shards", "2"]) == 0
    out = capsys.readouterr().out
    assert "packed 2 samples into 2 shards" in out


def test_cli_ann_build_and_query(spark, sf_dir, tmp_path, capsys):
    """End-to-end persisted-ANN CLI: build an IVFPQ index from the
    embeddings parquet, query it with a small probe set, and check the
    self-match property (a probe vector's own id appears among its
    top-k with the highest score on normalized vectors)."""
    idx = str(tmp_path / "annidx")
    rc, out = _run(
        ["ann-build", f"{sf_dir}/embeddings.parquet", idx,
         "--lists", "6", "--m", "8", "--codes", "16", "--normalize"],
        capsys,
    )
    assert rc == 0
    assert "cells at" in out and "bytes/vector" in out

    probes = str(tmp_path / "probes.parquet")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        "vec_id < 3"
    ).write.parquet(probes)
    rc, out = _run(
        ["ann-query", idx, probes, "-k", "5", "--probe-cells", "3",
         "--rerank", "20", "--normalize"],
        capsys,
    )
    assert rc == 0
    lines = [l for l in out.splitlines() if l.startswith("probe ")]
    assert len(lines) == 3
    for line in lines:
        pid = int(line.split()[1].rstrip(":"))
        first_hit = line.split(": ", 1)[1].split()[0]
        hit_id, score = first_hit.split(":")
        # the probe is IN the corpus: exact self-match ranks first
        assert int(hit_id) == pid and float(score) > 0.999, line


def test_cli_ann_add(spark, sf_dir, tmp_path, capsys):
    """ann-add appends to a built index with frozen codebooks: build on
    vec_id >= 10, add vec_id < 10, then a probe from the ADDED set must
    self-match at top-1 (full-scan query: every cell probed, exact
    rerank)."""
    idx = str(tmp_path / "annidx_add")
    base = str(tmp_path / "base.parquet")
    extra = str(tmp_path / "extra.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.filter("vec_id >= 10").write.parquet(base)
    emb.filter("vec_id < 10").write.parquet(extra)
    rc, out = _run(
        ["ann-build", base, idx,
         "--lists", "6", "--m", "8", "--codes", "16", "--normalize"],
        capsys,
    )
    assert rc == 0
    before = spark.read.parquet(idx).count()
    rc, out = _run(["ann-add", idx, extra, "--normalize"], capsys)
    assert rc == 0
    assert "added 10 vectors" in out
    assert spark.read.parquet(idx).count() == before + 10

    probes = str(tmp_path / "probes_add.parquet")
    emb.filter("vec_id < 3").write.parquet(probes)
    rc, out = _run(
        ["ann-query", idx, probes, "-k", "1", "--probe-cells", "6",
         "--rerank", "100000", "--normalize"],
        capsys,
    )
    assert rc == 0
    lines = [l for l in out.splitlines() if l.startswith("probe ")]
    assert len(lines) == 3
    for line in lines:
        pid = int(line.split()[1].rstrip(":"))
        hit_id, score = line.split(": ", 1)[1].split()[0].split(":")
        assert int(hit_id) == pid and float(score) > 0.999, line


def test_cli_index_build_and_query(spark, sf_dir, tmp_path, capsys):
    """End-to-end inverted-index CLI: build from the documents parquet,
    AND-query two terms, and cross-check the doc set against a naive
    text filter over the same corpus."""
    idx = str(tmp_path / "invidx")
    rc, out = _run(
        ["index-build", f"{sf_dir}/documents.parquet", idx,
         "--buckets", "16"],
        capsys,
    )
    assert rc == 0 and "postings" in out

    rc, out = _run(
        ["index-query", idx, "spark", "merge", "--mode", "and",
         "--limit", "5000"],
        capsys,
    )
    assert rc == 0
    got = {
        int(l.split("\t")[0])
        for l in out.splitlines()
        if l and not l.startswith("#")
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.text import word_tokens

    naive = {
        r.doc_id
        for r in docs.select(
            "doc_id", word_tokens(F.col("text")).alias("t")
        )
        .filter(
            F.array_contains("t", "spark") & F.array_contains("t", "merge")
        )
        .collect()
    }
    assert got == naive and got  # non-empty on this corpus


def test_cli_state_at_ref_file_point_lookup(capsys):
    """state-at --ref-file: the O(log N) lookup INTO the encoded merged
    file (reference README.md:37-41) — answers must match the full
    decode of the same committed fixture file, account and storage."""
    d = str(fixture_store.ensure())
    path = f"{d}/full-history.dat"
    _hdr, items = rs.decode_full_history_file(open(path, "rb").read())

    accounts = [i for i in items if not i.is_storage]
    probe = accounts[len(accounts) // 2]
    want = max(
        (i for i in accounts
         if i.address == probe.address and i.block <= probe.block),
        key=lambda i: i.block,
    )
    rc = cli.main(["state-at", path, "--ref-file",
                   "--block", str(probe.block),
                   "--address", probe.address.hex()])
    cap = capsys.readouterr()
    assert rc == 0
    assert f"Account block={want.block} address={want.address.hex()}" in cap.out
    assert f"nonce={want.nonce}" in cap.out
    assert "page probes" in cap.err and "pages decoded" in cap.err

    storages = [i for i in items if i.is_storage]
    sp = storages[len(storages) // 2]
    swant = max(
        (i for i in storages
         if (i.address, i.incarnation, i.slot) == (sp.address, sp.incarnation, sp.slot)
         and i.block <= sp.block),
        key=lambda i: i.block,
    )
    rc = cli.main(["state-at", path, "--ref-file",
                   "--block", str(sp.block),
                   "--address", sp.address.hex(),
                   "--slot", sp.slot.hex(),
                   "--incarnation", str(sp.incarnation)])
    cap = capsys.readouterr()
    assert rc == 0
    assert f"Storage block={swant.block} address={swant.address.hex()}" in cap.out

    # unknown address: not found, exit 1
    rc = cli.main(["state-at", path, "--ref-file",
                   "--block", "1000000", "--address", "ff" * 20])
    cap = capsys.readouterr()
    assert rc == 1 and "(not found)" in cap.err


def test_cli_cluster_build_and_assign(spark, sf_dir, tmp_path, capsys):
    """End-to-end persisted-k-means CLI (VERDICT r10 stretch 8):
    cluster-build fits the deterministic Lloyd k-means and writes the
    assignment parquet + frozen-centroid sidecar; cluster-assign reloads
    the sidecar and labels a held-out batch identically to the
    in-process kmeans_assign, batch AND stream (availableNow)."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.clustering import (
        assign_with_model,
        kmeans_assign,
        kmeans_lloyd,
        load_kmeans_model,
    )

    model = str(tmp_path / "kmodel")
    train = str(tmp_path / "train.parquet")
    held = str(tmp_path / "held.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.filter("vec_id < 300").write.parquet(train)
    emb.filter("vec_id >= 300").write.parquet(held)

    rc, out = _run(["cluster-build", train, model, "-k", "4",
                    "--iters", "2"], capsys)
    assert rc == 0 and "k=4" in out and "clustered 300 vectors" in out

    # sidecar reload: centroids match an in-process retrain exactly
    meta = load_kmeans_model(model)
    _, cent = kmeans_lloyd(emb.filter("vec_id < 300"), k=4, iters=2)
    assert meta["centroids"] == cent
    # the persisted assignment table matches the in-process one
    persisted = {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(model).collect()
    }
    fresh, _ = kmeans_lloyd(emb.filter("vec_id < 300"), k=4, iters=2)
    assert persisted == {r[0]: r[1] for r in fresh.collect()}

    # cluster-assign on the held-out batch == in-process kmeans_assign
    outdir = str(tmp_path / "assigned")
    rc, out = _run(["cluster-assign", model, held, "--out", outdir],
                   capsys)
    assert rc == 0 and "assigned 200 vectors" in out
    got = {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(outdir).collect()
    }
    want = {
        r[0]: r[1]
        for r in kmeans_assign(
            emb.filter("vec_id >= 300"), cent
        ).collect()
    }
    assert got == want

    # print-only mode reports cluster sizes
    rc, out = _run(["cluster-assign", model, held], capsys)
    assert rc == 0 and "sizes" in out

    # batch == stream: the same model drives a readStream availableNow
    # pass to the identical labels (kmeans_assign is stateless map-only)
    stream_in = spark.readStream.schema(
        emb.schema
    ).parquet(held)
    stream_out = assign_with_model(stream_in, model)
    sink = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        r["vec_id"]: r["cid"] for r in spark.read.parquet(sink).collect()
    }
    assert streamed == want
