"""The synthetic throughput probes' `scale` parameter must actually
multiply the work — regression for the r5 bug where curation_scale
accepted scale but didn't apply it (bench's scale10 section then
reported a meaningless ~1.0 ratio)."""

from __future__ import annotations


def test_scale_parameter_multiplies_work(spark, sf_dir):
    from erigon_extract_spark import queries as q

    # probes synthesize their own data; sf_dir only satisfies the
    # (spark, sf_dir) query signature — use the suite's fixture so the
    # SPARK_GRAFT_TEST_SF_DIR override applies here like everywhere else
    sf = sf_dir

    r1 = q.QUERIES["curation_scale"](spark, sf).collect()[0]
    r2 = q.QUERIES["curation_scale"](spark, sf, scale=2).collect()[0]
    assert r1.n_scored == 200_000 and r2.n_scored == 400_000

    p1 = q.QUERIES["multimodal_png_scale"](spark, sf).collect()[0]
    p2 = q.QUERIES["multimodal_png_scale"](spark, sf, scale=2).collect()[0]
    assert p1.n_images == 2_000 and p2.n_images == 4_000

    t2 = q.QUERIES["erigon_transpose_scale"](spark, sf, scale=2).collect()[0]
    # 2x accounts (4M) + 2x storage (2M), minus the genesis filter (P7):
    # block-0 carries one row per account address (50k) and one per
    # storage address (20k), so 6M - 70k survive the pipeline
    assert t2.n_rows == 5_930_000

    d1 = q.QUERIES["dedup_scale"](spark, sf).collect()[0]
    d2 = q.QUERIES["dedup_scale"](spark, sf, scale=2).collect()[0]
    # candidate volume grows with the corpus (exact value is
    # structure-dependent; monotone growth is the scale witness)
    assert d2.n_candidates > d1.n_candidates
