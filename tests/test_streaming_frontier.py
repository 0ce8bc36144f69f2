"""stream_url_frontier: the crawl frontier chain (canonicalize ->
robots filter -> watermark dedup) in Structured Streaming — an
availableNow pass over a replayed at-least-once source must emit
exactly the batch-distinct allowed canonical URLs."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def _frontier_rows(spark, n=60):
    # two spellings of the same page per id (messy + clean), plus a
    # robots-disallowed /private URL per id; odd hosts disallow /p too
    base = spark.range(n).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    h = (F.col("id") % 4).cast("string")
    mk = lambda pre, path: F.concat(  # noqa: E731
        F.lit(pre), h, F.lit(".example.com"), path
    )
    messy = base.select(
        "ts",
        F.concat(
            F.lit("HTTP://Host"), h,
            F.lit(".Example.COM:80/p"), F.col("id").cast("string"),
            F.lit("/?utm_source=x#f"),
        ).alias("url"),
    )
    clean = base.select(
        "ts", mk("http://host", F.concat(F.lit("/p"), F.col("id").cast("string"))).alias("url")
    )
    private = base.select(
        "ts",
        mk("http://host",
           F.concat(F.lit("/private/x"), F.col("id").cast("string"))).alias("url"),
    )
    return messy.unionAll(clean).unionAll(private)


def _robots(spark):
    return spark.range(4).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.when(F.col("id") % 2 == 1,
               F.array(F.lit("/private"), F.lit("/p")))
         .otherwise(F.array(F.lit("/private"))).alias("disallow"),
    )


def test_frontier_stream_equals_batch_distinct(spark):
    from erigon_extract_spark.operators.urls import (
        canonicalize_url,
        robots_filter,
    )
    from erigon_extract_spark.streaming import stream_url_frontier

    rows = _frontier_rows(spark)
    robots = _robots(spark)
    d = tempfile.mkdtemp(prefix="frontier_stream_")
    try:
        # write TWICE: an at-least-once source replaying the whole batch
        rows.unionAll(rows).coalesce(2).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(rows.schema).parquet(d)
        out = stream_url_frontier(stream, robots, watermark_col="ts")
        q = (
            out.writeStream.format("memory")
            .queryName("frontier_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
        got = {
            r.canonical_url
            for r in spark.sql("SELECT canonical_url FROM frontier_t").collect()
        }
        batch = robots_filter(
            rows.withColumn("canonical_url", canonicalize_url(F.col("url"))),
            robots,
        ).filter(F.col("allowed"))
        expect = {
            r.canonical_url
            for r in batch.select("canonical_url").distinct().collect()
        }
        assert got == expect
        # even hosts (0, 2) allow /p pages: 2 of 4 residues -> half the ids
        assert len(got) == 30
        # no uncanonicalized spellings leaked through
        assert all(u.startswith("http://host") for u in got)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_html_extract_is_streaming_safe(spark):
    """html_extract_text is a stateless projection, so the SAME operator
    must run unchanged inside a stream: availableNow output == batch."""
    import shutil as _sh
    import tempfile as _tf

    from erigon_extract_spark.operators.html import html_extract_text

    rows = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("<html><head><title>t</title></head><body><h1>Doc title "),
            F.col("id").cast("string"),
            F.lit('</h1><div class="nav"><a href="/">Home</a> '
                  '<a href="/a">About</a> <a href="/b">More</a></div>'
                  "<p>Body paragraph with enough words to keep "),
            F.col("id").cast("string"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    d = _tf.mkdtemp(prefix="html_stream_")
    try:
        rows.coalesce(2).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(rows.schema).parquet(d)
        out = html_extract_text(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("html_stream_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
        got = {
            (r.doc_id, r.text, r.n_blocks_total, r.n_blocks_kept)
            for r in spark.sql("SELECT * FROM html_stream_t").collect()
        }
        expect = {
            (r.doc_id, r.text, r.n_blocks_total, r.n_blocks_kept)
            for r in html_extract_text(spark.read.parquet(d)).collect()
        }
        assert got == expect and len(got) == 40
        # every row kept the title + body, dropped the pure-link nav
        assert all(t[3] == 2 and t[2] == 3 for t in got)
    finally:
        _sh.rmtree(d, ignore_errors=True)
