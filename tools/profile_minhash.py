import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from erigon_extract_spark.operators.dedup import (
    minhash_signatures,
    shingles,
)
from erigon_extract_spark.session import get_spark

spark = get_spark(app_name="prof")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

t0 = time.time()
n = docs.count()
print("docs", n, round(time.time() - t0, 1), flush=True)

t0 = time.time()
sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh"))
print("shingle rows", sh.count(), round(time.time() - t0, 1), flush=True)

t0 = time.time()
sigs = minhash_signatures(docs, n_hashes=32, shingle_n=3)
print("sigs", sigs.count(), round(time.time() - t0, 1), flush=True)

rows_per_band, bands = 4, 8
t0 = time.time()
banded = sigs.select(
    "doc_id",
    F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.hash(
                        *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb"),
).select("doc_id", "bb.band", "bb.bucket")
print("banded", banded.count(), round(time.time() - t0, 1), flush=True)

t0 = time.time()
banded.cache().count()
left = banded.alias("l")
right = banded.alias("r")
pairs = (
    left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    )
    .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    .distinct()
)
print("pairs", pairs.count(), round(time.time() - t0, 1), flush=True)
pairs.explain("formatted")
