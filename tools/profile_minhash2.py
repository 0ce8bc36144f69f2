import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from erigon_extract_spark.operators.dedup import shingles
from erigon_extract_spark.session import get_spark

spark = get_spark(app_name="prof2")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()

n_hashes, bands, rpb = 32, 8, 4

sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh"))
aggs = [
    F.min(
        F.hash(F.col("sh"), F.lit(i * 2654435761 + 1)).bitwiseAND(F.lit(0x7FFFFFFF))
    ).alias(f"__h{i}")
    for i in range(n_hashes)
]
flat = sh.groupBy("doc_id").agg(*aggs)

t0 = time.time(); flat.count(); print("flat agg count", round(time.time() - t0, 1), flush=True)

# variant A: signature array then explode band structs (current impl)
sig = flat.select("doc_id", F.array(*[F.col(f"__h{i}") for i in range(n_hashes)]).alias("signature"))
bandedA = sig.select(
    "doc_id",
    F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.hash(*[F.col("signature")[b * rpb + r] for r in range(rpb)]).alias("bucket"))
        for b in range(bands)
    ])).alias("bb"),
).select("doc_id", "bb.band", "bb.bucket")
t0 = time.time(); bandedA.count(); print("variant A (array idx)", round(time.time() - t0, 1), flush=True)
t0 = time.time(); bandedA.count(); print("variant A again", round(time.time() - t0, 1), flush=True)

# variant B: bucket columns straight from flat agg cols, then struct-explode
bandedB = flat.select(
    "doc_id",
    F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.hash(*[F.col(f"__h{b * rpb + r}") for r in range(rpb)]).alias("bucket"))
        for b in range(bands)
    ])).alias("bb"),
).select("doc_id", "bb.band", "bb.bucket")
t0 = time.time(); bandedB.count(); print("variant B (flat cols)", round(time.time() - t0, 1), flush=True)

# join timing on cached banded
bandedB.cache().count()
l, r = bandedB.alias("l"), bandedB.alias("r")
pairs = (
    l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
    .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")).distinct()
)
t0 = time.time(); print("pairs", pairs.count(), round(time.time() - t0, 1), flush=True)
