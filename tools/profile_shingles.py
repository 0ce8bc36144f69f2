import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from erigon_extract_spark.operators.dedup import shingles
from erigon_extract_spark.operators.text import normalize_text
from erigon_extract_spark.session import get_spark

spark = get_spark(app_name="prof3")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()

# current: split() appears twice inside the composed expression
t0 = time.time()
a = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh")).count()
print("current", a, round(time.time() - t0, 1), flush=True)

# variant: pre-project the words array so it's an attribute, not a repeated
# subexpression
words = F.split(normalize_text(F.col("text")), " ")
pre = docs.select("doc_id", words.alias("w"))
sh2 = F.array_distinct(
    F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(F.col("w")) - 3, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 3)),
        ),
        lambda s: F.length(s) > 0,
    )
)
t0 = time.time()
b = pre.select("doc_id", F.explode(sh2).alias("sh")).count()
print("pre-projected", b, round(time.time() - t0, 1), flush=True)

for run in range(2):
    t0 = time.time()
    docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh")).count()
    print("current again", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    pre.select("doc_id", F.explode(sh2).alias("sh")).count()
    print("pre again", round(time.time() - t0, 1), flush=True)
