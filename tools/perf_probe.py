import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

t0 = time.time()
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
print("startup", round(time.time() - t0, 1), flush=True)
for i in range(3):
    t0 = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"range-sum {i}", round(time.time() - t0, 1), flush=True)
df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
for i in range(3):
    t0 = time.time()
    df.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    print(f"groupby {i}", round(time.time() - t0, 1), flush=True)
for i in range(3):
    t0 = time.time()
    df.groupBy("l_linestatus").agg(F.sum(F.col("l_quantity") + i)).collect()
    print(f"fresh-q {i}", round(time.time() - t0, 1), flush=True)
spark.conf.set("spark.sql.codegen.wholeStage", "false")
for i in range(3):
    t0 = time.time()
    df.groupBy("l_returnflag").agg(F.sum(F.col("l_extendedprice") + i)).collect()
    print(f"nocodegen {i}", round(time.time() - t0, 1), flush=True)
