"""Time every registered query at sf0.01 in registration order.

Approximates the driver's per-query cost so we can trim the fixed
overhead that truncated the round-1 correctness run.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("time-queries")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
qs = entrymod.queries()
t_all = time.time()
times = {}
for name, fn in qs.items():
    t0 = time.time()
    try:
        n = len(fn(spark, SF).toPandas())
        times[name] = time.time() - t0
        print(f"{times[name]:7.2f}s  {name}  ({n} rows)", flush=True)
    except Exception as e:
        times[name] = time.time() - t0
        print(f"{times[name]:7.2f}s  {name}  ERROR {e}", flush=True)
print(f"\nTOTAL {time.time() - t_all:.1f}s for {len(qs)} queries")
for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  slowest: {t:6.2f}s {name}")
