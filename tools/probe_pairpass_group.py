import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from pyspark.sql import functions as F
from frinesis_spark.session import get_spark
from frinesis_spark.operators import dedup as D
spark = get_spark("ab_pairpass"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
inv = D._cached_shingle_index(spark, sf)
sizes = D._cached_shingle_sizes(spark, sf)

def finish(common):
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (common.join(na, "doc_a").join(nb, "doc_b")
            .where(jac >= D._JACCARD_THRESHOLD)
            .select("doc_a","doc_b",F.round(jac,6).alias("jaccard"),
                    F.col("n_common").cast("long").alias("n_common")))

def old_common():
    a, b = inv.alias("a"), inv.alias("b")
    return (a.join(b, (F.col("a.shingle")==F.col("b.shingle")) & (F.col("a.doc_id")<F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_common")))

variants = {"old_join": lambda: finish(old_common()),
            "new_group": lambda: finish(D._common_shingle_pair_counts(inv))}
# result equality first
pd_old = variants["old_join"]().orderBy("doc_a","doc_b").toPandas()
pd_new = variants["new_group"]().orderBy("doc_a","doc_b").toPandas()
assert pd_old.equals(pd_new), "MISMATCH"
print("EQUAL rows:", len(pd_old))
def run(fn):
    t0=time.perf_counter(); fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter()-t0
for v in variants.values(): run(v)
best={k:9e9 for k in variants}
for rep in range(5):
    for k,v in variants.items():
        best[k]=min(best[k], run(v))
print("BEST", {k: round(t,3) for k,t in best.items()})
