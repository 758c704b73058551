import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from pyspark.sql import functions as F
from frinesis_spark.session import get_spark
from frinesis_spark.operators import similarity as S
from frinesis_spark.caches import cached
spark = get_spark("ab_lsh"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

def old_pairs():
    q, c = S._queries_and_candidates(spark, sf)
    qb = S._multiprobe(q, "query_id", "qe")
    cb = cached(S._LSH_INDEX_CACHE, spark, sf,
        lambda: S._bucketize(c, "neighbor_id", "ce").localCheckpoint(eager=True),
        table="embeddings")
    return (F.broadcast(qb).join(cb, ["band_idx", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())

def old_topk():
    q, c = S._queries_and_candidates(spark, sf)
    pairs = old_pairs()
    cand = pairs.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
    cos = S.cosine_from_norms(S.dot(F.col("qe"), F.col("ce")), F.col("qn"), F.col("cn"))
    return S._topk_output(cand.select("query_id","neighbor_id",cos.alias("cos")))

def old_full():
    return S._recall_check(spark, sf, old_topk(), S._LSH_RECALL_FLOOR_HITS)

def new_full():
    return S.q_similarity_ann_lsh(spark, sf)

po = old_full().toPandas(); pn = new_full().toPandas()
assert po.equals(pn), (po, pn)
print("EQUAL", po.to_dict())
def run(fn):
    t0=time.perf_counter(); fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter()-t0
for f in (old_full, new_full): run(f)
best={"old":9e9,"new":9e9}
for rep in range(5):
    best["old"]=min(best["old"], run(old_full))
    best["new"]=min(best["new"], run(new_full))
print("BEST", {k: round(t,3) for k,t in best.items()})
