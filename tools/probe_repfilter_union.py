import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from pyspark.sql import functions as F
from frinesis_spark.session import get_spark
from frinesis_spark.catalog import table
from frinesis_spark import registry
spark = get_spark("ab_rep"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
qs = registry.queries()
# EXAMINED AND REJECTED (r16): "old" is the registered two-branch +
# left-join form; "new" was a tagged-union single-pipeline rewrite
# (2 exchanges, no join, one scan). Three interleaved min-of-5 A/Bs
# measured -8% / +4% / +9% — a wash-to-worse locally, so the
# registered plan stays. new_fn below reconstructs the rejected form.
new_fn = lambda: qs["text_repetition_filter"](spark, sf)

def old_fn():
    from frinesis_spark import tuning
    tuning.apply_shape_conf(spark, "text_repetition_filter")
    d = table(spark, sf, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    base = d.select("doc_id", words.alias("ws"))
    wcnt = (base.select("doc_id", F.explode("ws").alias("w"))
            .groupBy("doc_id", "w").count())
    wagg = wcnt.groupBy("doc_id").agg(
        F.sum("count").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("count").alias("top_word_n"))
    bigrams = F.expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"
    )
    bcnt = (base.where(F.size("ws") >= 2)
            .select("doc_id", F.explode(bigrams).alias("b"))
            .groupBy("doc_id", "b").count())
    bagg = bcnt.groupBy("doc_id").agg(
        F.sum("count").alias("n_bigrams"),
        F.max("count").alias("top_bigram_n"))
    n_w = F.col("n_words"); top_w = F.col("top_word_n"); top_b = F.col("top_bigram_n")
    return wagg.join(bagg, "doc_id", "left").select(
        "doc_id", "n_words",
        (F.col("n_distinct").cast("double") / n_w).alias("distinct_ratio"),
        (top_w.cast("double") / n_w).alias("top_word_ratio"),
        (top_b.cast("double") / F.col("n_bigrams")).alias("top_bigram_ratio"),
        ((top_w * 100 > n_w * 30)
         | F.coalesce(top_b * 100 > F.col("n_bigrams") * 18, F.lit(False))
        ).alias("repetitive"),
    )

po = old_fn().orderBy("doc_id").toPandas()
pn = new_fn().orderBy("doc_id").toPandas()
import pandas as pd
pd.testing.assert_frame_equal(po, pn)
print("EQUAL rows:", len(po), "dtypes match")
def run(fn):
    t0=time.perf_counter(); fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter()-t0
for f in (old_fn, new_fn): run(f)
best={"old":9e9,"new":9e9}
for rep in range(5):
    best["old"]=min(best["old"], run(old_fn))
    best["new"]=min(best["new"], run(new_fn))
print("BEST", {k: round(t,3) for k,t in best.items()})
