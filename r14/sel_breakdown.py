import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from healthcare_data_lakehouse_spark.session import get_spark
from healthcare_data_lakehouse_spark.functions import dedup as D
from healthcare_data_lakehouse_spark.queries.llm_dedup import _DupEvalBase, _TRUTH_MAX_DF
from healthcare_data_lakehouse_spark.tables import TABLE_NAMES, table

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("selbreak")
for t in TABLE_NAMES: table(spark, sf_dir, t).count()

def tm(label, fn):
    t0=time.time(); r=fn(); print(f"{label:32s} {time.time()-t0:6.2f}s", flush=True); return r

for it in range(2):
    spark.catalog.clearCache()
    base = _DupEvalBase(spark, sf_dir)
    tm("docs persist+count", lambda: base.docs.count())
    tm("sets persist+count", lambda: base.sets.count())
    tm("per_doc persist+count", lambda: base.per_doc.count())
    tm("cand persist+count", lambda: base.cand.count())
    # truth arm (new shape)
    sets = base.sets
    tsh = sets.select("sid", F.size("shset").alias("sz"), F.explode("shset").alias("shingle"))
    tgrp = (tsh.groupBy("shingle")
        .agg(F.collect_list(F.struct("sid", "sz")).alias("xs"))
        .filter(F.size("xs") <= _TRUTH_MAX_DF))
    xs = F.col("xs")
    tpairs = F.flatten(F.transform(xs, lambda a: F.transform(
        F.filter(xs, lambda b: (b["sid"] > a["sid"]) & (F.least(a["sz"], b["sz"]) >= 0.5 * F.greatest(a["sz"], b["sz"]))),
        lambda b: F.struct(a["sid"].alias("id_a"), b["sid"].alias("id_b")))))
    tcand = (tgrp.select(F.explode(tpairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")).distinct())
    tm("tcand count", lambda: tcand.count())
    seta = sets.select(F.col("sid").alias("id_a"), F.col("shset").alias("set_a"))
    setb = sets.select(F.col("sid").alias("id_b"), F.col("shset").alias("set_b"))
    t_inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    truth = (tcand.join(seta, "id_a").join(setb, "id_b")
        .filter(t_inter.cast("double") / (F.size("set_a") + F.size("set_b") - t_inter) >= 0.5)
        .select("id_a", "id_b").persist())
    tm("truth persist+count", lambda: truth.count())
    docs = base.docs
    tm("exact arm", lambda: docs.groupBy(F.md5("text").alias("h")).agg(F.count(F.lit(1)).alias("s")).agg((F.sum(F.col("s")*(F.col("s")-1)).cast("bigint")/2).cast("bigint").alias("n")).count())
    sig = D.simhash32(docs).select("doc_id", *[F.shiftright(F.col("simhash"), 8*b).bitwiseAND(F.lit(255)).alias(f"k{b}") for b in range(4)]).persist()
    tm("simhash sig persist+count", lambda: sig.count())
    subset_structs = []
    for mask in range(1, 16):
        keys = [F.col(f"k{b}") for b in range(4) if (mask >> b) & 1]
        sign = 1 if bin(mask).count("1") % 2 == 1 else -1
        subset_structs.append(F.struct(F.lit(mask).alias("mask"), F.lit(sign).alias("sign"),
            F.concat_ws(",", *[k.cast("string") for k in keys]).alias("key")))
    sim_count = (sig.select(F.explode(F.array(*subset_structs)).alias("sub"))
        .groupBy("sub.mask", "sub.key").agg(F.count(F.lit(1)).alias("s"), F.first("sub.sign").alias("sign"))
        .agg(F.sum(F.col("sign")*F.col("s")*(F.col("s")-1)/2).cast("bigint").alias("n")))
    tm("sim inclusion-exclusion", lambda: sim_count.count())
    tm("lsh verify semi", lambda: base.cand.join(F.broadcast(truth), ["id_a","id_b"], "left_semi").count())
