"""A/B prototype: packed-long pair key for link_prediction's wedge
aggregate (round-6 'not yet optimized' item).  Measures the original
graph.link_prediction against a packed variant on the sf0.1 part
co-order graph and asserts identical output rows.  Scratch tool only.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pynomaly_spark.graph import link_prediction
from pynomaly_spark.session import get_spark
from pynomaly_spark.similarity import two_phase_topk

K = 20
MAXD = 8192


def edges(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    x = op.select(F.col("o"), F.col("p").alias("pa"))
    y = op.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    return x.join(
        y, (F.col("o") == F.col("o2")) & (F.col("pa") < F.col("pb"))
    ).select(F.col("pa").alias("src"), F.col("pb").alias("dst"))


def packed_lp(edges_df, k=K, max_degree=MAXD):
    a, b = F.col("src"), F.col("dst")
    und = (
        edges_df.where(a.isNotNull() & b.isNotNull() & (a != b))
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    checked = F.when(
        F.col("deg") <= int(max_degree), F.col("node")
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("hub: node="), F.col("node").cast("string"))
        ).cast(und.schema["u"].dataType)
    )
    apexes = deg.select(checked.alias("z"))
    sym = (
        und.select(F.col("u").alias("z"), F.col("v").alias("n"))
        .unionAll(und.select(F.col("v").alias("z"), F.col("u").alias("n")))
        .join(apexes, "z")
    )
    right = sym.select(F.col("z").alias("_z2"), F.col("n").alias("y"))
    two32 = F.lit(4294967296).cast("long")
    cn = (
        sym.join(
            right,
            (F.col("z") == F.col("_z2")) & (F.col("n") < F.col("y")),
        )
        .groupBy(
            (F.col("n").cast("long") * two32 + F.col("y").cast("long")).alias(
                "xy"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    existing = und.select(
        (F.col("u").cast("long") * two32 + F.col("v").cast("long")).alias("xy")
    )
    cand = cn.join(existing, ["xy"], "left_anti")
    top = two_phase_topk(
        cand,
        [],
        [F.col("common").desc(), F.col("xy").asc()],
        int(k),
        rank_col="rnk",
        phase1=False,
    )
    return top.select(
        F.col("rnk").cast("long").alias("rnk"),
        F.expr("xy div 4294967296").cast("int").alias("x"),
        F.pmod(F.col("xy"), two32).cast("int").alias("y"),
        "common",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("lp-pack-ab")
    e = edges(spark, sf_dir)

    def run(label, df):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s")
        return dt

    # warm-up scans
    e.write.mode("overwrite").format("noop").save()

    orig = link_prediction(e, k=K, max_degree=MAXD).orderBy("rnk")
    pack = packed_lp(e).orderBy("rnk")
    for i in range(2):
        run(f"orig-{i}", orig)
        run(f"pack-{i}", pack)

    ro = [tuple(r) for r in orig.collect()]
    rp = [tuple(r) for r in pack.collect()]
    print("rows equal:", ro == rp)
    if ro != rp:
        for o, p in zip(ro, rp):
            if o != p:
                print("  diff:", o, p)


if __name__ == "__main__":
    main()
