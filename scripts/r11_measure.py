"""Round-11 targeted sf0.1 -> sf1 measurements (VERDICT r10 #2/#4/#7):

A. semantic_dedup(hierarchical=True) with LAW-SIZED k1
   (k1 = ceil(n / target^2), level-2 groups ~target^2 rows), replacing
   the r10 demo row (k1=4 forced, ~n/4 rows per local Lloyd).
B. IVF kNN serving at FIXED query count across 10x corpus growth,
   once with the law-sized codebook (k = ceil(n/128)) and once with
   the declared entry's oracle-tractable fixed k=16 — decomposing the
   conflated 3.87x streaming_knn row.
C. ExactSubstr index COMPACTION step alone (the r10 lifecycle row
   aggregated write+probe+append+compact+probe).

Prints one JSON line per row. Run on a quiet box (load < 0.5).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from torua_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
)


def timed(fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def row_hier(spark, sf_dir, target=16):
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k1 = max(2, math.ceil(n / (target * target)))

    def run():
        sim.semantic_dedup(
            emb, cell_col=None, target_cell=target, max_k=k1,
            hierarchical=True,
        ).agg(F.count(F.lit(1)), F.sum(F.col("kept").cast("int"))).collect()

    return {"n": n, "k1": k1, "sec": timed(run)}


def row_knn_fixed_queries(spark, sf_dir, queries, k):
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = tempfile.mkdtemp(prefix="r11_knn_")
    path = f"{base}/ivf"
    sim.ivf_index_write(emb, path, kmeans_k=k)

    def run():
        sim.ivf_index_knn_batch(
            spark, path, queries, sim.KNN_K, sim.KNN_NPROBE
        ).agg(F.count(F.lit(1))).collect()

    sec = timed(run)
    shutil.rmtree(base)
    return {"corpus": emb.count(), "k": k, "sec": sec}


def row_compact(spark, sf_dir):
    from torua_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    t = (max_id + 1) * 4 // 5
    base = tempfile.mkdtemp(prefix="r11_substr_")
    idx = f"{base}/idx"
    dd.exact_substring_index_write(docs.filter(F.col("doc_id") < t), idx)
    dd.exact_substring_index_append(
        spark, idx, docs.filter(F.col("doc_id") >= t)
    )
    # compaction is a one-shot rewrite; time the single run, twice via
    # re-preparing the appended tree (copy the appended state aside)
    snap = f"{base}/snap"
    shutil.copytree(idx, snap)
    secs = []
    for _ in range(2):
        shutil.rmtree(idx)
        shutil.copytree(snap, idx)
        t0 = time.perf_counter()
        rep = dd.exact_substring_index_compact(spark, idx)
        secs.append(time.perf_counter() - t0)
    shutil.rmtree(base)
    return {"sec": min(secs), "report": rep}


def main():
    spark = get_spark("r11_measure", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    out = {}
    which = (sys.argv[1] if len(sys.argv) > 1 else "hier,knn,compact").split(",")
    if "hier" in which:
        a = row_hier(spark, SF01)
        b = row_hier(spark, SF1)
        out["hier_law"] = {"sf0.1": a, "sf1": b,
                           "factor": round(b["sec"] / a["sec"], 2)}
    if "knn" in which:
        q = spark.read.parquet(f"{SF01}/embeddings.parquet").localCheckpoint()
        n01 = q.count()
        for label, k01, k1x in (
            ("law", math.ceil(n01 / 128), math.ceil(10 * n01 / 128)),
            ("fixed16", 16, 16),
        ):
            a = row_knn_fixed_queries(spark, SF01, q, k01)
            b = row_knn_fixed_queries(spark, SF1, q, k1x)
            out[f"knn_fixedq_{label}"] = {
                "sf0.1": a, "sf1": b,
                "factor": round(b["sec"] / a["sec"], 2),
            }
    if "compact" in which:
        a = row_compact(spark, SF01)
        b = row_compact(spark, SF1)
        out["substr_compact"] = {"sf0.1": a, "sf1": b,
                                 "factor": round(b["sec"] / a["sec"], 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
