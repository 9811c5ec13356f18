"""Round-11 second measurement set: sf0.1 -> sf1 scale rows for the
operators that LANDED this round (the r11_measure.py set covered the
r10 verdict's measurement-honesty items):

A. dedup_decontaminate_multimodal — the full cross-modal gate (pairs32
   banded image probe + broadcast-eval caption GEMM + union) via the
   registry callable itself, so the measured path IS the declared one.
B. triples11 vs bands16 at radius 3 — wall time for the radius-3
   image near-dup pairs under both blocking schemes, plus equal-count
   assertion (scheme equivalence re-proven at both SFs). At toy SF
   triples11's 20x explode dominates and bands16 wins; the recorded
   row documents the constant-factor cost paid for the n^2/2^32
   candidate law that wins past ~10^7 images.
C. BPE tokenizer — corpus token-count aggregate via the expression
   chain and via the Arrow kernel, both map-only: expected ~linear.

Prints one JSON line. Run on a quiet box (load < 0.5); needs
testdata_sf1/ (scripts/make_scale_data.py).
"""

from __future__ import annotations

import json
import os
import sys
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


def row_decon(spark, sf_dir):
    from torua_spark.queries import all_queries

    q = all_queries()["dedup_decontaminate_multimodal"]

    def run():
        q(spark, sf_dir).agg(
            F.count(F.lit(1)),
            F.sum(F.col("contaminated").cast("int")),
        ).collect()

    return {"sec": timed(run)}


def row_triples(spark, sf_dir):
    from torua_spark.operators import multimodal as mm
    from torua_spark.queries.rag_q import image_media_with_plants

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = mm.image_dhash(
        image_media_with_plants(docs).select("doc_id", "payload")
    ).localCheckpoint()
    n = hashed.count()
    out = {"n_images": n}
    for scheme in ("triples11", "bands16"):
        def run():
            run.count = mm.image_neardup_pairs(
                hashed, max_hamming=3, scheme=scheme
            ).count()

        out[scheme] = {"sec": timed(run), "pairs": run.count}
    assert out["triples11"]["pairs"] == out["bands16"]["pairs"], out
    return out


def row_bpe(spark, sf_dir):
    from torua_spark.functions import bpe
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).localCheckpoint()
    n = docs.count()

    def chain():
        docs.select(bpe.bpe_token_count("text").alias("n")).agg(
            F.sum("n")
        ).collect()

    def kernel():
        bpe.bpe_count_kernel(docs).agg(F.sum("n_bpe_tokens")).collect()

    return {"docs": n, "chain_sec": timed(chain), "kernel_sec": timed(kernel)}


def row_crossover(spark):
    """Chain-vs-kernel cost as a function of MERGE-TABLE SIZE at
    fixed corpus (sf0.1 documents): the chain is one string pass per
    rule (cost ~ rules x corpus bytes), the kernel is O(pre-token
    length x merges-applied) per row with a memo (cost ~ flat in
    rules). Trains larger tables on the sf0.01 corpus (bigger vocab
    than the fixture's sf0.001 -> more pre-saturation merges)."""
    from torua_spark.functions import bpe
    from torua_spark.sources.catalog import spread_small_scan

    train_docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = spread_small_scan(
        spark.read.parquet(f"{SF01}/documents.parquet")
    ).localCheckpoint()
    out = {}
    for n_rules in (96, 384, 1536):
        merges = bpe.bpe_train(train_docs, n_merges=n_rules)
        got = len(merges)

        def chain():
            docs.select(
                bpe.bpe_token_count("text", merges).alias("n")
            ).agg(F.sum("n")).collect()

        def kernel():
            bpe.bpe_count_kernel(docs, merges=merges).agg(
                F.sum("n_bpe_tokens")
            ).collect()

        out[f"rules_{n_rules}"] = {
            "trained": got,
            "chain_sec": timed(chain),
            "kernel_sec": timed(kernel),
        }
    return out


def main():
    spark = get_spark("r11b_measure", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    out = {}
    which = (sys.argv[1] if len(sys.argv) > 1 else "decon,triples,bpe"
             ).split(",")
    rows = {"decon": row_decon, "triples": row_triples, "bpe": row_bpe}
    if "crossover" in which:
        out["crossover"] = row_crossover(spark)
        which = [w for w in which if w != "crossover"]
    for name in which:
        a = rows[name](spark, SF01)
        b = rows[name](spark, SF1)
        entry = {"sf0.1": a, "sf1": b}
        if "sec" in a:
            entry["factor"] = round(b["sec"] / a["sec"], 2)
        out[name] = entry
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
