"""r12 measurements: the production-sized (32k-rule) BPE kernel path
end-to-end (VERDICT r11 #3) — wall-clock + divergence bands for
SCALE.md. Run: python scripts/r12_measure.py [sf_dir ...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from torua_spark.functions import bpe
from torua_spark.operators import sampling as smp
from torua_spark.session import get_spark
from torua_spark.sources.catalog import load_table, spread_small_scan


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_sf1"]
    spark = get_spark("r12_measure", cpus=32)
    large = bpe.load_merges_large()
    v1 = bpe.load_merges()
    for d in dirs:
        docs = spread_small_scan(load_table(spark, d, "documents"))
        docs.count()  # warm scan
        for label, merges in (("v1_96", v1), ("large_32768", large)):
            t0 = time.perf_counter()
            kc = bpe.bpe_count_kernel(docs, merges=merges)
            total, ndocs = kc.agg(F.sum("n_bpe_tokens"), F.count(F.lit(1))).collect()[0]
            t_count = time.perf_counter() - t0
            t0 = time.perf_counter()
            packed = smp.pack_sequences(docs, token_counts=bpe.bpe_count_kernel(docs, merges=merges))
            nseq = packed.count()
            t_pack = time.perf_counter() - t0
            t0 = time.perf_counter()
            capped = smp.source_cap(docs, cap=50)
            # budget the capped mix in kernel tokens (the join form)
            cap_tok = capped.select("doc_id").join(
                bpe.bpe_count_kernel(docs, merges=merges), "doc_id"
            ).agg(F.sum("n_bpe_tokens")).collect()[0][0]
            t_cap = time.perf_counter() - t0
            print(f"{d} {label}: docs={ndocs} tokens={total} "
                  f"count={t_count:.2f}s pack={t_pack:.2f}s nseq={nseq} "
                  f"cap_tokens={cap_tok} cap={t_cap:.2f}s")
        ws = docs.select(F.size(F.split(F.trim(F.col("text")), " +")).alias("n")).agg(F.sum("n")).collect()[0][0]
        print(f"{d} whitespace_tokens={ws}")
    spark.stop()


if __name__ == "__main__":
    main()
