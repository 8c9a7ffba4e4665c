"""Stage-level profile of minhash_lsh_dedup's banded-LSH route (doc_neardup
shape) at a given SF: times shingle checkpoint, signature+band join candidate
count, hashed verify, and string verify separately.

Usage: python scripts/profile_neardup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from pyspark.sql import functions as F

    from mapping_analysis_spark.functions.simfns import make_minhash_udf
    from mapping_analysis_spark.functions.text import token_set_jaccard
    from mapping_analysis_spark.operators.blocking import lsh_band_pairs
    from mapping_analysis_spark.operators.dedup import word_shingles
    from mapping_analysis_spark.pipeline import BROADCAST_MAX_RECORDS
    from mapping_analysis_spark.session import get_spark

    spark = get_spark("profile-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    threshold, shingle_width, bands = 0.5, 3, 32
    out: dict[str, float] = {}

    def phase(name):
        class _P:
            def __enter__(self):
                sc.setJobDescription(name)
                self.t0 = time.time()

            def __exit__(self, *a):
                out[name] = round(time.time() - self.t0, 3)
                sc.setJobDescription(None)

        return _P()

    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    with phase("1_shingle_ckpt"):
        sh = (
            word_shingles(df, "text", shingle_width)
            .select(F.col("doc_id").cast("string").alias("rid"), "sg")
            .localCheckpoint(eager=True)
        )
        n_docs = sh.count()
    small = n_docs <= BROADCAST_MAX_RECORDS
    with phase("2_signature_build"):
        mh = make_minhash_udf(num_hashes=bands, shingle_width=1)
        sig = sh.select(
            "rid",
            F.size("sg").alias("n_sg"),
            mh(
                F.transform(F.col("sg"), lambda s: F.pmod(F.xxhash64(s), F.lit(4294967296)))
            ).alias("minhash"),
        ).localCheckpoint(eager=True)
        sig.count()
    with phase("3_band_join_candidates"):
        cand = lsh_band_pairs(
            sig, bands=bands, rows_per_band=1, broadcast_ok=small,
            size_col="n_sg", min_size_ratio=threshold,
        ).localCheckpoint(eager=True)
        n_cand = cand.count()
    margin = max(0.0, threshold - 0.05)
    with phase("4_hashed_verify"):
        hs = sh.select(
            "rid",
            F.array_distinct(F.transform(F.col("sg"), lambda s: F.xxhash64(s))).alias("hs"),
        )
        ha = hs.select(F.col("rid").alias("a_rid"), F.col("hs").alias("a_hs"), F.size("hs").alias("a_n"))
        hb = hs.select(F.col("rid").alias("b_rid"), F.col("hs").alias("b_hs"), F.size("hs").alias("b_n"))
        if small:
            ha, hb = F.broadcast(ha), F.broadcast(hb)
        inter = F.size(F.array_intersect("a_hs", "b_hs"))
        survivors = (
            cand.join(ha, "a_rid").join(hb, "b_rid")
            .filter(F.least("a_n", "b_n") >= F.lit(margin) * F.greatest("a_n", "b_n"))
            .withColumn("i", inter)
            .filter(F.col("i").cast("double") / (F.col("a_n") + F.col("b_n") - F.col("i")) >= F.lit(margin))
            .select("a_rid", "b_rid")
            .localCheckpoint(eager=True)
        )
        n_surv = survivors.count()
    with phase("5_string_verify"):
        a = sh.select(F.col("rid").alias("a_rid"), F.col("sg").alias("a_sg"))
        b = sh.select(F.col("rid").alias("b_rid"), F.col("sg").alias("b_sg"))
        if small:
            a, b = F.broadcast(a), F.broadcast(b)
        v = (
            survivors.join(a, "a_rid").join(b, "b_rid")
            .withColumn("sim", token_set_jaccard(F.col("a_sg"), F.col("b_sg")))
            .filter(F.col("sim") >= threshold)
        )
        n_out = v.count()
    out.update({"n_docs": n_docs, "n_cand": n_cand, "n_surv": n_surv, "n_out": n_out})
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
