"""Fine-grained sub-phase profile of candidate_pairs+scoring at one core
count. Usage: python scripts/profile_fine.py <cores> [sf_dir]"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(cores: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from mapping_analysis_spark.data.transcripts import ensure_transcripts
    from mapping_analysis_spark.functions.simfns import make_minhash_udf
    from mapping_analysis_spark.functions.text import token_set_jaccard
    from mapping_analysis_spark.operators.blocking import block_pairs, lsh_band_pairs
    from mapping_analysis_spark.operators.clustering import connected_components
    from mapping_analysis_spark.pipeline import (
        DEFAULT_LSH_BANDS,
        DEFAULT_MAX_BLOCK_SIZE,
        DEFAULT_THRESHOLD,
        conversation_records,
        doc_shingles,
        multi_block_keys,
    )
    from mapping_analysis_spark.session import get_spark

    spark = get_spark(f"fine-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(ensure_transcripts(sf_dir)).repartition(cores * 2)
    t = t.localCheckpoint(eager=True)
    t.count()

    for run in range(2):
        ph: dict[str, float] = {}
        t0 = time.time()

        def mark(name):
            nonlocal t0
            now = time.time()
            ph[name] = round(now - t0, 2)
            t0 = now

        rec0 = conversation_records(t)
        rec0 = rec0.localCheckpoint(eager=True)
        mark("a_records")

        rec = rec0.withColumn("_tk", F.split(F.col("doc"), " "))
        rec = rec.withColumn(
            "toks",
            F.array_distinct(
                F.transform(F.filter(F.col("_tk"), lambda x: x != F.lit("")), lambda x: F.xxhash64(x))
            ),
        )
        rec = rec.withColumn(
            "sg",
            F.array_distinct(
                F.transform(doc_shingles(F.col("_tk")), lambda s: F.pmod(F.xxhash64(s), F.lit(4294967296)))
            ),
        ).drop("_tk")
        rec = rec.select("rid", "source", "early", "toks", "sg").localCheckpoint(eager=True)
        mark("b_featurize")

        blk = multi_block_keys(rec)
        sizes = blk.groupBy("bk").agg(F.count("*").alias("_bn"))
        ok_blocks = sizes.filter(F.col("_bn") <= DEFAULT_MAX_BLOCK_SIZE).select("bk")
        slim = blk.join(F.broadcast(ok_blocks), "bk", "left_semi")
        bp = block_pairs(slim, block_col="bk").select("a_rid", "b_rid").localCheckpoint(eager=True)
        mark("c_prefix_pairs")

        mh = make_minhash_udf(num_hashes=DEFAULT_LSH_BANDS, shingle_width=1)
        sig = rec.select("rid", mh(F.col("sg")).alias("minhash")).localCheckpoint(eager=True)
        mark("d_minhash")
        lp = lsh_band_pairs(sig, bands=DEFAULT_LSH_BANDS, rows_per_band=1).localCheckpoint(eager=True)
        mark("e_lsh_pairs")

        id_pairs = bp.union(lp.select("a_rid", "b_rid")).dropDuplicates(["a_rid", "b_rid"])
        id_pairs = id_pairs.localCheckpoint(eager=True)
        mark("f_dedup_ids")

        n_part = cores * 2
        a = rec.select(F.col("rid").alias("a_rid"), F.col("source").alias("a_source"),
                       F.col("toks").alias("a_toks")).hint("shuffle_hash")
        b = rec.select(F.col("rid").alias("b_rid"), F.col("source").alias("b_source"),
                       F.col("toks").alias("b_toks")).hint("shuffle_hash")
        pairs = (
            id_pairs.repartition(n_part, "a_rid").join(a, "a_rid")
            .repartition(n_part, "b_rid").join(b, "b_rid")
            .filter(F.col("a_source") != F.col("b_source"))
        )
        edges = (
            pairs.withColumn("sim", token_set_jaccard(F.col("a_toks"), F.col("b_toks")))
            .filter(F.col("sim") >= DEFAULT_THRESHOLD)
            .select(F.col("a_rid").alias("a"), F.col("b_rid").alias("b"))
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()
        mark("g_join_score")

        comp = connected_components(edges)
        comp_n = comp.count()
        mark("h_cc")

        print(json.dumps({"run": run, "cores": cores, "edges": n_edges, "comp": comp_n,
                          "phases": ph, "total": round(sum(ph.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.5")
