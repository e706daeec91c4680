#!/usr/bin/env python
"""Isolate the InMemoryRelation encode cost of the LSH base tables
(VERDICT r9 item 2): for the minhash signature table and the jaccard
shingle base, time — interleaved within one session so epoch drift
cancels —

  noop             compute the base subtree, no persist (UDF cost floor)
  persist_count    persist(MEMORY_AND_DISK) + count  (UDF + columnar encode)
  cache_read       noop-sink over the warm cache     (decode/read cost)
  persist_nocmp    same encode with inMemoryColumnarStorage.compressed=false
  localckpt        localCheckpoint(eager=True)       (RDD bytes, no columnar encode)

Usage: python tools/measure_cache_encode.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from mare_spark.operators.dedup import (
        _fan_out,
        _minhash_base_udf,
        hashed_word_shingles,
    )
    from mare_spark.session import get_spark
    from mare_spark.tables import read_table

    spark = get_spark("measure_cache_encode")
    docs = read_table(spark, sf_dir, "documents")

    def mh_base():
        return (
            _fan_out(docs)
            .select(
                F.col("doc_id").alias("doc"),
                _minhash_base_udf(64, 3, 42)(F.col("text")).alias("mh"),
            )
            .select(
                "doc",
                F.col("mh.shingles").alias("shingles"),
                F.col("mh.sig").alias("sig"),
            )
        )

    def jc_base():
        return _fan_out(docs).select(
            F.col("doc_id").alias("doc"),
            hashed_word_shingles(F.col("text"), 3).alias("shingles"),
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    samples: dict[str, dict[str, list[float]]] = {}

    def run_once(tag, mk):
        out = samples.setdefault(tag, {})
        sc = spark.sparkContext

        sc.setJobDescription(f"{tag}: noop (no persist)")
        out.setdefault("noop", []).append(t(lambda: noop(mk())))

        sc.setJobDescription(f"{tag}: persist+count")
        p = mk().persist(StorageLevel.MEMORY_AND_DISK)
        out.setdefault("persist_count", []).append(t(p.count))
        sc.setJobDescription(f"{tag}: cache read")
        out.setdefault("cache_read", []).append(t(lambda: noop(p)))
        p.unpersist()

        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
        sc.setJobDescription(f"{tag}: persist+count (no compression)")
        p2 = mk().persist(StorageLevel.MEMORY_AND_DISK)
        out.setdefault("persist_nocmp", []).append(t(p2.count))
        p2.unpersist()
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")

        sc.setJobDescription(f"{tag}: localCheckpoint(eager)")
        holder = {}
        out.setdefault("localckpt", []).append(
            t(lambda: holder.update(d=mk().localCheckpoint(eager=True)))
        )
        sc.setJobDescription(f"{tag}: localckpt read")
        out.setdefault("localckpt_read", []).append(
            t(lambda: noop(holder["d"]))
        )
        sc.setJobDescription(None)

    for i in range(reps + 1):  # rep 0 = warm-up, dropped
        for tag, mk in (("mh_base", mh_base), ("jc_base", jc_base)):
            run_once(tag, mk)
            if i == 0:
                for vals in samples[tag].values():
                    vals.clear()

    for tag, by_var in samples.items():
        print(f"== {tag} (min / median over {reps} reps)")
        for var, vals in by_var.items():
            print(
                f"  {var:16s} min {min(vals):.3f}  med "
                f"{statistics.median(vals):.3f}  all {[round(v, 3) for v in vals]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
