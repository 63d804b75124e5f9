"""r7 optimization probe: where does the minhash_dedup bench section spend
its time?  Isolates sub-stages with the noop sink (guide §1.4) over the
same synthesized web corpus bench.py uses, and times candidate variants.

Run: PYTHONPATH=. python tools/r07_minhash_profile.py
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from imgfact_spark import synth
from imgfact_spark.io import TableStore
from imgfact_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"{name:55s} min={min(ts):7.3f}  all={ts}", flush=True)
    return min(ts)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="r07_minhash_profile", cpus=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    text_docs = int(os.environ.get("SPARK_GRAFT_BENCH_TEXT_DOCS", "20000"))
    tmp = tempfile.mkdtemp(prefix="r07_minhash_")
    try:
        store = TableStore(os.path.join(tmp, "textcorpus"))
        d = store.write(
            synth.synth_text_corpus(spark, text_docs, partitions=cpus * 2),
            "documents", input_fingerprint=f"synthtext:7:{text_docs}",
        )

        from imgfact_spark.functions.text import normalized_tokens
        from imgfact_spark.operators.dedup import (
            minhash_lsh_dup_pairs, minhash_signature, shingle_df,
        )
        from imgfact_spark.operators.util import ensure_parallelism

        # corpus volume facts
        sh = shingle_df(d, "text", "doc_id", n=3)
        n_sh = sh.select(F.sum(F.size("shingles"))).collect()[0][0]
        print(f"docs={text_docs} total distinct-in-doc shingles={n_sh}")

        # 0. tokenize only
        timeit(spark, "tokenize only (split)", lambda: noop(
            ensure_parallelism(d).select("doc_id", normalized_tokens("text").alias("t"))
        ))

        # 1. shingle build (current transform+slice)
        timeit(spark, "shingle_df current (transform+slice)", lambda: noop(sh))

        # 1b. shingle via zip_with chain (identical values candidate)
        def zip_shingles():
            toks = normalized_tokens("text")
            df2 = ensure_parallelism(d).select(
                F.col("doc_id"), toks.alias("_t")
            )
            num = F.greatest(F.size("_t") - F.lit(2), F.lit(1))
            a = F.slice("_t", 1, num)
            b = F.slice("_t", 2, num)
            c = F.slice("_t", 3, num)
            sh2 = F.array_distinct(
                F.zip_with(
                    F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)),
                    c,
                    lambda xy, z: F.concat_ws(" ", xy, z),
                )
            )
            noop(df2.select("doc_id", sh2.alias("shingles")))
        timeit(spark, "shingle via zip_with chain", zip_shingles)

        # 2. explode + ONE xxhash64 per shingle (no agg)
        timeit(spark, "explode + 1 xxhash64", lambda: noop(
            sh.select(F.col("doc_id"), F.explode_outer("shingles").alias("_sh"))
            .select("doc_id", F.xxhash64("_sh").alias("h"))
        ))

        # 3. current signature: 64 string-hash min aggs
        timeit(spark, "minhash_signature current (64 str-hash aggs)", lambda: noop(
            minhash_signature(sh, "doc_id", num_hashes=64)
        ))

        # 4. variant: pre-hash string once, 64 long-fold hash aggs
        def sig_prehash():
            ex = sh.select(
                F.col("doc_id"), F.explode_outer("shingles").alias("_sh")
            ).select("doc_id", F.xxhash64("_sh").alias("_h0"))
            aggs = [
                F.min(F.xxhash64("_h0", F.lit(i))).alias(f"_h{i}")
                for i in range(64)
            ]
            g = ex.groupBy("doc_id").agg(*aggs)
            noop(g.select(
                "doc_id",
                F.array(*[F.col(f"_h{i}") for i in range(64)]).alias("sig"),
            ))
        timeit(spark, "signature variant (pre-hash + 64 long aggs)", sig_prehash)

        # 5. full current section (signature + band join + count)
        def full_current():
            sig = minhash_signature(sh, "doc_id", num_hashes=64)
            minhash_lsh_dup_pairs(sig, "doc_id", bands=16, rows_per_band=4).count()
        timeit(spark, "FULL current minhash section", full_current)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
