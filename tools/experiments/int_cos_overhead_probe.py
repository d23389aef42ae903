"""MEASURED experiment (r11): what does the pure-integer quantized-cosine
contract COST versus the retired ROUND(float_cosine*1e4) formula on the
graph family's hot join?

The r11 rewrite (VERDICT r10 item 2) replaced the float dot + two float
sqrt norms + float multiply with an integer dot over FLOOR(v*1e4) vectors
and one nonnegative floor division. SCALE.md claims "same cost class, zero
new shuffles" — this probe puts a number on it: the within-cell pair join
of the base kNN graph (the family's dominant scoring site) timed at sf0.1
under both formulas, same join, same partitioning, 3 runs each, medians of
the full count() action.

Run: python tools/experiments/int_cos_overhead_probe.py [sf_dir]

Conclusion (2026-08-15 run, recorded per the nn_descent_rounds precedent):

    sf0.1 within-cell pair scoring (k=8 cells, 502,142 scored pairs,
    calm box — bench run D minutes earlier read box_factor 0.932,
    contention_spike false):
      float contract (retired):  median 1.55 s   (2.12 / 1.55 / 1.24)
      integer contract (r11):    median 1.62 s   (1.80 / 1.53 / 1.62)
      overhead: +4.5% on the scoring join in isolation — within the
      run-to-run spread of either variant

DECISION: the isolated-join overhead is inside noise and invisible
end-to-end — the benched graph entries read FLAT driver-comparable
(knn_graph_topk_auto_k 5.15-5.18 s across r11 runs vs r10's 5.3 s
builder band; graph_ann_search_topk 3.35-3.90 vs 3.5) — and it buys a
hash contract with NO IEEE-float surface at all. Keep the integer
contract unconditionally; revisit only if a future profile shows the
zip_with+aggregate pair dominating a hot path (the escape hatch would be
a single fused higher-order expression, not a return to floats).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from my_favorite_etl_pipeline_spark.operators.similarity import (
        dot,
        int_cos_x1e4,
        nearest_centroid,
        quantize_vectors,
    )
    from my_favorite_etl_pipeline_spark.session import get_spark
    from my_favorite_etl_pipeline_spark.sources.tables import load

    spark = get_spark("int-cos-overhead-probe")
    emb = load(spark, sf_dir, "embeddings")
    assign = quantize_vectors(nearest_centroid(emb, k=8)).persist()
    assign.count()  # materialize once so both variants read the same cache

    a = assign.select(
        F.col("vec_id").alias("src_id"), "cluster",
        F.col("__v").alias("av"), F.col("__n").alias("an"),
        F.col("__q").alias("aq"), F.col("__s").alias("asn"),
    )
    b = assign.select(
        F.col("vec_id").alias("nbr_id"), "cluster",
        F.col("__v").alias("bv"), F.col("__n").alias("bn"),
        F.col("__q").alias("bq"), F.col("__s").alias("bsn"),
    )
    pairs = a.join(b, "cluster").filter(F.col("src_id") != F.col("nbr_id"))

    float_score = (
        F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")) * 10000)
        .cast("long")
    )
    int_score = int_cos_x1e4(F.col("aq"), F.col("asn"), F.col("bq"), F.col("bsn"))

    n_pairs = pairs.count()
    print(f"{sf_dir}: {n_pairs} scored pairs per variant")
    for label, score in (("float (retired)", float_score), ("integer (r11)", int_score)):
        times = []
        for _ in range(3):
            t0 = time.time()
            # aggregate over the score column forces full evaluation of
            # every pair's formula without a driver-side collect
            pairs.select(score.alias("s")).agg(F.sum("s")).collect()
            times.append(time.time() - t0)
        med = statistics.median(times)
        print(f"  {label:18s} median {med:.2f} s  ({' / '.join(f'{t:.2f}' for t in times)})")


if __name__ == "__main__":
    main()
