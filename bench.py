"""Headline benchmark — the driver's per-round performance probe.

Runs a representative subset of the registered queries (one per operator
family: scan+agg, multi-join, window, merge, explode+agg, LSH dedup, vector
top-k, ETL transform chain) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_wall_sec", "value": <total>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query executes through a ``noop`` sink so the full plan runs on the
executors without driver-side materialization (collect would bottleneck on
the driver and measure the wrong thing).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "transform_chain",
    "merge_upsert",
    "top_orders_per_customer",
    "term_frequencies_top50",
    "dedup_fingerprint_groups",
    "minhash_near_dups",
    "embedding_topk_bruteforce",
    # heavy [EXT] paths — regressions on the LLM-data pipeline must be
    # visible round over round, not just the relational core
    "dedup_cluster_components",
    "pack_sequences_1024",
    "scd2_status_history",
    "stream_tumbling_hourly",
    "nested_transform_chain",
    "skew_zipf_top_users",
    # curation round 3: decontamination join + map-only fingerprinting +
    # sparse similarity search
    "contamination_13gram",
    "winnowing_fingerprints",
    "tfidf_topk_similar_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from my_favorite_etl_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm: JVM/JIT + file listing
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
