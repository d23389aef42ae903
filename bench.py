"""Headline benchmark — the driver's per-round performance probe.

Runs a representative subset of the registered queries (one per operator
family: scan+agg, multi-join, window, merge, explode+agg, LSH dedup, vector
top-k, ETL transform chain) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_wall_sec", "value": <sum of per-query medians>,
     "unit": "sec", "queries": {"q1_pricing_summary": <median sec>, ...},
     "sf": 0.1, "runs": 3, "per_run_totals": [..]}

MEDIAN PROTOCOL (BASELINE.md): single-run totals on this box swing ±15-25%
(JIT, page cache, thread scheduling), so each query is warmed once and then
timed ``--runs N`` times (default 3, env ``SPARK_GRAFT_BENCH_RUNS``);
``queries`` holds per-query MEDIANS and ``value`` is their sum. The raw
per-run totals are kept alongside so round-over-round noise stays visible.

Each query executes through a ``noop`` sink so the full plan runs on the
executors without driver-side materialization (collect would bottleneck on
the driver and measure the wrong thing).
"""

from __future__ import annotations

import json
import os
import re
import statistics
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
    # round 5: exact-substring span dedup (gram join + islands merge) — the
    # 20th entry; when comparing totals to pre-r5 rounds subtract this row
    # (BASELINE.md tracks both the comparable-19 and full totals)
    "exact_span_dedup_20tok",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    runs = max(1, runs)

    from my_favorite_etl_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    per_run: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm: JVM/JIT + file listing
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        per_run[name] = samples

    medians = {name: round(statistics.median(s), 3) for name, s in per_run.items()}
    per_run_totals = [
        round(sum(per_run[name][i] for name in HEADLINE), 3) for i in range(runs)
    ]
    total = round(sum(medians.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": medians,
                "sf": sf,
                "runs": runs,
                "per_run_totals": per_run_totals,
            }
        )
    )


if __name__ == "__main__":
    main()
