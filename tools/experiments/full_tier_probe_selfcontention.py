"""Measured probe (r10, post-gate): is the FULL tier's `contention_spike`
self-induced?

Both r10 final-bench runs tripped `contention_spike: true` with the spike
localized to the full tier (full_box_factor 1.296 / 1.789) while the
headline tier on the same box read calm (0.939 / 0.714). Hypothesis: the
interleaved fixed-work JVM probe that runs IMMEDIATELY BEFORE each query's
timing block is itself slowed by the PREVIOUS heavy query's tail (GC of a
multi-GB shuffle's spill structures, executor-thread wind-down), so the
full tier's box factor partially measures the benchmark's own wake, not
host contention.

Method: in one warm session, time the same fixed-work probe (a) after 2 s
of idle, x5, and (b) immediately after each of three heavy full-tier
queries (ivf_pq, stream_ingest_dedup, rrf) with no idle gap, x3 each.
If (b) >> (a) on an otherwise idle box, the hypothesis holds.

CONCLUSION (measured 2026-08-15, idle box, local[32]): **hypothesis
REFUTED.** Probes fired with NO gap after each heavy query read
0.06-0.21 s — statistically indistinguishable from (often FASTER than)
the 2 s-settled and idle probes (0.10-0.23 s), and nowhere near the >3x
spike gate (0.42 s at the 0.14 reference):

    idle (2s settle):            0.195 0.228 0.166 0.168 0.178
    ivf_pq        wake/settled:  0.205 0.173 0.162 / 0.103 0.124 0.122
    ingest_dedup  wake/settled:  0.073 0.064 0.083 / 0.080 0.069 0.087
    rrf           wake/settled:  0.163 0.144 0.141 / 0.107 0.205 0.119

So a heavy query's tail does NOT inflate the next interleaved probe on
an idle box, and the full-tier `contention_spike: true` readings in the
two r10 final-bench runs were GENUINE transient host contention at those
minutes (consistent with the ivf_pq 31.9 s outlier reverting to its
9-10 s band in the same session's other runs). Implication for r11:
the r9 interleaved-probe normalization rule stands as-is — no settle
window, no probe-placement change; a spiked full tier means "re-run on
a calmer box or report raw with factors", exactly what BASELINE r10
does. (Negative result recorded per the OPQ-probe precedent.)
"""

import sys, time

sys.path.insert(0, "/root/repo")

from my_favorite_etl_pipeline_spark import caching
from my_favorite_etl_pipeline_spark.session import get_spark
import my_favorite_etl_pipeline_spark as engine


def fixed_work_probe(spark) -> float:
    t0 = time.time()
    spark.range(0, 20_000_000, 1, 8).selectExpr("sum(id * 3 % 7)").collect()
    return time.time() - t0


def main() -> None:
    spark = get_spark("probe-selfcontention")
    qs = engine.queries()
    sf = "/root/testdata/sf0.1"
    fixed_work_probe(spark)  # JIT warm
    idle = []
    for _ in range(5):
        time.sleep(2.0)
        idle.append(fixed_work_probe(spark))
    print(f"idle probes (2s settle): {[f'{x:.3f}' for x in idle]}")
    for name in ("embedding_topk_ivf_pq", "stream_ingest_dedup_ssjoin",
                 "rrf_hybrid_fusion_topk"):
        wake, settled = [], []
        for _ in range(3):
            with caching.materialized_scope():
                qs[name](spark, sf).collect()
            wake.append(fixed_work_probe(spark))  # no gap
            time.sleep(2.0)
            settled.append(fixed_work_probe(spark))  # 2s settle
        print(
            f"{name:28s} wake={[f'{x:.3f}' for x in wake]}"
            f" settled={[f'{x:.3f}' for x in settled]}"
        )


if __name__ == "__main__":
    main()
