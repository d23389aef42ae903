"""MEASURED experiment (r10): does a THIRD NN-Descent round lift the sf0.1
edge-recall floor (r9 measured 0.50 at _KNN_ROUNDS=2), and what does it cost?

The r9 verdict's convergence story says NN-Descent needs ~O(log n) rounds and
_KNN_ROUNDS is a linear-cost knob; this probe puts numbers on the knob at
both fixture scales so the registered rounds=2 choice is a recorded tradeoff,
not a guess. Run: python tools/experiments/nn_descent_rounds_probe.py

Conclusion (2026-08-15 run, recorded per the opq_rotation_probe precedent):

    sf0.01 rounds=2: edge recall 0.806   (memo-warm build)
    sf0.01 rounds=3: edge recall 0.936   build 12.5s
    sf0.01 rounds=4: edge recall 0.955   build 13.1s
    sf0.1  rounds=2: edge recall 0.503   build 31.7s
    sf0.1  rounds=3: edge recall 0.690   build 41.5s
    sf0.1  rounds=4: edge recall 0.796   build 48.1s

The knob behaves exactly as the convergence story predicts: +0.19 recall at
sf0.1 for one extra round (+31% build), +0.29 for two (+52%). DECISION r10:
keep the REGISTERED _KNN_ROUNDS=2 this round — knn_graph_nn_descent and
graph_ann_search_topk are the r9 driver-hash-red rows whose
integer-score/atomic-memo fix is being re-checked, and changing their values
mid-re-check would make a second red unattributable. Flip to rounds=3 in r11
once CORRECTNESS_r10 confirms both rows green (one-line change; the oracle
CTE chain is generated per round and follows automatically).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import pyarrow.parquet as pq


def exact_edges(scale_dir, k=3):
    t = pq.read_table(os.path.join(scale_dir, "embeddings.parquet"))
    ids = np.array(t["vec_id"])
    V = np.array([np.array(x) for x in t["embedding"].to_pylist()], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 4)
    np.fill_diagonal(S, -2)
    edges = set()
    for i in range(len(ids)):
        top = sorted(range(len(ids)), key=lambda j: (-S[i, j], ids[j]))[:k]
        edges.update((int(ids[i]), int(ids[j])) for j in top)
    return edges


def main():
    from my_favorite_etl_pipeline_spark.session import get_spark
    import my_favorite_etl_pipeline_spark.plans.llm_ext7 as g7
    from my_favorite_etl_pipeline_spark.operators.similarity import knn_topk_edges

    spark = get_spark("nn-rounds-probe")
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        true = exact_edges(sf_dir, g7._KNN_K)
        for rounds in [2, 3, 4]:
            # pass n_rounds EXPLICITLY: the default arg is frozen at
            # definition time, so monkeypatching g7._KNN_ROUNDS never
            # reaches the build (found in the r14 review — the r12 run
            # predates the default-arg signature and read the global)
            t0 = time.perf_counter()
            _, work = g7._knn_refined_work(spark, sf_dir, n_rounds=rounds)
            top = knn_topk_edges(work.select("src_id", "nbr_id", "cos_sim"), g7._KNN_K)
            got = {(r.src_id, r.nbr_id) for r in top.collect()}
            dt = time.perf_counter() - t0
            rec = len(got & true) / len(true)
            print(f"{os.path.basename(sf_dir)} rounds={rounds}: edge recall "
                  f"{rec:.3f}  build {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
