"""MEASURED experiment (r13): with the rounds knob at its measured plateau
(_KNN_ROUNDS=4), which structural knob is the next recall lever — the
working-list WIDTH (_KNN_W, top-W edges kept per node between rounds), the
two-hop fan-out CAP (_KNN_CAP, top-cap adjacency each round expands), or
both?

Run: python tools/experiments/nn_descent_width_probe.py

Conclusion (2026-08-16 run, rounds=4 fixed, the rounds-probe protocol;
sf0.1 baseline W=16 CAP=16 → edge recall 0.796, build ~43s):

    sf0.01 W=16          : 0.955  21.8s   (registered values)
    sf0.01 W=24          : 0.958  13.7s
    sf0.01 W=32          : 0.958  13.2s
    sf0.1  W=16          : 0.796  42.6s   (registered values)
    sf0.1  W=24          : 0.799  42.9s   <- width ALONE buys +0.003
    sf0.1  W=32          : 0.798  44.0s
    sf0.1  W=16 CAP=24   : 0.862  49-61s  <- cap alone buys +0.066
    sf0.1  W=16 CAP=32   : 0.862  49.0s   (cap saturates at W=16)
    sf0.1  W=24 CAP=24   : 0.958  61.3s   <- JOINT: +0.162 for ~+43% build
    sf0.1  W=32 CAP=32   : 0.994  85.4s   <- +0.198 for ~+98% build

The hypothesis "width is the next lever" was WRONG and the probe caught
it: with CAP=16 the two-hop candidate volume is fan-out-bound, so extra
working-list width never reaches the expansion (W alone: +0.003). CAP
alone helps (+0.066) but saturates — the wider expansion has only a
16-wide list to draw from. The JOINT flip is where the convergence
actually lives: (W, CAP) = (24, 24) reads 0.958 at sf0.1 — better than
round 5 could plausibly buy (round 4 added +0.106) at a similar cost, and
near-exact (0.994) is available at (32, 32) for ~2× build if a future
round wants it.

DECISION r13: record only — the registered (16, 16) stays this round (the
r13 window just re-proved the whole graph family through the rounds flip
and the totality fallback; changing the family's VALUES in the same round
would confound a driver red, the r10/r12 freeze discipline). Flip
(_KNN_W, _KNN_CAP) to (24, 24) in r14 once CORRECTNESS_r13 lands green,
re-pinning the recall floors (ND sf0.1 floor 0.65 → ~0.85) and
re-measuring the graph bench band, exactly the rounds-flip playbook.
Note _KNN_CAP is currently DERIVED (2·(_KNN_K + _KNN_SEEDS)); the flip
should make it an explicit constant so the derivation doesn't silently
re-bind if K/SEEDS ever change.
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

    spark = get_spark("nn-width-probe")
    grid = [(16, 16), (24, 16), (32, 16), (16, 24), (16, 32), (24, 24), (32, 32)]
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        true = exact_edges(sf_dir, g7._KNN_K)
        for w, cap in grid:
            # r14: (w, cap) are EXPLICIT parameters of the build (the
            # globals became default args, which Python freezes at
            # definition time — monkeypatching g7._KNN_W/_KNN_CAP no
            # longer reaches the build and would silently measure the
            # registered constants at every grid point)
            t0 = time.perf_counter()
            _, work = g7._knn_refined_work(
                spark, sf_dir, n_rounds=g7._KNN_ROUNDS, w=w, cap=cap
            )
            top = knn_topk_edges(
                work.select("src_id", "nbr_id", "cos_sim"), g7._KNN_K
            )
            got = {(r.src_id, r.nbr_id) for r in top.collect()}
            dt = time.perf_counter() - t0
            rec = len(got & true) / len(true)
            print(
                f"{os.path.basename(sf_dir)} W={w} CAP={cap}: edge recall "
                f"{rec:.3f}  build {dt:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
