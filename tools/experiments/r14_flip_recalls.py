"""r14 post-flip recall measurement: one pass over every recall number the
(_KNN_W, _KNN_CAP) = (24, 24) joint flip can move, at both scales, so the
floors in tests/test_recall_scales.py are re-pinned from MEASUREMENTS (the
r13 rounds-flip playbook, VERDICT r13 items 1 and 4 — one coherent floor
table in BASELINE.md rather than per-entry re-pins).

Run: python tools/experiments/r14_flip_recalls.py
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


def exact_top20(scale_dir, qid=0):
    t = pq.read_table(os.path.join(scale_dir, "embeddings.parquet"))
    ids = np.array(t["vec_id"])
    V = np.array([np.array(x) for x in t["embedding"].to_pylist()], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    q = Vn[list(ids).index(qid)]
    s = np.round(Vn @ q, 4)
    order = sorted(range(len(ids)), key=lambda j: (-s[j], ids[j]))[:20]
    return {int(ids[j]) for j in order}


def main():
    import my_favorite_etl_pipeline_spark as engine
    from my_favorite_etl_pipeline_spark.session import get_spark

    spark = get_spark("r14-flip-recalls")
    qs = engine.queries()
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        tag = os.path.basename(sf_dir)
        true = exact_edges(sf_dir, 3)
        t0 = time.time()
        nd = {(r.src_id, r.nbr_id) for r in qs["knn_graph_nn_descent"](spark, sf_dir).collect()}
        build_s = time.time() - t0
        print(f"{tag} nn_descent edge recall: {len(nd & true) / len(true):.3f}  "
              f"(build+topk {build_s:.1f}s)", flush=True)

        exact20 = exact_top20(sf_dir)
        for name in ("graph_ann_search_topk", "hnsw_two_layer_search",
                     "hnsw_three_layer_search"):
            t0 = time.time()
            got = {r.vec_id for r in qs[name](spark, sf_dir).collect()}
            print(f"{tag} {name} recall@20: {len(exact20 & got) / 20:.3f}  "
                  f"({time.time() - t0:.1f}s, memoized graph)", flush=True)

        # batch arms: per-query recall@10 averaged over the batch panel
        for name in ("graph_ann_search_batch", "hnsw_batch_routed_search"):
            t0 = time.time()
            rows = qs[name](spark, sf_dir).collect()
            el = time.time() - t0
            byq = {}
            for r in rows:
                byq.setdefault(r.query_id, set()).add(r.vec_id)
            recs = []
            for qid, got in sorted(byq.items()):
                # batch arms return top-10 per query; the metric is the
                # fraction of those 10 inside the exact top-20 (precision
                # vs the exact-20 panel, not recall@10 — top-20 absorbs
                # the integer-cosine tie plateaus that make exact top-10
                # ambiguous between engines)
                ex = exact_top20(sf_dir, qid)
                recs.append(len(got & ex) / len(got))
            print(f"{tag} {name} mean prec-vs-exact20: "
                  f"{sum(recs) / len(recs):.3f} over {len(recs)} queries ({el:.1f}s)",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
