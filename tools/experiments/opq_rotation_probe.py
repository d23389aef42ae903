"""Offline de-risking probe for the round-10 OPQ item (SURVEY §7 queue).

Question: does rotating the embedding space before product quantization
(parametric OPQ, Ge et al. 2013 — PCA basis, optionally eigenvalue-
balanced subspace allocation) improve ADC recall@10 on THIS corpus's
embeddings, which are synthetic and possibly too isotropic to reward a
rotation?

NOT product code: numpy replica of the engine's PQ recipe
(unit-normalize → init code = id % kc → fixed-point means → one Lloyd
round → ADC with unquantized query) so the before/after isolates the
rotation. Run: python tools/experiments/opq_rotation_probe.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
M, KC, TOPK, SCALE = 8, 16, 10, 10_000_000


def load(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    v = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    v = v[np.argsort(ids)]
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def train_pq(x: np.ndarray) -> list[np.ndarray]:
    n, d = x.shape
    sub = d // M
    codes0 = np.arange(n) % KC
    books = []
    for s in range(M):
        xs = x[:, s * sub : (s + 1) * sub]
        # fixed-point means per init bucket (the engine's hash init)
        cb = np.stack([
            np.floor(xs[codes0 == c] * SCALE).sum(0) / (max((codes0 == c).sum(), 1) * SCALE)
            for c in range(KC)
        ])
        # one Lloyd round: reassign by L2, recompute means (empty keeps old)
        d2 = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(KC):
            if (a == c).any():
                cb[c] = np.floor(xs[a == c] * SCALE).sum(0) / ((a == c).sum() * SCALE)
        books.append(cb)
    return books


def adc_recall(x: np.ndarray, books: list[np.ndarray], qidx: np.ndarray) -> float:
    n, d = x.shape
    sub = d // M
    codes = np.empty((n, M), dtype=np.int64)
    for s in range(M):
        xs = x[:, s * sub : (s + 1) * sub]
        codes[:, s] = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1).argmin(1)
    exact = x @ x[qidx].T  # cosine (unit vectors)
    hits = 0
    for j, q in enumerate(qidx):
        lut = np.stack([x[q, s * sub : (s + 1) * sub] @ books[s].T for s in range(M)])
        adc = lut[np.arange(M)[None, :], codes].sum(1)
        adc[q] = -np.inf
        ex = exact[:, j].copy()
        ex[q] = -np.inf
        approx_top = set(np.argpartition(-adc, TOPK)[:TOPK].tolist())
        true_top = set(np.argpartition(-ex, TOPK)[:TOPK].tolist())
        hits += len(approx_top & true_top)
    return hits / (len(qidx) * TOPK)


def main() -> None:
    x = load(SF_DIR)
    n, d = x.shape
    qidx = np.arange(0, n, 100)
    mu = x.mean(0)
    cov = (x - mu).T @ (x - mu) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, r_pca = evals[order], evecs[:, order].T  # rows = components

    aniso = evals.max() / max(evals.min(), 1e-18)
    print(f"n={n} d={d}  eigenvalue spread max/min = {aniso:.2f} "
          f"(1.0 = isotropic; OPQ pays when ≫ 1)")

    base = adc_recall(x, train_pq(x), qidx)
    xr = x @ r_pca.T
    plain = adc_recall(xr, train_pq(xr), qidx)
    # eigenvalue-balanced allocation (parametric OPQ): greedy-assign
    # components to subspaces balancing the product of eigenvalues
    import heapq
    heap = [(0.0, s, []) for s in range(M)]
    heapq.heapify(heap)
    for i in order.argsort().argsort():  # components in descending order
        pass
    heap = [(0.0, s, []) for s in range(M)]
    heapq.heapify(heap)
    for i in range(d):
        logl, s, members = heapq.heappop(heap)
        if len(members) < d // M:
            members = members + [i]
            heapq.heappush(heap, (logl + np.log(max(evals[i], 1e-18)), s, members))
        else:
            heapq.heappush(heap, (logl, s, members))
            # find next subspace with room
            tmp = []
            while True:
                l2, s2, m2 = heapq.heappop(heap)
                if len(m2) < d // M:
                    heapq.heappush(heap, (l2 + np.log(max(evals[i], 1e-18)), s2, m2 + [i]))
                    break
                tmp.append((l2, s2, m2))
            for item in tmp:
                heapq.heappush(heap, item)
    perm = np.concatenate([np.array(m, dtype=int) for _, _, m in sorted(heap, key=lambda t: t[1])])
    xb = xr[:, perm]
    balanced = adc_recall(xb, train_pq(xb), qidx)

    print(f"ADC recall@{TOPK} ({len(qidx)} queries):")
    print(f"  identity (current PQ-ADC)        : {base:.3f}")
    print(f"  PCA rotation                     : {plain:.3f}")
    print(f"  PCA + eigenvalue-balanced subsp. : {balanced:.3f}")


if __name__ == "__main__":
    main()
