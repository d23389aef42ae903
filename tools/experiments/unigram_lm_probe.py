"""Feasibility probe for the round-10 unigram-LM tokenizer trainer
(SURVEY §7 queue; Kudo 2018, "Subword regularization").

Questions this answers BEFORE any Spark implementation:
1. Is EM on the (word, count) vocab table deterministic under a fixed
   tie-break (the BPE-trainer requirement for oracle replay)?
2. How deep is the Viterbi DP per word — i.e., can the segmentation be
   unrolled as a BOUNDED number of in-row steps (position DP over a
   word of length L needs exactly L steps; generated-CTE unrolling is
   viable iff L is small and stable)?
3. Do log-prob floats threaten cross-engine portability, or does the
   fixed-point idiom (integer micro-units) survive the EM updates?

Pure-Python replica at vocab scale (the trainer itself is corpus-size-
independent exactly like bpe_train_merges — the corpus pass is one
word-frequency agg). Run: python tools/experiments/unigram_lm_probe.py
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SEED_MAX_SUB = 4   # seed pieces: all substrings up to this length
TARGET_VOCAB = 24  # prune down to this many multi-char pieces
FIXED = 1_000_000  # fixed-point micro-units for log-probs


def word_counts() -> Counter:
    rows = duckdb.sql(f"""
        SELECT w, COUNT(*) FROM (
          SELECT UNNEST(string_split(text,' ')) AS w
          FROM '{SF_DIR}/documents.parquet') t
        WHERE w != '' GROUP BY w
    """).fetchall()
    return Counter(dict(rows))


def viterbi(word: str, logp: dict[str, float]) -> tuple[list[str], int]:
    """Best segmentation + DP step count. Ties break toward FEWER pieces
    then lexicographically-smaller piece (deterministic, engine-portable
    as an integer/string comparison)."""
    L = len(word)
    best: list[tuple[float, int, str] | None] = [None] * (L + 1)
    best[0] = (0.0, 0, "")
    steps = 0
    for i in range(1, L + 1):
        steps += 1
        for j in range(max(0, i - 8), i):
            piece = word[j:i]
            if piece not in logp or best[j] is None:
                continue
            cand = (best[j][0] + logp[piece], best[j][1] + 1, piece)
            if best[i] is None or (cand[0], -cand[1], piece) > (
                best[i][0], -best[i][1], best[i][2]
            ):
                best[i] = cand
    if best[L] is None:
        return list(word), L  # char fallback
    out, i = [], L
    while i > 0:
        _, _, piece = best[i]
        out.append(piece)
        i -= len(piece)
    return out[::-1], steps


def main() -> None:
    wc = word_counts()
    max_len = max(len(w) for w in wc)
    # seed: chars + frequent substrings
    seed = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for k in range(1, SEED_MAX_SUB + 1):
                if i + k <= len(w):
                    seed[w[i : i + k]] += c
    vocab = {p for p, _ in seed.most_common(120)} | {c for w in wc for c in w}
    logp = {p: math.log(seed[p] / sum(seed.values())) for p in vocab}

    def em_round() -> dict[str, float]:
        cnt = Counter()
        for w, c in wc.items():
            for piece in viterbi(w, logp)[0]:
                cnt[piece] += c
        tot = sum(cnt.values())
        # fixed-point quantized logs — the cross-engine portability test
        return {
            p: round(math.log(cnt[p] / tot) * FIXED) / FIXED
            for p in vocab if cnt[p] > 0
        }

    trajectories = []
    for trial in range(2):  # determinism: identical runs must agree exactly
        lp = dict(logp)
        traj = []
        for _ in range(4):
            globals()['logp'], lp_prev = lp, lp  # use current model
            lp = em_round()
            traj.append(tuple(sorted(lp.items())))
        trajectories.append(traj)
    deterministic = trajectories[0] == trajectories[1]
    converged_at = next(
        (i for i in range(1, 4) if trajectories[0][i] == trajectories[0][i - 1]), None
    )
    segs = {w: viterbi(w, dict(trajectories[0][-1]))[0] for w in list(wc)[:5]}
    print(f"vocab(words)={len(wc)} max_word_len={max_len} "
          f"(Viterbi DP depth = word length → unrolls in ≤{max_len} steps)")
    print(f"seed pieces={len(vocab)}  EM deterministic across runs: {deterministic}")
    print(f"EM fixed after round: {converged_at} (of 4; fixed-point 1e-6 quantized logs)")
    print(f"sample segmentations: {segs}")


if __name__ == "__main__":
    main()
