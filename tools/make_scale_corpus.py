#!/usr/bin/env python3
"""Salted replication of the driver testdata for scale probes
(BENCH_SCALE.json). Rebuilds the r15-style corpora reproducibly — the
originals were ephemeral /tmp artifacts and every round had to re-derive
the recipe.

    python3 tools/make_scale_corpus.py <srcSfDir> <outDir> <factor>

- documents.parquet: `factor` replicas; replica k>0 gets doc_id shifted
  by k*ID_SPACE and a replica-unique token inserted every 8 words, so
  most shingles/substrings break and the cross-replica duplicate rate
  stays low (dedup probes measure corpus growth, not planted dupes).
- embeddings.parquet: replicas with deterministic per-replica noise
  (sigma=0.02), renormalized — near-dup rate stays low.
- every other table: symlinked from the source dir (probes do not scale
  them).

Deterministic: same inputs -> same bytes (seeded RNG, stable order).
"""
import os
import sys

import numpy as np
import pandas as pd

ID_SPACE = 10_000_000
SIGMA = 0.02


def salt_text(text: str, k: int, doc_id: int) -> str:
    if k == 0:
        return text
    words = text.split(" ")
    token = f"rx{k}q{doc_id % 1000}"
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if (i + 1) % 8 == 0:
            out.append(token)
    return " ".join(out)


def main(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    docs = pd.read_parquet(os.path.join(src, "documents.parquet"))
    reps = []
    for k in range(factor):
        r = docs.copy()
        r["doc_id"] = r["doc_id"] + k * ID_SPACE
        if k > 0:
            r["text"] = [salt_text(t, k, d)
                         for t, d in zip(docs["text"], docs["doc_id"])]
            r["n_chars"] = r["text"].str.len()
        reps.append(r)
    # bounded row groups: a single-row-group file cannot split across scan
    # tasks, which makes shuffle-free per-row batteries look super-linear
    # (one core does everything) — real corpora are many files/row groups
    pd.concat(reps, ignore_index=True).to_parquet(
        os.path.join(out, "documents.parquet"), index=False,
        row_group_size=20000)

    emb = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
    ereps = []
    for k in range(factor):
        r = emb.copy()
        r["vec_id"] = r["vec_id"] + k * ID_SPACE
        if k > 0:
            rng = np.random.default_rng(20260816 + k)
            def jitter(v):
                a = np.asarray(v, dtype=np.float32)
                a = a + rng.normal(0.0, SIGMA, a.shape).astype(np.float32)
                n = np.linalg.norm(a)
                return (a / n if n > 0 else a).tolist()
            r["embedding"] = r["embedding"].map(jitter)
        ereps.append(r)
    pd.concat(ereps, ignore_index=True).to_parquet(
        os.path.join(out, "embeddings.parquet"), index=False)

    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet") and f not in (
                "documents.parquet", "embeddings.parquet"):
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                # absolute target: a relative srcDir would otherwise make
                # the link resolve relative to outDir and dangle
                os.symlink(os.path.abspath(os.path.join(src, f)), dst)
    n = len(docs) * factor
    print(f"wrote {out}: {n} docs ({factor}x), embeddings {len(emb) * factor}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__.strip())
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
