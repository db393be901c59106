#!/usr/bin/env python3
"""Synthesize a documents table at an arbitrary scale factor for the
scale-curve audit (dev tool only — the driver's real testdata at
/root/testdata is read-only and stops at sf0.1).

The generator mirrors the driver testdata's measured document model
(seed 42, numpy): ~500 docs per 0.001 sf; text = 10-100 words uniform
over the same 30-word vocabulary; lang ~ {en: .41, de/es/fr/zh: ~.15};
source uniform over src0..src19; ~0.16% planted exact-duplicate texts
(mirroring the observed dup rate). Distributional parity is what the
audit needs — per-row cost and key cardinality grow like the real
tables' — not bit-level parity with the driver generator.

Usage:
    python3 tools/gen_scale_data.py <sf> <out_dir>
    # e.g. python3 tools/gen_scale_data.py 1.0 /tmp/graft_scale/sf1.0
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "fast",
         "filter", "group", "hash", "join", "key", "line", "merge", "order",
         "part", "query", "row", "scan", "slow", "small", "sort", "spark",
         "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def main():
    sf, out_dir = float(sys.argv[1]), sys.argv[2]
    # driver testdata: 500 docs at sf0.001 AND sf0.01 (floor), 5000 at
    # sf0.1 -> 50k rows per unit sf with a 500-row floor
    n = max(500, int(round(sf * 50_000)))
    rng = np.random.default_rng(42)
    os.makedirs(out_dir, exist_ok=True)

    n_words = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = rng.integers(0, len(VOCAB), size=n_words[i])
        texts.append(" ".join(VOCAB[w] for w in words))
    # planted exact duplicates (~0.16%): copy an earlier doc's text
    n_dup = max(1, n // 625)
    for j in rng.integers(0, n, size=n_dup):
        src = rng.integers(0, max(1, j)) if j > 0 else 0
        texts[j] = texts[src]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = [f"src{rng.integers(0, 20)}" for _ in range(n)]

    table = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    print(f"[gen] {n} documents -> {out_dir}/documents.parquet")

    # embeddings: 200 vectors per 500 docs in the driver testdata
    # (2000 at sf0.1) — 64-dim float32 around 10 label centroids, the
    # same shape the ANN/gate operators see
    ne = max(200, int(round(sf * 20_000)))
    labels = rng.integers(0, 10, size=ne)
    centroids = rng.normal(0, 1, size=(10, 64)).astype(np.float32)
    vecs = (centroids[labels] +
            rng.normal(0, 0.35, size=(ne, 64))).astype(np.float32)
    emb_table = pa.table({
        "vec_id": pa.array(np.arange(ne, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    })
    pq.write_table(emb_table, os.path.join(out_dir, "embeddings.parquet"))
    print(f"[gen] {ne} embeddings -> {out_dir}/embeddings.parquet")


if __name__ == "__main__":
    main()
