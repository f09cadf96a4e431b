"""Deterministic 100k-doc corpus: 40k-word vocab (generic kernel path),
~24% of docs are near-duplicates of a base doc (token dropout; 0.06
cluster-entry odds × 5-doc clusters → 0.3/(0.3+0.94) ≈ 0.242), rest
unique."""
import os

import numpy as np, pyarrow as pa, pyarrow.parquet as pq

rng = np.random.RandomState(42)
VOCAB = np.array([f"w{i:05d}" for i in range(40_000)])
N = 100_000
texts = []
i = 0
while i < N:
    if rng.rand() < 0.06 and i + 5 <= N:      # a 5-doc near-dup cluster
        base = VOCAB[rng.randint(0, len(VOCAB), 60)]
        for _ in range(5):
            keep = rng.rand(len(base)) > 0.05  # 5% dropout → J ≈ 0.9
            texts.append(" ".join(base[keep]))
            i += 1
    else:
        texts.append(" ".join(VOCAB[rng.randint(0, len(VOCAB), rng.randint(20, 80))]))
        i += 1
t = pa.table({
    "doc_id": pa.array(np.arange(N), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(["en"] * N),
    "source": pa.array([f"src{j%8}" for j in range(N)]),
    "n_chars": pa.array([len(x) for x in texts], pa.int64()),
})
os.makedirs("/dev/shm/graft_scale", exist_ok=True)
pq.write_table(t, "/dev/shm/graft_scale/documents.parquet", row_group_size=8192)
print("wrote", t.num_rows)
