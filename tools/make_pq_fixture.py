"""Generate the oracle fixture for the pq_topk query.

Independent, deliberately-naive re-derivation of the product-
quantization ADC top-k (NO imports from ragflow_ray — agreement is a
real check, not an echo).

Pinned spec (ops/ann.pq_topk must match):

* vectors L2-normalized (norm clamped at 1e-12); D=64 split into M=8
  subspaces of 8 dims; K=16 sub-centroids per subspace;
* codebook seeds = sub-slices of the K id-minimal normalized vectors;
  ITERS=3 Lloyd rounds, assignment = Euclidean argmin (ties → lowest
  index), per-round sums over floor(v*1e6+0.5) int64 of the subvector,
  new sub-centroid = (sums/1e6)/n, NO normalization, empty keeps its
  centroid;
* queries = the 5 id-minimal vectors; ADC score = Σ_s <q_s, c_{s,
  code_s(x)}> over subspaces in order; top-10 per query after
  rounding scores to 9 dp, ties → ascending vec_id; 1-based rank.

Fixture rows carry corpus_key = SUM(floor(embedding[0]*1e6+0.5)).
Run: python tools/make_pq_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"
M = 8
K = 16
ITERS = 3
NQ = 5
TOPK = 10
SCALE = 1_000_000


def emb_corpus_key(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    total = 0
    for vec in t.column("embedding").to_pylist():
        total += int(np.floor(float(vec[0]) * SCALE + 0.5))
    return total


def load(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


def assign(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    return np.argmin(d, axis=1)


def train(mat: np.ndarray):
    dim = mat.shape[1]
    dsub = dim // M
    scaled = np.floor(mat * SCALE + 0.5).astype(np.int64)
    cents = mat[:K].reshape(K, M, dsub).transpose(1, 0, 2).copy()
    for _ in range(ITERS):
        new = cents.copy()
        for s in range(M):
            sub = mat[:, s * dsub:(s + 1) * dsub]
            a = assign(sub, cents[s])
            for c in range(K):
                mask = a == c
                n = int(mask.sum())
                if n == 0:
                    continue
                sums = scaled[mask, s * dsub:(s + 1) * dsub].sum(axis=0)
                new[s, c] = (sums.astype(np.float64) / SCALE) / n
        cents = new
    return cents


def topk_rows(ids, mat, cents):
    dim = mat.shape[1]
    dsub = dim // M
    codes = np.empty((len(ids), M), dtype=np.int64)
    for s in range(M):
        codes[:, s] = assign(mat[:, s * dsub:(s + 1) * dsub], cents[s])
    out = []
    for qi in range(NQ):
        q = mat[qi].reshape(M, dsub)
        table = np.einsum("sd,sjd->sj", q, cents)
        scores = table[np.arange(M), codes].sum(axis=1)
        sr = np.round(scores, 9)
        order = np.lexsort((ids, -sr))
        for rank, row in enumerate(order[:TOPK], start=1):
            out.append((int(ids[qi]), int(ids[row]), rank))
    return out


def main(sf_dirs):
    rows = {k: [] for k in ("corpus_key", "q_vec_id", "vec_id", "rank")}
    for sf in sf_dirs:
        key = emb_corpus_key(sf)
        ids, mat = load(sf)
        cents = train(mat)
        for q, v, r in topk_rows(ids, mat, cents):
            rows["corpus_key"].append(key)
            rows["q_vec_id"].append(q)
            rows["vec_id"].append(v)
            rows["rank"].append(r)
        print(f"{sf}: key={key} rows={rows['corpus_key'].count(key)}")

    pq.write_table(
        pa.table(rows, schema=pa.schema(
            [("corpus_key", pa.int64()), ("q_vec_id", pa.int64()),
             ("vec_id", pa.int64()), ("rank", pa.int64())])),
        f"{FIXTURE_DIR}/pq_topk.parquet",
    )
    print(f"wrote {FIXTURE_DIR}/pq_topk.parquet")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    main(dirs)
