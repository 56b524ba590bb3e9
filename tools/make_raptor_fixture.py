"""Generate the oracle fixture for the raptor_tree query.

Independent, deliberately-naive re-derivation of the two-level
RAPTOR-style cluster tree (NO imports from ragflow_ray — agreement is
a real check, not an echo).

Pinned spec (ops/cluster.raptor_tree must match):

* level 0 = the kmeans_clusters global spec at K_TOP: seeds = the
  K_TOP id-minimal normalized vectors; ITERS rounds of argmax-cosine
  assignment (ties → lowest index) with integer-scaled sums
  (floor(v*1e6+0.5)), new centroid = (sums/1e6)/n then normalize,
  empty clusters keep their centroid; final assignment from the final
  centroids;
* level 1, per level-0 cluster over rows in vec_id order: seeds = the
  min(K_LEAF, n) id-minimal normalized vectors; initial assignment,
  then LOCAL_ITERS rounds of (float mean over members in vec_id
  order → normalize → reassign); empty subclusters keep their
  centroid;
* leaf_size = members in the vector's (l0, l1) leaf.

Fixture rows carry corpus_key = SUM(floor(embedding[0]*1e6+0.5)).
Run: python tools/make_raptor_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"
K_TOP = 4
K_LEAF = 3
ITERS = 3
LOCAL_ITERS = 3
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
    return ids[order], mat[order]


def normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def level0(nmat: np.ndarray) -> np.ndarray:
    centroids = nmat[:K_TOP].copy()
    scaled = np.floor(nmat * SCALE + 0.5).astype(np.int64)
    for _ in range(ITERS):
        assign = np.argmax(nmat @ centroids.T, axis=1)
        new = centroids.copy()
        for c in range(K_TOP):
            mask = assign == c
            n = int(mask.sum())
            if n == 0:
                continue
            new[c] = (scaled[mask].sum(axis=0).astype(np.float64) / SCALE) / n
        centroids = normalize(new)
    return np.argmax(nmat @ centroids.T, axis=1).astype(np.int64)


def level1(nmat_grp: np.ndarray) -> np.ndarray:
    k = min(K_LEAF, len(nmat_grp))
    cents = nmat_grp[:k].copy()
    assign = np.argmax(nmat_grp @ cents.T, axis=1)
    for _ in range(LOCAL_ITERS):
        new = cents.copy()
        for c in range(k):
            members = nmat_grp[assign == c]
            if len(members):
                new[c] = members.sum(axis=0) / len(members)
        cents = normalize(new)
        assign = np.argmax(nmat_grp @ cents.T, axis=1)
    return assign.astype(np.int64)


def main(sf_dirs):
    rows = {k: [] for k in ("corpus_key", "vec_id", "l0", "l1", "leaf_size")}
    for sf in sf_dirs:
        key = emb_corpus_key(sf)
        ids, mat = load(sf)
        nmat = normalize(mat)
        l0 = level0(nmat)
        l1 = np.zeros(len(ids), dtype=np.int64)
        leaf = np.zeros(len(ids), dtype=np.int64)
        for c in np.unique(l0):
            rows_c = np.nonzero(l0 == c)[0]  # vec_id order preserved
            sub = level1(nmat[rows_c])
            l1[rows_c] = sub
            sizes = np.bincount(sub, minlength=sub.max() + 1)
            leaf[rows_c] = sizes[sub]
        for i, vid in enumerate(ids):
            rows["corpus_key"].append(key)
            rows["vec_id"].append(int(vid))
            rows["l0"].append(int(l0[i]))
            rows["l1"].append(int(l1[i]))
            rows["leaf_size"].append(int(leaf[i]))
        print(f"{sf}: key={key} vecs={len(ids)} "
              f"l0_sizes={np.bincount(l0, minlength=K_TOP).tolist()}")

    pq.write_table(
        pa.table(rows, schema=pa.schema(
            [("corpus_key", pa.int64()), ("vec_id", pa.int64()),
             ("l0", pa.int64()), ("l1", pa.int64()),
             ("leaf_size", pa.int64())])),
        f"{FIXTURE_DIR}/raptor_tree.parquet",
    )
    print(f"wrote {FIXTURE_DIR}/raptor_tree.parquet")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    main(dirs)
