"""Generate oracle fixtures for the clustering queries.

``kmeans_clusters`` and ``semdedup`` are deterministic pure functions
of the embeddings table, but Lloyd iterations and greedy cosine sweeps
are not expressible in DuckDB.  This script recomputes the expected
results with an INDEPENDENT, deliberately-naive implementation of the
pinned spec (no imports from ragflow_ray — agreement is a real check,
not an echo) and writes ``tests/fixtures/{kmeans_clusters,semdedup}.parquet``
for the oracle SQL to read.

Pinned spec (ops/cluster.py must match):
* init centroids = the K id-minimal vectors, L2-normalized
  (norm clamped at 1e-12);
* ITERS Lloyd rounds; assignment = argmax cosine, ties to the lowest
  cluster index (np.argmax);
* per-round sums over floor(normalized_vec * 1e6 + 0.5) int64;
  new centroid = (sums.astype(float64) / 1e6) / n, then normalize;
  empty clusters keep their previous centroid;
* semdedup: clusters from the SAME final centroids; inside a cluster,
  sweep ids ascending, drop when round(cos, 9) >= TAU vs an
  already-kept member; dup_of = the id-minimal qualifying keeper.

Fixture rows carry ``corpus_key`` = SUM(floor(embedding[0]*1e6+0.5))
(the embeddings-fixture convention) so one file serves every sf.

Run:  python tools/make_cluster_fixtures.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"

K_CLUSTERS = 8
KMEANS_ITERS = 3
SEMDEDUP_TAU = 0.25
SCALE = 1_000_000


def emb_corpus_key(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    total = 0
    for vec in t.column("embedding").to_pylist():
        total += int(np.floor(float(vec[0]) * SCALE + 0.5))
    return total


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def final_centroids(ids: np.ndarray, mat: np.ndarray) -> np.ndarray:
    nmat = normalize(mat)
    centroids = nmat[:K_CLUSTERS].copy()
    scaled = np.floor(nmat * SCALE + 0.5).astype(np.int64)
    for _ in range(KMEANS_ITERS):
        assign = np.argmax(nmat @ centroids.T, axis=1)
        new = centroids.copy()
        for c in range(K_CLUSTERS):
            mask = assign == c
            n = int(mask.sum())
            if n == 0:
                continue
            sums = scaled[mask].sum(axis=0)
            new[c] = (sums.astype(np.float64) / SCALE) / n
        centroids = normalize(new)
    return centroids


def kmeans_rows(ids, mat, centroids):
    nmat = normalize(mat)
    assign = np.argmax(nmat @ centroids.T, axis=1).astype(np.int64)
    sizes = np.bincount(assign, minlength=K_CLUSTERS)
    return assign, sizes


def semdedup_rows(ids, mat, assign):
    nmat = normalize(mat)
    keep = np.zeros(len(ids), dtype=np.int64)
    dup_of = np.full(len(ids), -1, dtype=np.int64)
    for c in np.unique(assign):
        rows = np.nonzero(assign == c)[0]  # ids already ascending
        kept: list[int] = []
        for i in rows:
            dup = -1
            for j in kept:
                if round(float(nmat[j] @ nmat[i]), 9) >= SEMDEDUP_TAU:
                    dup = int(ids[j])
                    break
            if dup >= 0:
                dup_of[i] = dup
            else:
                keep[i] = 1
                kept.append(i)
    return keep, dup_of


def main(sf_dirs):
    km = {k: [] for k in ("corpus_key", "vec_id", "cluster", "cluster_size")}
    sd = {k: [] for k in ("corpus_key", "vec_id", "cluster", "keep", "dup_of")}
    for sf in sf_dirs:
        key = emb_corpus_key(sf)
        ids, mat = load(sf)
        centroids = final_centroids(ids, mat)
        assign, sizes = kmeans_rows(ids, mat, centroids)
        keep, dup_of = semdedup_rows(ids, mat, assign)
        for i, vid in enumerate(ids):
            km["corpus_key"].append(key)
            km["vec_id"].append(int(vid))
            km["cluster"].append(int(assign[i]))
            km["cluster_size"].append(int(sizes[assign[i]]))
            sd["corpus_key"].append(key)
            sd["vec_id"].append(int(vid))
            sd["cluster"].append(int(assign[i]))
            sd["keep"].append(int(keep[i]))
            sd["dup_of"].append(int(dup_of[i]))
        print(f"{sf}: key={key} n={len(ids)} kept={int(keep.sum())}")
    pq.write_table(
        pa.table({k: pa.array(v, type=pa.int64()) for k, v in km.items()}),
        f"{FIXTURE_DIR}/kmeans_clusters.parquet",
    )
    pq.write_table(
        pa.table({k: pa.array(v, type=pa.int64()) for k, v in sd.items()}),
        f"{FIXTURE_DIR}/semdedup.parquet",
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    main(dirs)
