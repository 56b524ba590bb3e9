"""Generate oracle fixtures for the sketch-seeded queries.

The simhash / minhash / IVF queries are deterministic pure functions of
the testdata, but their hash mixing (crc32, md5 band digests, seeded
projections) is not expressible in DuckDB.  This script recomputes the
expected results with INDEPENDENT, deliberately-naive pure-Python
implementations of the pinned specs (no imports from ragflow_ray — a
from-scratch re-derivation, so agreement is a real check, not an echo)
and writes them to ``tests/fixtures/*.parquet`` for the oracle SQL to
read.

Fixture rows carry a content key so one file serves every scale factor:

* document fixtures  → ``corpus_key``  = SUM(n_chars) of the documents
  table (recomputable in SQL);
* embedding fixtures → ``corpus_key``  = SUM(floor(embedding[0]*1e6+0.5))
  (the label_vector_sums float-safety convention).

Run:  python tools/make_sketch_fixtures.py [sf_dir ...]
Defaults to /root/testdata/sf{0.001,0.01,0.1}.
"""

from __future__ import annotations

import hashlib
import struct
import sys
import zlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"

# ---- pinned spec constants (ops/dedup.py, ops/ann.py) -------------------

N_HASHES = 64
N_BANDS = 8
MERSENNE = (1 << 61) - 1
JACCARD_THRESHOLD = 0.8
MAX_HAMMING = 3
IVF_K, IVF_NQ, IVF_LISTS, IVF_PROBE = 10, 5, 16, 4
LSH_PLANES, LSH_SEED = 8, 7
U64 = 1 << 64


def doc_corpus_key(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return int(sum(t.column("n_chars").to_pylist()))


def emb_corpus_key(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    total = 0
    for vec in t.column("embedding").to_pylist():
        total += int(np.floor(float(vec[0]) * 1_000_000 + 0.5))
    return total


# ---- simhash (spec: 64-bit word-count vote over crc32 pair hash) --------


def simhash_of(text: str) -> int:
    votes = [0] * 64
    for word, count in Counter(text.split()).items():
        h = zlib.crc32(word.encode()) + (zlib.crc32(word[::-1].encode()) << 32)
        for b in range(64):
            votes[b] += count if (h >> b) & 1 else -count
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig - U64 if sig >= (1 << 63) else sig


# ---- minhash (spec: 3-word crc32 shingles, 64 affine hashes wrapped to
#      int64 then mod the Mersenne prime, 8 bands of 8, md5 band key) ----


def shingle_set(text: str) -> set[int]:
    words = text.split()
    if len(words) < 3:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    return {zlib.crc32(g.encode()) for g in grams}


def minhash_sketch(shingles: set[int], a: list[int], b: list[int]) -> list[int]:
    sketch = []
    for i in range(N_HASHES):
        best = None
        for s in shingles:
            v = (s * a[i] + b[i]) & (U64 - 1)  # int64 wrap, as pinned
            if v >= (1 << 63):
                v -= U64
            v %= MERSENNE  # python %: non-negative, matching numpy
            if best is None or v < best:
                best = v
        sketch.append(best if best is not None else 0)
    return sketch


def band_keys(sketch: list[int]) -> list[str]:
    rows = N_HASHES // N_BANDS
    keys = []
    for band in range(N_BANDS):
        seg = sketch[band * rows : (band + 1) * rows]
        keys.append(hashlib.md5(struct.pack(f"<{rows}q", *seg)).hexdigest()[:16])
    return keys


def minhash_pairs(ids: list[int], texts: list[str]) -> list[tuple[int, int, float]]:
    a_params, b_params = _minhash_params()
    shingles = {i: shingle_set(t) for i, t in zip(ids, texts)}
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id in ids:
        for band, key in enumerate(band_keys(minhash_sketch(shingles[doc_id],
                                                            a_params, b_params))):
            buckets.setdefault((band, key), []).append(doc_id)
    candidates = set()
    for members in buckets.values():
        members = sorted(set(members))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                candidates.add((members[i], members[j]))
    out = []
    for a, b in sorted(candidates):
        sa, sb = shingles[a], shingles[b]
        jac = len(sa & sb) / (len(sa | sb) or 1)
        if jac >= JACCARD_THRESHOLD:
            out.append((a, b, round(jac, 4)))
    return out


def _minhash_params() -> tuple[list[int], list[int]]:
    rs = np.random.RandomState(42)  # the pinned seed IS the spec
    a = rs.randint(1, MERSENNE, size=N_HASHES, dtype=np.int64)
    b = rs.randint(0, MERSENNE, size=N_HASHES, dtype=np.int64)
    return [int(x) for x in a], [int(x) for x in b]


# ---- IVF top-k (spec: first-64-id seeds, 16 centroids, 1 mean round,
#      probe 4 lists, exact cosine within probed lists) -------------------


def ivf_expected(sf_dir: str) -> list[tuple[int, int, int]]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = df["vec_id"].to_numpy()

    queries, q_ids = mat[:IVF_NQ], ids[:IVF_NQ]
    seeds = mat[: IVF_LISTS * 4].copy()
    centroids = seeds[:IVF_LISTS].copy()
    assign = np.argmax(seeds @ centroids.T, axis=1)
    for c in range(IVF_LISTS):
        members = seeds[assign == c]
        if len(members):
            centroids[c] = members.mean(axis=0)
    centroids = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    lists = np.argmax(mat @ centroids.T, axis=1)
    probe = np.argsort(-(queries @ centroids.T), axis=1)[:, :IVF_PROBE]

    rows = []
    for qi in range(IVF_NQ):
        member_mask = np.isin(lists, probe[qi])
        cand_ids = ids[member_mask]
        scores = np.round(mat[member_mask] @ queries[qi], 9)
        order = sorted(zip(scores, cand_ids), key=lambda t: (-t[0], t[1]))
        for rank, (_s, vid) in enumerate(order[:IVF_K], start=1):
            rows.append((int(q_ids[qi]), int(vid), rank))
    return rows


# ---- LSH top-k (spec: seed-7 RandomState.randn(8, dim) hyperplanes,
#      bit b = v @ plane_b >= 0, probe own bucket + Hamming-1 flips,
#      exact cosine within probed buckets) --------------------------------


def lsh_expected(sf_dir: str) -> list[tuple[int, int, int]]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = df["vec_id"].to_numpy()

    planes = np.random.RandomState(LSH_SEED).randn(LSH_PLANES, mat.shape[1])
    buckets = []
    for v in mat:  # deliberately row-at-a-time (naive re-derivation)
        b = 0
        for p in range(LSH_PLANES):
            if float(v @ planes[p]) >= 0.0:
                b |= 1 << p
        buckets.append(b)
    buckets = np.asarray(buckets)

    rows = []
    for qi in range(IVF_NQ):
        probes = {int(buckets[qi])} | {
            int(buckets[qi]) ^ (1 << p) for p in range(LSH_PLANES)
        }
        member_mask = np.isin(buckets, sorted(probes))
        cand_ids = ids[member_mask]
        scores = np.round(mat[member_mask] @ mat[qi], 9)
        order = sorted(zip(scores, cand_ids), key=lambda t: (-t[0], t[1]))
        for rank, (_s, vid) in enumerate(order[:IVF_K], start=1):
            rows.append((int(ids[qi]), int(vid), rank))
    return rows


# ---- driver --------------------------------------------------------------


def build(sf_dirs: list[str]) -> None:
    import os

    os.makedirs(FIXTURE_DIR, exist_ok=True)

    sig_rows: dict[str, list] = {"corpus_key": [], "doc_id": [], "simhash": []}
    pair_rows: dict[str, list] = {"corpus_key": [], "doc_a": [], "doc_b": [],
                                  "jaccard": []}
    ivf_rows: dict[str, list] = {"corpus_key": [], "q_vec_id": [], "vec_id": [],
                                 "rank": []}
    lsh_rows: dict[str, list] = {"corpus_key": [], "q_vec_id": [], "vec_id": [],
                                 "rank": []}

    for sf in sf_dirs:
        dkey = doc_corpus_key(sf)
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t.column("doc_id").to_pylist()]
        texts = t.column("text").to_pylist()

        for doc_id, text in zip(ids, texts):
            sig_rows["corpus_key"].append(dkey)
            sig_rows["doc_id"].append(doc_id)
            sig_rows["simhash"].append(simhash_of(text))

        for a, b, jac in minhash_pairs(ids, texts):
            pair_rows["corpus_key"].append(dkey)
            pair_rows["doc_a"].append(a)
            pair_rows["doc_b"].append(b)
            pair_rows["jaccard"].append(jac)

        ekey = emb_corpus_key(sf)
        for q, v, r in ivf_expected(sf):
            ivf_rows["corpus_key"].append(ekey)
            ivf_rows["q_vec_id"].append(q)
            ivf_rows["vec_id"].append(v)
            ivf_rows["rank"].append(r)
        for q, v, r in lsh_expected(sf):
            lsh_rows["corpus_key"].append(ekey)
            lsh_rows["q_vec_id"].append(q)
            lsh_rows["vec_id"].append(v)
            lsh_rows["rank"].append(r)
        print(f"{sf}: doc_key={dkey} emb_key={ekey} "
              f"sigs={len(ids)} pairs={pair_rows['corpus_key'].count(dkey)} "
              f"ivf={ivf_rows['corpus_key'].count(ekey)} "
              f"lsh={lsh_rows['corpus_key'].count(ekey)}")

    pq.write_table(
        pa.table(sig_rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("doc_id", pa.int64()),
            ("simhash", pa.int64()),
        ])),
        f"{FIXTURE_DIR}/simhash_signatures.parquet",
    )
    pq.write_table(
        pa.table(pair_rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("doc_a", pa.int64()),
            ("doc_b", pa.int64()), ("jaccard", pa.float64()),
        ])),
        f"{FIXTURE_DIR}/minhash_pairs.parquet",
    )
    pq.write_table(
        pa.table(ivf_rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("q_vec_id", pa.int64()),
            ("vec_id", pa.int64()), ("rank", pa.int64()),
        ])),
        f"{FIXTURE_DIR}/ivf_topk.parquet",
    )
    pq.write_table(
        pa.table(lsh_rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("q_vec_id", pa.int64()),
            ("vec_id", pa.int64()), ("rank", pa.int64()),
        ])),
        f"{FIXTURE_DIR}/lsh_topk.parquet",
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    build(dirs)
