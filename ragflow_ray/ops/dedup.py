"""Deduplication operators over the ``documents`` / ``embeddings``
tables.

Five strategies a corpus-scale training-data pipeline needs:

* exact         — hash-partitioned first-per-content-hash
* token-set     — docs sharing an identical distinct-word set
* MinHash+LSH   — shingles → minhash sketch → banded buckets →
                  candidate pairs → Jaccard verify
* SimHash       — 64-bit simhash, near-dup by Hamming distance via
                  band tables
* embedding     — cosine near-dup pairs within label partitions

Exact + token-set + embedding have 1:1 DuckDB oracles; MinHash and
SimHash results depend on the hash mixing and are verified by
rows-only checks plus unit tests on planted duplicates.

All stages follow the shuffle discipline of SURVEY.md §7.3: per-batch
vectorized signature computation (no Python loops over chars), then a
single small groupby on the signature key; candidate verification
happens inside the bucket group, never as an all-pairs join.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# -- exact ---------------------------------------------------------------


def exact_dedup(sf_dir: str):
    """Keeper per exact content hash: (md5(text), min doc_id, count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def hash_batch(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {"content_hash": pa.array(digests), "doc_id": batch["doc_id"]}
        )

    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow")
    out = ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keeper_doc_id"), Count(alias_name="n_copies")
    )
    df = out.sort("content_hash").to_pandas()
    df["keeper_doc_id"] = df["keeper_doc_id"].astype("int64")
    df["n_copies"] = df["n_copies"].astype("int64")
    return df


def dedup_keepers(sf_dir: str):
    """The surviving document set after exact dedup: for every content
    hash, the minimum doc_id (the rows a dedup *filter* would keep) —
    hash-partitioned groupby, then the keeper ids sorted."""
    import hashlib as _hashlib

    import pyarrow as pa
    from ray.data.aggregate import Min

    def hash_batch(batch: pa.Table) -> pa.Table:
        digests = [
            _hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()
        ]
        return pa.table({"content_hash": pa.array(digests), "doc_id": batch["doc_id"]})

    ds = _docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow")
    out = ds.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    df = out.to_pandas()[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


# -- token-set signature -------------------------------------------------


def token_set_dedup(sf_dir: str):
    """Group docs by md5 of their sorted distinct-word set — an exact,
    order-insensitive near-dup signature (word-permuted copies
    collide)."""
    import pyarrow as pa

    def sig(batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch["text"].to_pylist():
            words = sorted(set(t.split(" ")))
            sigs.append(hashlib.md5(" ".join(words).encode()).hexdigest())
        return pa.table({"token_set_hash": pa.array(sigs), "doc_id": batch["doc_id"]})

    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(sig, batch_format="pyarrow")
    out = ds.groupby("token_set_hash").aggregate(
        Min("doc_id", alias_name="keeper_doc_id"), Count(alias_name="n_members")
    )
    df = out.sort("token_set_hash").to_pandas()
    df["keeper_doc_id"] = df["keeper_doc_id"].astype("int64")
    df["n_members"] = df["n_members"].astype("int64")
    return df


# -- MinHash + LSH -------------------------------------------------------

N_HASHES = 64
N_BANDS = 8  # 8 rows per band
_MERSENNE = (1 << 61) - 1


def _minhash_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=N_HASHES, dtype=np.int64)
    b = rs.randint(0, _MERSENNE, size=N_HASHES, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 of word k-shingles (vector of uint64)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.int64, count=len(grams))
    )


class MinHasher:
    """Actor-pool stage: per-doc 64-slot minhash sketch, exploded to
    (band_id, band_hash, doc_id) rows for the LSH groupby."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _minhash_params(seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_band, rows_hash, rows_doc = [], [], []
        rows_per_band = N_HASHES // N_BANDS
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sh = _shingle_hashes(text)
            # sketch[i] = min over shingles of (a_i * s + b_i) mod p
            vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
            sketch = vals.min(axis=0)
            for band in range(N_BANDS):
                seg = sketch[band * rows_per_band : (band + 1) * rows_per_band]
                h = hashlib.md5(seg.tobytes()).hexdigest()[:16]
                rows_band.append(band)
                rows_hash.append(h)
                rows_doc.append(doc_id)
        return pd.DataFrame(
            {"band_id": rows_band, "band_hash": rows_hash, "doc_id": rows_doc}
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (doc ids only — text is
    not shipped through the shuffle)."""
    ids = sorted(set(group["doc_id"]))
    out = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
    if not out:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return pd.DataFrame(out, columns=["doc_a", "doc_b"])


def minhash_near_dups(sf_dir: str, concurrency=None, jaccard_threshold: float = 0.8):
    """MinHash-LSH near-duplicate pairs (Jaccard ≥ threshold).

    Shuffle discipline: only (band_id, band_hash, doc_id) rows move in
    the LSH groupby; candidate pairs (few) dedupe in a second tiny
    groupby; the text lookup for exact Jaccard verification is a
    broadcast into the final small map_batches.  At corpus scale the
    broadcast becomes a hash-partitioned join of the candidate ids
    back to the documents table — candidates, not the corpus, are the
    shuffled payload either way.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    docs = _docs(sf_dir)
    bands = docs.map_batches(
        MinHasher, batch_format="pandas", concurrency=concurrency or 2
    )
    candidates = bands.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    unique_pairs = candidates.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")
    )

    texts: dict = {}
    for b in docs.iter_batches(batch_format="pandas"):
        texts.update(zip(b["doc_id"], b["text"]))
    ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        cache: dict[int, set] = {}

        def sh(doc_id):
            s = cache.get(doc_id)
            if s is None:
                s = set(_shingle_hashes(lookup[doc_id]).tolist())
                cache[doc_id] = s
            return s

        rows = []
        for a, b_ in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = sh(a), sh(b_)
            union = len(sa | sb) or 1
            jac = len(sa & sb) / union
            if jac >= jaccard_threshold:
                rows.append((a, b_, round(jac, 4)))
        if not rows:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    out = unique_pairs.map_batches(verify, batch_format="pandas")
    return out.sort(["doc_a", "doc_b"])


# -- SimHash -------------------------------------------------------------


class SimHasher:
    """Per-doc 64-bit simhash over word features (vectorized bit
    accumulation).  Actor-pool stage: the word→hash cache persists
    across batches (natural-language vocab repeats heavily)."""

    def __init__(self) -> None:
        self._word_hash: dict[str, int] = {}

    def _hash_word(self, w: str) -> int:
        h = self._word_hash.get(w)
        if h is None:
            h = zlib.crc32(w.encode()) + (zlib.crc32(w[::-1].encode()) << 32)
            self._word_hash[w] = h
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            words, counts = np.unique(text.split(), return_counts=True)
            if len(words) == 0:
                out.append((doc_id, 0))
                continue
            hashes = np.fromiter(
                (self._hash_word(w) for w in words),
                dtype=np.uint64, count=len(words),
            )
            bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            votes = ((bits * 2 - 1).astype(np.int64) * counts[:, None]).sum(axis=0)
            sim = int((votes > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
            if sim >= 1 << 63:  # store as signed int64 (Arrow/pandas-safe)
                sim -= 1 << 64
            out.append((doc_id, sim))
        return pd.DataFrame(
            {"doc_id": pd.Series([o[0] for o in out], dtype="int64"),
             "simhash": pd.Series([o[1] for o in out], dtype="int64")}
        )


def simhash_signatures(sf_dir: str, concurrency=None):
    ds = _docs(sf_dir).map_batches(
        SimHasher, batch_format="pandas", concurrency=concurrency or 2
    )
    return ds.sort("doc_id")


def simhash_near_dups(sf_dir: str, max_hamming: int = 3, concurrency=None):
    """Near-dup pairs by simhash Hamming distance ≤ ``max_hamming``,
    found via 4 16-bit band tables (any pair within distance 3 shares
    at least one exact band)."""
    sigs = simhash_signatures(sf_dir, concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sims = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = batch["doc_id"].to_numpy()
        n = len(sims)
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        keys = (
            (sims[:, None] >> (np.arange(4, dtype=np.uint64) * 16)) & np.uint64(0xFFFF)
        ).reshape(-1)
        return pd.DataFrame(
            {
                "band_id": bands,
                "band_key": keys.astype(np.int64),
                "doc_id": np.repeat(ids, 4),
                "simhash": np.repeat(sims.view(np.int64), 4),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group["doc_id"], group["simhash"])))
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((int(rows[i][1]) ^ int(rows[j][1])) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out.append((rows[i][0], rows[j][0], d))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    from ray.data.aggregate import Min

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_key"])
        .map_groups(verify, batch_format="pandas")
    )
    out = pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))
    return out.sort(["doc_a", "doc_b"])


# -- embedding cosine near-dup ------------------------------------------


def embedding_near_dups(sf_dir: str, threshold: float = 0.25):
    """Cosine near-dup pairs within each ``label`` partition of the
    embeddings table (label = the natural blocking key; full-matrix
    cosine inside the group via one matmul)."""

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def pairs_in_label(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        ii, jj = np.where(np.triu(sims > threshold, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame(
            {
                "vec_a": pd.Series(a2, dtype="int64"),
                "vec_b": pd.Series(b2, dtype="int64"),
                "label": pd.Series(
                    np.full(len(a2), int(group["label"].iloc[0])), dtype="int64"
                ),
            }
        )

    out = ds.groupby("label").map_groups(pairs_in_label, batch_format="pandas")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("vec_a", "vec_b", "label")}
        )
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
