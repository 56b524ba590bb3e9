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


def _bucket_pairs(group: pd.DataFrame):
    """Candidate pairs within one LSH bucket (doc ids only — text is
    not shipped through the shuffle)."""
    import pyarrow as pa

    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    ids = np.unique(group["doc_id"].to_numpy().astype(np.int64))
    if len(ids) < 2:
        return schema.empty_table()
    ii, jj = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": ids[ii], "doc_b": ids[jj]}, schema=schema)


def minhash_near_dups(sf_dir: str, concurrency=None, jaccard_threshold: float = 0.8,
                      join_partitions: int = 8, broadcast_limit: int = 100_000):
    """MinHash-LSH near-duplicate pairs (Jaccard ≥ threshold).

    Shuffle discipline — nothing corpus-sized ever reaches the driver:

    1. only (band_id, band_hash, doc_id) rows move in the LSH groupby;
    2. candidate pairs (few) dedupe in a tiny groupby;
    3. the exact-Jaccard verify is **size-adaptive**, the same call a
       query engine makes between broadcast and shuffle joins:

       * ≤ ``broadcast_limit`` distinct candidate ids — a
         predicate-pushdown parquet read fetches only the candidate
         rows (O(candidates) driver memory, explicitly bounded) and
         the verify runs locally;
       * above it — candidate ids broadcast via ``ray.put``, shingle
         sets recomputed for candidates alone in a filtering scan,
         each pair meets both shingle sets through two hash joins
         (doc_a, then doc_b) + a row-wise verify pass.  Candidate
         shingles, never document texts, are the shuffled payload.
    """
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Count

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
    )

    docs = _docs(sf_dir)
    # autoscaling pool: scales to 8 sketch actors on big hosts without
    # pinning CPUs that the downstream join aggregators need on small ones
    bands = docs.map_batches(
        MinHasher, batch_format="pandas", concurrency=concurrency or (1, 8)
    )
    candidates = bands.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # candidate pairs are small (LSH survivors); materialize once so the
    # id collection and the join side read the same blocks instead of
    # re-executing the sketch+shuffle pipeline concurrently with the
    # join's aggregator actors (a deadlock on small CPU budgets)
    unique_pairs = (
        candidates.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .materialize()
    )

    pair_ids = unique_pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
    if pair_ids.empty:
        import ray.data as rd

        return rd.from_arrow(pair_schema.empty_table())
    cand_ids = np.unique(
        np.concatenate([pair_ids["doc_a"].to_numpy(), pair_ids["doc_b"].to_numpy()])
    )

    if len(cand_ids) <= broadcast_limit:
        # small side: pruned read of candidate rows only (row-group +
        # row-level predicate pushdown), local exact verify
        import pyarrow.dataset as pads
        import ray.data as rd

        t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(pa.array(cand_ids)),
        )
        sh = {
            int(i): set(_shingle_hashes(txt).tolist())
            for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        }
        out_a, out_b, out_j = [], [], []
        for a, b in zip(pair_ids["doc_a"], pair_ids["doc_b"]):
            sa, sb = sh[int(a)], sh[int(b)]
            jac = len(sa & sb) / (len(sa | sb) or 1)
            if jac >= jaccard_threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(round(jac, 4))
        result = pa.table(
            {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}, schema=pair_schema
        )
        return rd.from_arrow(result).sort(["doc_a", "doc_b"])

    id_ref = ray.put(frozenset(int(x) for x in cand_ids))

    # shingle vectors ride the join as binary blobs (Arrow's hash join
    # rejects list-typed payload columns); int64-LE array bytes
    shingle_schema = pa.schema(
        [("doc_id", pa.int64()), ("shingles", pa.large_binary())]
    )

    def candidate_shingles(batch: pd.DataFrame):
        members = ray.get(id_ref)
        ids, arrs = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if int(doc_id) in members:
                ids.append(int(doc_id))
                arrs.append(_shingle_hashes(text).tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array(arrs, type=pa.large_binary()),
            },
            schema=shingle_schema,
        )

    # candidate-only shingle table, materialized once (bounded by the
    # candidate set, distributed blocks) so the two join sides don't
    # re-run the filtering scan
    shingles = docs.map_batches(
        candidate_shingles, batch_format="pandas"
    ).materialize()

    def _renamed(cols):
        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return rename

    # partitions sized to the candidate set (an empty join partition on
    # tiny inputs yields a schema-less block that breaks the join)
    n_parts = max(1, min(join_partitions, len(cand_ids) // 64 + 1))
    with_a = unique_pairs.select_columns(["doc_a", "doc_b"]).join(
        shingles.map_batches(_renamed(["doc_a", "sh_a"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts, on=("doc_a",),
    )
    with_both = with_a.join(
        shingles.map_batches(_renamed(["doc_b", "sh_b"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts, on=("doc_b",),
    )

    def verify_rows(batch: pd.DataFrame):
        out_a, out_b, out_j = [], [], []
        for a, b, sa_buf, sb_buf in zip(
            batch["doc_a"], batch["doc_b"], batch["sh_a"], batch["sh_b"]
        ):
            sa = set(np.frombuffer(sa_buf, dtype=np.int64))
            sb = set(np.frombuffer(sb_buf, dtype=np.int64))
            jac = len(sa & sb) / (len(sa | sb) or 1)
            if jac >= jaccard_threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(round(jac, 4))
        return pa.table(
            {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}, schema=pair_schema
        )

    out = with_both.map_batches(verify_rows, batch_format="pandas")
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array (numpy < 2 has no
    ``bitwise_count``)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


_SIMHASH_PAIR_SCHEMA = None  # built lazily (pyarrow import stays local)


def _simhash_pair_schema():
    global _SIMHASH_PAIR_SCHEMA
    if _SIMHASH_PAIR_SCHEMA is None:
        import pyarrow as pa

        _SIMHASH_PAIR_SCHEMA = pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
        )
    return _SIMHASH_PAIR_SCHEMA


def simhash_near_dups(sf_dir: str, max_hamming: int = 3, concurrency=None,
                      max_bucket_sigs: int = 4096):
    """Near-dup pairs by simhash Hamming distance ≤ ``max_hamming``,
    found via 4 16-bit band tables (any pair within distance 3 shares
    at least one exact band — the pigeonhole guarantee).

    Scale discipline:

    * in-bucket work runs over **unique signatures** (exact-duplicate
      sigs collapse before the pairwise step) with a vectorized
      XOR+popcount sweep in row blocks — no Python pair loops;
    * each qualifying pair is emitted **only from its first shared
      band**, so pairs are globally unique without a dedup shuffle;
    * buckets larger than ``max_bucket_sigs`` unique signatures are
      truncated (smallest signatures kept, deterministic) with the
      drop **logged loudly** — the explicit approximation backstop for
      pathological 16-bit-band skew at corpus scale.
    """
    import pyarrow as pa

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

    def verify(group: pd.DataFrame):
        band = int(group["band_id"].iloc[0])
        docs = group["doc_id"].to_numpy().astype(np.int64)
        sims = group["simhash"].to_numpy().astype(np.int64).view(np.uint64)

        usig, inv = np.unique(sims, return_inverse=True)
        if len(usig) > max_bucket_sigs:
            import logging

            logging.getLogger("ragflow_ray.dedup").warning(
                "simhash bucket (band=%d key=%d) truncated: %d -> %d unique "
                "signatures (%d docs dropped from pair generation)",
                band, int(group["band_key"].iloc[0]), len(usig), max_bucket_sigs,
                int((inv >= max_bucket_sigs).sum()),
            )
            keep = inv < max_bucket_sigs  # usig is sorted: keep smallest
            docs, inv = docs[keep], inv[keep]
            usig = usig[:max_bucket_sigs]
        n = len(usig)

        # doc ids per unique signature, each list sorted
        order = np.lexsort((docs, inv))
        docs_s, inv_s = docs[order], inv[order]
        starts = np.searchsorted(inv_s, np.arange(n + 1))

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []

        # exact-duplicate signatures: all bands share them; emit from
        # band 0 only
        if band == 0:
            for s in range(n):
                grp = docs_s[starts[s] : starts[s + 1]]
                if len(grp) > 1:
                    ii, jj = np.triu_indices(len(grp), k=1)
                    out_a.append(grp[ii])
                    out_b.append(grp[jj])
                    out_h.append(np.zeros(len(ii), dtype=np.int64))

        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))
        block = 512
        for i0 in range(0, n, block):
            xor = usig[i0 : i0 + block, None] ^ usig[None, :]
            ham = _popcount64(xor).astype(np.int64)
            # first shared band per pair (iterate descending: band 0 wins)
            fb = np.full(xor.shape, 4, dtype=np.int64)
            for b in range(3, -1, -1):
                fb[((xor >> shifts[b]) & np.uint64(0xFFFF)) == 0] = b
            rows = np.arange(i0, min(i0 + block, n))[:, None]
            cols = np.arange(n)[None, :]
            qual = (ham > 0) & (ham <= max_hamming) & (fb == band) & (cols > rows)
            ri, ci = np.nonzero(qual)
            for r, c, h in zip(rows[:, 0][ri], cols[0, ci], ham[ri, ci]):
                ga = docs_s[starts[r] : starts[r + 1]]
                gb = docs_s[starts[c] : starts[c + 1]]
                aa = np.repeat(ga, len(gb))
                bb = np.tile(gb, len(ga))
                lo = np.minimum(aa, bb)
                hi = np.maximum(aa, bb)
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(np.full(len(lo), h, dtype=np.int64))

        if not out_a:
            return _simhash_pair_schema().empty_table()
        return pa.table(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            },
            schema=_simhash_pair_schema(),
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_key"])
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.sort(["doc_a", "doc_b"])


# -- embedding cosine near-dup ------------------------------------------


def embedding_near_dups(sf_dir: str, threshold: float = 0.25,
                        max_label_size: int = 20_000):
    """Cosine near-dup pairs within each ``label`` partition of the
    embeddings table (label = the natural blocking key; full-matrix
    cosine inside the group via one matmul).

    Label blocking is quadratic inside a group, so a hot label is
    guarded: groups beyond ``max_label_size`` members are truncated to
    the vec_id-smallest members with a loud log — the explicit
    approximation backstop (at real scale a hot label should be
    sub-blocked by an LSH of the vectors instead)."""

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def pairs_in_label(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > max_label_size:
            import logging

            logging.getLogger("ragflow_ray.dedup").warning(
                "embedding label %s truncated: %d -> %d members for the "
                "pairwise cosine sweep",
                group["label"].iloc[0], len(group), max_label_size,
            )
            group = group.nsmallest(max_label_size, "vec_id")
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
