"""Deduplication operators over the ``documents`` / ``embeddings``
tables.

Strategies a corpus-scale training-data pipeline needs:

* exact         — hash-partitioned first-per-content-hash
* token-set     — docs sharing an identical distinct-word set
* MinHash+LSH   — shingles → minhash sketch → banded buckets →
                  candidate pairs → Jaccard verify
* n-gram        — exact Jaccard via a df-capped inverted index
* SimHash       — 64-bit simhash, near-dup by Hamming distance via
                  16 two-level 28-bit band tables
* embedding     — cosine near-dup pairs within label partitions
* clusters      — connected components over near-dup pairs
                  (distributed hash-to-min label propagation)

Every operator is value-hash oracled: direct SQL where expressible
(exact / token-set / n-gram / embedding / clusters via recursive
CTE), independent re-derivation fixtures for the sketch family
(tools/make_sketch_fixtures.py).

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

from ..state.skewmon import warn_rows as _skew_warn

_WS = re.compile(r"\s+")


def _doc_count(sf_dir: str) -> int:
    """Documents row count from the parquet footer — the count-gate
    input, free of any data pass."""
    import pyarrow.dataset as pads

    return pads.dataset(f"{sf_dir}/documents.parquet").count_rows()


def _docs(sf_dir: str, columns=("doc_id", "text"), rows_per_block: int = 256):
    from ..sources.readers import read_docs_split

    # split-on-read: the shared one-row-group parquet would otherwise
    # run every Python-heavy per-doc pass as a single task.  The block
    # size is a PER-OP choice (r3 verdict): per-doc Python loops want
    # small blocks for parallelism; C-level vectorized partials want
    # few big blocks — a 256-row split in front of a cheap kernel costs
    # more in task overhead than the work itself.
    return read_docs_split(sf_dir, columns=list(columns),
                           rows_per_block=rows_per_block)


# -- exact ---------------------------------------------------------------


def exact_dedup(sf_dir: str, driver_merge_limit: int = 2_000_000):
    """Keeper per exact content hash: (md5(text), min doc_id, count).

    ``driver_merge_limit=0`` forces the hash-partitioned distributed
    exchange (the at-scale shape); tests pin branch agreement."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def hash_batch(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {"content_hash": pa.array(digests), "doc_id": batch["doc_id"]}
        )

    ds = _docs(sf_dir, rows_per_block=2048).map_batches(
        hash_batch, batch_format="pyarrow")

    # count-gate (parquet-footer doc count): under the driver budget
    # the per-batch (hash, min, count) partials merge in one driver
    # groupby; past it the hash-partitioned exchange below is the
    # 100-TB shape (the result is corpus-sized)
    if _doc_count(sf_dir) <= driver_merge_limit:
        df = (
            ds.map_batches(
                lambda b: b.groupby("content_hash", as_index=False).agg(
                    keeper_doc_id=("doc_id", "min"), n_copies=("doc_id", "size")),
                batch_format="pandas")
            .to_pandas()
            .groupby("content_hash", as_index=False).agg(
                keeper_doc_id=("keeper_doc_id", "min"),
                n_copies=("n_copies", "sum"))
            .sort_values("content_hash").reset_index(drop=True)
        )
    else:
        from ray.data.aggregate import Count, Min

        out = ds.groupby("content_hash").aggregate(
            Min("doc_id", alias_name="keeper_doc_id"), Count(alias_name="n_copies")
        )
        df = out.sort("content_hash").to_pandas()
    df["keeper_doc_id"] = df["keeper_doc_id"].astype("int64")
    df["n_copies"] = df["n_copies"].astype("int64")
    return df


def dedup_keepers(sf_dir: str, driver_merge_limit: int = 2_000_000):
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

    ds = _docs(sf_dir, rows_per_block=2048).map_batches(
        hash_batch, batch_format="pyarrow")
    # same count gate as exact_dedup (corpus-sized result at scale)
    if _doc_count(sf_dir) <= driver_merge_limit:
        df = (
            ds.map_batches(
                lambda b: b.groupby("content_hash", as_index=False).agg(
                    doc_id=("doc_id", "min")),
                batch_format="pandas")
            .to_pandas()
            .groupby("content_hash", as_index=False).agg(doc_id=("doc_id", "min"))
        )
    else:
        df = ds.groupby("content_hash").aggregate(
            Min("doc_id", alias_name="doc_id")).to_pandas()
    df = df[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


# -- token-set signature -------------------------------------------------


def token_set_signature(text: str) -> str:
    """md5 of the sorted distinct-word set — the ONE order-insensitive
    signature convention shared by token_set_dedup, dedup_incremental
    and curation.source_rollup (and mirrored by their SQL oracles)."""
    words = sorted(set(text.split(" ")))
    return hashlib.md5(" ".join(words).encode()).hexdigest()


def token_set_dedup(sf_dir: str, driver_merge_limit: int = 2_000_000):
    """Group docs by md5 of their sorted distinct-word set — an exact,
    order-insensitive near-dup signature (word-permuted copies
    collide)."""
    import pyarrow as pa

    def sig(batch: pa.Table) -> pa.Table:
        sigs = [token_set_signature(t) for t in batch["text"].to_pylist()]
        return pa.table({"token_set_hash": pa.array(sigs), "doc_id": batch["doc_id"]})

    ds = _docs(sf_dir).map_batches(sig, batch_format="pyarrow")
    # same count gate as exact_dedup (corpus-sized result at scale)
    if _doc_count(sf_dir) <= driver_merge_limit:
        df = (
            ds.map_batches(
                lambda b: b.groupby("token_set_hash", as_index=False).agg(
                    keeper_doc_id=("doc_id", "min"), n_members=("doc_id", "size")),
                batch_format="pandas")
            .to_pandas()
            .groupby("token_set_hash", as_index=False).agg(
                keeper_doc_id=("keeper_doc_id", "min"),
                n_members=("n_members", "sum"))
            .sort_values("token_set_hash").reset_index(drop=True)
        )
    else:
        from ray.data.aggregate import Count, Min

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


_MINHASH_AB = _minhash_params()  # seeded-deterministic, per-process


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


def minhash_bands(batch: pd.DataFrame):
    """Per-doc 64-slot minhash sketch, exploded to (band_id,
    band_hash, doc_id) rows for the LSH groupby.  Stateless task: the
    seeded (a, b) permutation params are deterministic module state
    (cached per worker process), so the stage needs no actor pool —
    a fresh pool cost ~2 s of startup per query (the r5 finding)."""
    import pyarrow as pa

    a, b = _MINHASH_AB
    rows_band, rows_hash, rows_doc = [], [], []
    rows_per_band = N_HASHES // N_BANDS
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sh = _shingle_hashes(text)
        # sketch[i] = min over shingles of (a_i * s + b_i) mod p
        vals = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        sketch = vals.min(axis=0)
        for band in range(N_BANDS):
            seg = sketch[band * rows_per_band : (band + 1) * rows_per_band]
            h = hashlib.md5(seg.tobytes()).hexdigest()[:16]
            rows_band.append(band)
            rows_hash.append(h)
            rows_doc.append(int(doc_id))
    # pinned Arrow schema: pandas block schemas are unhashable and
    # trip Ray's block-schema dedup warning at every shuffle
    return pa.table(
        {
            "band_id": pa.array(rows_band, type=pa.int64()),
            "band_hash": pa.array(rows_hash, type=pa.string()),
            "doc_id": pa.array(rows_doc, type=pa.int64()),
        }
    )


_PAIR_BUCKETS = 64  # dedup-bucket fanout (any low-cardinality value)


def _run_pair_walk(group: pd.DataFrame, key_cols, *, min_df: int = 2,
                   max_df: int | None = None, unique_ids: bool = False,
                   dedupe_pairs: bool = False, tag: str | None = None,
                   warn: int = 0):
    """THE shared coarse-bucket run walk behind the minhash band
    stage, the ngram inverted-index walk and the winnow fingerprint
    walk (their only differences are the run-key columns and three
    flags): sort one bucket group by ``key_cols + [doc_id]``, walk the
    key runs, and emit every within-run (doc_a < doc_b) pair.

    Because ALL copies of a key co-locate under its coarse bucket, a
    run's length IS the key's document frequency — the ``min_df`` /
    ``max_df`` stop-key gate is enforced ON the run, which is what let
    r4 delete the separate count-aggregate + hash join (a second full
    all-to-all over the same rows) from each of the three callers.

    Emits a low-cardinality ``pkey`` so the cross-run pair dedup/count
    can run as a 64-group vectorized ``map_groups`` instead of a
    per-pair groupby (Ray's aggregate at millions of groups is ~30x
    slower — measured 283s vs 8.8s on 9M pair rows from a 1500-doc
    clique).

    ``unique_ids`` dedupes doc ids within each run before gating (for
    walks whose upstream may emit a doc twice per key);
    ``dedupe_pairs`` locally dedupes (doc_a, doc_b) across runs before
    the shuffle (worth it when many keys join the same pair);
    ``tag``/``warn`` feed the straggler ledger (state/skewmon.py) when
    a bucket group exceeds the warn threshold.
    """
    import pyarrow as pa

    if tag:
        from ..state.skewmon import observe_group

        observe_group(tag, len(group), warn)
    schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("pkey", pa.int64())]
    )
    df = group.sort_values([*key_cols, "doc_id"])
    ids = df["doc_id"].to_numpy().astype(np.int64)
    change = np.zeros(len(df), dtype=bool)
    if len(df):
        change[0] = True
    for c in key_cols:
        v = df[c].to_numpy()
        change[1:] |= v[1:] != v[:-1]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], len(ids)]
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        run = np.unique(ids[s:e]) if unique_ids else ids[s:e]
        if len(run) < min_df or (max_df is not None and len(run) > max_df):
            continue
        ii, jj = np.triu_indices(len(run), k=1)
        out_a.append(run[ii])
        out_b.append(run[jj])
    if not out_a:
        return schema.empty_table()
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    if dedupe_pairs:
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = pairs[:, 0], pairs[:, 1]
    return pa.table(
        {"doc_a": a, "doc_b": b,
         "pkey": (a * 1_000_003 + b) % _PAIR_BUCKETS},
        schema=schema,
    )


def _dedupe_pairs(g: pd.DataFrame):
    """Vectorized distinct (doc_a, doc_b) within one pkey bucket."""
    import pyarrow as pa

    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    arr = np.unique(
        np.stack([g["doc_a"].to_numpy().astype(np.int64),
                  g["doc_b"].to_numpy().astype(np.int64)], axis=1),
        axis=0,
    )
    return pa.table({"doc_a": arr[:, 0], "doc_b": arr[:, 1]}, schema=schema)


def minhash_near_dups(sf_dir: str, concurrency=None, jaccard_threshold: float = 0.8,
                      join_partitions: int = 8, broadcast_limit: int = 100_000):
    """MinHash-LSH near-duplicate pairs (Jaccard ≥ threshold).

    Shuffle discipline — nothing corpus-sized ever reaches the driver:

    1. only (band_id, band_hash, doc_id) rows move in the LSH groupby;
    2. candidate pairs dedupe in a bucketed groupby and stay a
       **Dataset** — the branch below is picked from the materialized
       pair COUNT (metadata, no extra pass), so the pair set (which
       scales with the corpus's dup structure) never reaches the
       driver in the large branch;
    3. the exact-Jaccard verify is **size-adaptive**, the same call a
       query engine makes between broadcast and shuffle joins:

       * ≤ ``broadcast_limit`` candidate pairs — a predicate-pushdown
         parquet read fetches only the candidate rows (O(pairs)
         driver memory, explicitly bounded) and the verify runs
         locally;
       * above it — the candidate-id Dataset semi-joins the corpus
         scan, shingle sets are recomputed for candidates alone, each
         pair meets both shingle sets through two hash joins (doc_a,
         then doc_b) + a row-wise verify pass.  Candidate shingles,
         never document texts, are the shuffled payload.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
    )

    docs = _docs(sf_dir)
    # stateless sketch tasks (see minhash_bands) — `concurrency` is
    # accepted for caller compatibility and ignored
    bands = docs.map_batches(minhash_bands, batch_format="pandas")

    def with_bbkt(t: "pa.Table") -> "pa.Table":
        # coarse bucket over (band_id, band_hash): every copy of a
        # band bucket co-locates under 1024 groups instead of one
        # groupby group PER band bucket (the per-group dispatch tax
        # _run_pair_walk's docstring measured at ~30x for pair dedup
        # applies to the band stage too)
        h = np.array(
            [int(x[:4], 16) for x in t["band_hash"].to_pylist()],
            dtype=np.int64,
        )
        bb = (h * np.int64(8) + t["band_id"].to_numpy()) & np.int64(1023)
        return t.append_column("bbkt", pa.array(bb, type=pa.int64()))

    _warn = _skew_warn()

    def band_run_pairs(group: pd.DataFrame):
        """Pairs for every (band_id, band_hash) run inside one coarse
        bucket — the shared :func:`_run_pair_walk` kernel."""
        return _run_pair_walk(group, ["band_id", "band_hash"],
                              unique_ids=True,
                              tag="minhash_near_dups.bbkt", warn=_warn)

    # materialize between the two all-to-alls: chaining
    # groupby.map_groups straight into a second groupby makes Ray's
    # streaming executor interleave both shuffles' aggregator actors
    # with the sketch pool — measured 6x slower on a high-dup corpus
    # (78.6s -> 12.7s on a 400-doc clique) than cutting the plan here
    candidates = (
        bands.map_batches(with_bbkt, batch_format="pyarrow")
        .groupby("bbkt")
        .map_groups(band_run_pairs, batch_format="pandas")
        .materialize()
    )
    def broadcast_verify(pair_ids: pd.DataFrame):
        # small side: pruned read of candidate rows only (row-group +
        # row-level predicate pushdown), local exact verify; the pair
        # set is only collected where a count bound caps it
        import pyarrow.dataset as pads
        import ray.data as rd

        cand_ids = np.unique(
            np.concatenate([pair_ids["doc_a"].to_numpy(),
                            pair_ids["doc_b"].to_numpy()])
        )
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

    # when the RAW candidate rows (pre-dedup, the larger set) already
    # fit the driver budget, dedupe locally and skip the 64-way pkey
    # exchange entirely — its ~0.8 s fixed cost buys nothing the
    # np.unique below doesn't do (metadata count, no extra pass)
    n_raw = candidates.count()
    if n_raw == 0:
        import ray.data as rd

        return rd.from_arrow(pair_schema.empty_table())
    if n_raw <= broadcast_limit:
        cdf = candidates.select_columns(["doc_a", "doc_b"]).to_pandas()
        arr = np.unique(
            np.stack([cdf["doc_a"].to_numpy().astype(np.int64),
                      cdf["doc_b"].to_numpy().astype(np.int64)], axis=1),
            axis=0,
        )
        return broadcast_verify(
            pd.DataFrame({"doc_a": arr[:, 0], "doc_b": arr[:, 1]}))

    # pair dedup over 64 pkey buckets; materialized so the id
    # collection and the join side read the same blocks instead of
    # re-executing the pipeline
    unique_pairs = (
        candidates.groupby("pkey")
        .map_groups(_dedupe_pairs, batch_format="pandas")
        .materialize()
    )

    # the verify branch is picked from the materialized pair COUNT (a
    # metadata read, no extra shuffle) — the pair set itself is what
    # the small branch collects, so the bound is on exactly the thing
    # that would reach the driver; in the large branch nothing does
    n_pairs = unique_pairs.count()
    if n_pairs == 0:
        import ray.data as rd

        return rd.from_arrow(pair_schema.empty_table())

    if n_pairs <= broadcast_limit:
        return broadcast_verify(
            unique_pairs.select_columns(["doc_a", "doc_b"]).to_pandas())

    def emit(a: int, b: int, n_both: int, n_union: int):
        jac = n_both / (n_union or 1)
        if jac < jaccard_threshold:
            return None
        return {"doc_a": a, "doc_b": b, "jaccard": round(jac, 4)}

    # large branch only: derive the distinct candidate-id Dataset (one
    # extra small shuffle, paid only when the pair set is actually big)
    cand_ids_ds, n_cand = _pair_id_dataset(unique_pairs)
    return _join_overlap_verify(
        docs, unique_pairs, cand_ids_ds, n_cand, _shingle_hashes, emit,
        pair_schema, join_partitions,
    )


def _pair_id_dataset(unique_pairs):
    """→ (distinct candidate-id Dataset, its count) — fully
    distributed: both pair columns union into one id column and dedupe
    in a 64-bucket vectorized ``map_groups`` (low-cardinality key, not
    a per-id groupby); only the scalar count reaches the driver."""
    import pyarrow as pa

    def ids_of(col):
        def take(t: pa.Table) -> pa.Table:
            ids = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"doc_id": ids, "pkey": ids % _PAIR_BUCKETS}
            )

        return take

    def uniq(g: pd.DataFrame):
        schema = pa.schema([("doc_id", pa.int64())])
        return pa.table(
            {"doc_id": np.unique(g["doc_id"].to_numpy().astype(np.int64))},
            schema=schema,
        )

    a = unique_pairs.map_batches(ids_of("doc_a"), batch_format="pyarrow")
    b = unique_pairs.map_batches(ids_of("doc_b"), batch_format="pyarrow")
    ids = (
        a.union(b)
        .groupby("pkey")
        .map_groups(uniq, batch_format="pandas")
        .materialize()
    )
    return ids, ids.count()


def _join_overlap_verify(docs, unique_pairs, cand_ids_ds, n_cand, key_fn, emit,
                         pair_schema, join_partitions: int):
    """Distributed exact set-overlap verify shared by the near-dup ops.

    Nothing here touches the driver: the candidate-id *Dataset*
    semi-joins against the corpus scan, ``key_fn(text) -> int64
    ndarray`` computes each candidate's key set inside that scan; each
    pair meets both key sets through two hash joins, and ``emit(a, b,
    n_both, n_union) -> row | None`` decides what survives.
    """
    import pyarrow as pa

    # key vectors ride the join as binary blobs (Arrow's hash join
    # rejects list-typed payload columns); int64-LE array bytes
    key_schema = pa.schema([("doc_id", pa.int64()), ("keys", pa.large_binary())])

    # partitions sized to the candidate set (an empty join partition on
    # tiny inputs yields a schema-less block that breaks the join)
    n_parts = max(1, min(join_partitions, n_cand // 64 + 1))

    def compute_keys(batch: pd.DataFrame):
        ids, arrs = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            ids.append(int(doc_id))
            arrs.append(key_fn(text).tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "keys": pa.array(arrs, type=pa.large_binary()),
            },
            schema=key_schema,
        )

    # candidate rows selected by a distributed semi-join (no broadcast
    # id set, no driver collection); the key table is materialized once
    # (bounded by the candidate set) so the two join sides don't re-run
    # the scan
    cand_docs = docs.join(
        cand_ids_ds, join_type="inner", num_partitions=n_parts, on=("doc_id",)
    )
    keys = cand_docs.map_batches(compute_keys, batch_format="pandas").materialize()

    def _renamed(cols):
        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return rename
    with_a = unique_pairs.select_columns(["doc_a", "doc_b"]).join(
        keys.map_batches(_renamed(["doc_a", "k_a"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts, on=("doc_a",),
    )
    with_both = with_a.join(
        keys.map_batches(_renamed(["doc_b", "k_b"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts, on=("doc_b",),
    )

    def verify_rows(batch: pd.DataFrame):
        # key arrays are np.unique output (sorted, distinct) so the
        # C-level intersect applies; duplicated corpora repeat the same
        # blob pair across many rows, so overlap counts memoize
        memo: dict[tuple[bytes, bytes], tuple[int, int]] = {}
        rows = []
        for a, b, ka, kb in zip(
            batch["doc_a"], batch["doc_b"], batch["k_a"], batch["k_b"]
        ):
            counts = memo.get((ka, kb))
            if counts is None:
                sa = np.frombuffer(ka, dtype=np.int64)
                sb = np.frombuffer(kb, dtype=np.int64)
                n_both = np.intersect1d(sa, sb, assume_unique=True).size
                counts = (n_both, sa.size + sb.size - n_both)
                memo[(ka, kb)] = counts
            row = emit(int(a), int(b), *counts)
            if row is not None:
                rows.append(row)
        if not rows:
            return pair_schema.empty_table()
        return pa.Table.from_pylist(rows, schema=pair_schema)

    out = with_both.map_batches(verify_rows, batch_format="pandas")
    return out.sort(["doc_a", "doc_b"])


# -- exact n-gram Jaccard (inverted-index blocking) ----------------------


def _ngram_keys(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-grams as 64-bit md5-prefix keys (collision odds
    negligible; a doc shorter than ``n`` words contributes its full
    text as one gram)."""
    words = text.split()
    if len(words) < n:
        grams = [text]
    else:
        grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little", signed=True)
            for g in grams
        ),
        dtype=np.int64,
        count=len(grams),
    )
    return np.unique(out)


def ngram_jaccard_dups(sf_dir: str, n: int = 4, df_cap: int = 64,
                       broadcast_limit: int = 100_000):
    """**Exact** n-gram Jaccard near-dup pairs (≥ 1/2), no sketching.

    4-gram default: the blocking key must be selective — with a small
    vocabulary (this testdata has 31 words) 3-grams collide corpus-wide
    and the inverted index degenerates into all-pairs; 4-grams keep
    shared grams ≈ genuine near-dups.

    The classic inverted-index plan, with the long tail of unique
    grams never touching Python:

    1. explode each doc's distinct n-gram keys → ``(gram, doc_id)``
       rows and hash-exchange them ONCE on a coarse gram bucket —
       every copy of a gram co-locates, so the per-bucket run walk
       sees each gram's full document set;
    2. the df 2..``df_cap`` stop-gram rule applies INSIDE the walk on
       the unique-doc count of each gram run (deterministic, mirrored
       exactly by the SQL oracle's HAVING; a pair sharing only
       stop-grams is not a candidate).  r3 shipped this as a separate
       count-aggregate + hash join *before* the bucket exchange — a
       second full all-to-all over the same rows plus Ray's join
       operator, for a filter the walk enforces anyway; folding it in
       removed a full shuffle, the join and a materialize (measured
       9.7 → 4.2 s at sf0.1);
    3. pairs dedupe in a tiny groupby, then verify with the same
       size-adaptive exact verify as MinHash (``broadcast_limit``
       bounds the candidate PAIR count — quadratic in clique size,
       not linear in ids: pairs at or below it verify via a pruned
       driver-side read, above it via the distributed two-sided join).

    Float-free output: ``jaccard_x10000 = |A∩B| * 10000 // |A∪B|``,
    threshold test ``2*|A∩B| >= |A∪B|`` — integer arithmetic on both
    the Ray and DuckDB sides.
    """
    import pyarrow as pa
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("jaccard_x10000", pa.int64())]
    )
    gram_schema = pa.schema(
        [("gram", pa.int64()), ("gbkt", pa.int64()), ("doc_id", pa.int64())]
    )

    def explode(batch: pd.DataFrame):
        grams, ids = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            keys = _ngram_keys(text, n)
            grams.append(keys)
            ids.append(np.full(len(keys), int(doc_id), dtype=np.int64))
        if not grams:
            return gram_schema.empty_table()
        g = np.concatenate(grams)
        return pa.table(
            {"gram": g, "gbkt": g & np.int64(1023), "doc_id": np.concatenate(ids)},
            schema=gram_schema,
        )

    _warn = _skew_warn()

    def bucket_pairs(group: pd.DataFrame):
        """Pairs for every gram run inside one coarse bucket — the
        shared :func:`_run_pair_walk` kernel with the 2..``df_cap``
        stop-gram gate enforced on the run and pairs from different
        grams deduped locally before the shuffle."""
        return _run_pair_walk(group, ["gram"], max_df=df_cap,
                              unique_ids=True, dedupe_pairs=True,
                              tag="ngram_jaccard_dups.gbkt", warn=_warn)

    docs = _docs(sf_dir)
    # ONE all-to-all: the coarse-bucket exchange; the df stop-gram
    # gate lives inside bucket_pairs' run walk (2 <= unique docs <=
    # df_cap), so no count-aggregate/join precedes it
    raw_pairs = (
        docs.map_batches(explode, batch_format="pandas")
        .groupby("gbkt")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()
    )
    # when the RAW pair rows (already per-bucket deduped) fit the
    # driver budget, dedupe locally and skip the pkey exchange — its
    # ~0.8 s fixed cost buys nothing np.unique can't (minhash r5 gate)
    n_raw = raw_pairs.count()
    if n_raw == 0:
        return rd.from_arrow(pair_schema.empty_table())
    if n_raw <= broadcast_limit:
        cdf = raw_pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
        arr = np.unique(
            np.stack([cdf["doc_a"].to_numpy().astype(np.int64),
                      cdf["doc_b"].to_numpy().astype(np.int64)], axis=1),
            axis=0,
        )
        pair_ids = pd.DataFrame({"doc_a": arr[:, 0], "doc_b": arr[:, 1]})
        return _ngram_broadcast_verify(sf_dir, pair_ids, n, pair_schema)

    pairs = (
        raw_pairs.groupby("pkey")
        .map_groups(_dedupe_pairs, batch_format="pandas")
        .materialize()
    )
    # branch from the materialized pair count (metadata, no shuffle);
    # pairs stay a Dataset end-to-end in the join branch (same
    # discipline as minhash)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(pair_schema.empty_table())

    def emit(a: int, b: int, n_both: int, n_union: int):
        union = n_union or 1
        if 2 * n_both < union:
            return None
        return {"doc_a": a, "doc_b": b, "jaccard_x10000": n_both * 10_000 // union}

    if n_pairs > broadcast_limit:
        cand_ids_ds, n_cand = _pair_id_dataset(pairs)
        return _join_overlap_verify(
            docs, pairs, cand_ids_ds, n_cand,
            lambda t: _ngram_keys(t, n), emit, pair_schema, join_partitions=8,
        )
    pair_ids = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
    return _ngram_broadcast_verify(sf_dir, pair_ids, n, pair_schema)


def _ngram_broadcast_verify(sf_dir: str, pair_ids: pd.DataFrame, n: int,
                            pair_schema):
    """Driver-local exact-Jaccard verify over a bounded pair set: a
    predicate-pushdown read fetches only the candidate rows."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd
    cand_ids = np.unique(
        np.concatenate([pair_ids["doc_a"].to_numpy(),
                        pair_ids["doc_b"].to_numpy()])
    )
    t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(pa.array(cand_ids)),
    )
    sets = {
        int(i): set(_ngram_keys(txt, n).tolist())
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pair_ids["doc_a"], pair_ids["doc_b"]):
        sa, sb = sets[int(a)], sets[int(b)]
        both = len(sa & sb)
        union = len(sa | sb) or 1
        if 2 * both >= union:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(both * 10_000 // union)
    result = pa.table(
        {"doc_a": out_a, "doc_b": out_b, "jaccard_x10000": out_j},
        schema=pair_schema,
    )
    return rd.from_arrow(result).sort(["doc_a", "doc_b"])


# -- SimHash -------------------------------------------------------------


# word → 64-bit feature hash, shared by every SimHasher task that
# lands in the same worker process (natural-language vocab repeats
# heavily; a module dict gives the cross-batch cache without the
# ~2 s per-query actor-pool startup — the r5 stateless-task finding)
_SIMHASH_WORD_CACHE: dict[str, int] = {}


def _simhash_batch(batch: pd.DataFrame) -> "pa.Table":
    """Per-doc 64-bit simhash over word features (vectorized bit
    accumulation), stateless task."""
    cache = _SIMHASH_WORD_CACHE
    if len(cache) > 1 << 20:
        cache.clear()  # high-cardinality backstop; hot words repopulate

    def hash_word(w: str) -> int:
        h = cache.get(w)
        if h is None:
            h = zlib.crc32(w.encode()) + (zlib.crc32(w[::-1].encode()) << 32)
            cache[w] = h
        return h

    out = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        words, counts = np.unique(text.split(), return_counts=True)
        if len(words) == 0:
            out.append((doc_id, 0))
            continue
        hashes = np.fromiter(
            (hash_word(w) for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
        votes = ((bits * 2 - 1).astype(np.int64) * counts[:, None]).sum(axis=0)
        sim = int((votes > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
        if sim >= 1 << 63:  # store as signed int64 (Arrow/pandas-safe)
            sim -= 1 << 64
        out.append((doc_id, sim))
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([int(o[0]) for o in out], type=pa.int64()),
            "simhash": pa.array([o[1] for o in out], type=pa.int64()),
        }
    )


def _simhash_sigs_unsorted(sf_dir: str):
    return _docs(sf_dir).map_batches(_simhash_batch, batch_format="pandas")


def simhash_signatures(sf_dir: str, concurrency=None):
    # `concurrency` accepted for caller compatibility (stateless tasks
    # ignore it); the sort is part of THIS query's output contract only
    return _simhash_sigs_unsorted(sf_dir).sort("doc_id")


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


def _simhash_table_masks() -> np.ndarray:
    """16 per-table cleanliness masks for the 28-bit two-level LSH.

    Table t = 4*b + s covers outer chunk ``b`` (16 signature bits
    [16b, 16b+16)) plus inner sub-chunk ``s``: bits [12s, 12s+12) of
    the 48 remaining bits (the three other chunks concatenated in
    ascending chunk order).  Two signatures share table t's key iff
    ``(xor & mask[t]) == 0``.

    Completeness for hamming ≤ 3: ≤3 errors leave ≥1 outer chunk b*
    clean (pigeonhole over 4), and within b*'s 48 remaining bits the
    ≤3 errors dirty ≤3 of the 4 sub-chunks, so ≥1 table (b*, s*) is
    fully clean — every qualifying pair shares ≥1 of the 16 keys.
    """
    masks = []
    for b in range(4):
        others = [j for j in range(4) if j != b]
        pos = [16 * others[r // 16] + (r % 16) for r in range(48)]
        for s in range(4):
            m = 0xFFFF << (16 * b)
            for i in range(12):
                m |= 1 << pos[12 * s + i]
            masks.append(m)
    return np.array(masks, dtype=np.uint64)


_TABLE_MASKS = _simhash_table_masks()


def simhash_near_dups(sf_dir: str, max_hamming: int = 3, concurrency=None,
                      max_bucket_sigs: int = 4096):
    """Near-dup pairs by simhash Hamming distance ≤ ``max_hamming``,
    found via 16 two-level band tables keyed on 28 bits (outer 16-bit
    chunk + inner 12-bit sub-chunk of the remaining 48 bits) — see
    :func:`_simhash_table_masks` for the pigeonhole guarantee at
    distance ≤ 3.  The 28-bit key space (vs the previous 16-bit
    bands) removes the hot-bucket skew that forced truncation at
    corpus scale, at the cost of 16 instead of 4 exploded rows per
    doc.

    Scale discipline:

    * in-bucket work runs over **unique signatures** (exact-duplicate
      sigs collapse before the pairwise step) with a vectorized
      XOR+popcount sweep in row blocks — no Python pair loops;
    * each qualifying pair is emitted **only from its first shared
      table**, so pairs are globally unique without a dedup shuffle;
    * buckets larger than ``max_bucket_sigs`` unique signatures are
      still truncated (smallest signatures kept, deterministic) with
      the drop **logged loudly** — a backstop that should never fire
      below ~10⁹ docs with 28-bit keys.
    """
    import pyarrow as pa

    if max_hamming > 3:
        raise ValueError(
            "the 16-table LSH guarantees completeness only for "
            f"max_hamming <= 3 (got {max_hamming})"
        )

    # unsorted: the explode + bucket groupby destroys order anyway, so
    # signatures' doc_id sort (a full all-to-all) would be pure waste
    sigs = _simhash_sigs_unsorted(sf_dir)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sims = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = batch["doc_id"].to_numpy()
        n = len(sims)
        chunks = [
            (sims >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)
        ]
        keys = np.empty((n, 16), dtype=np.uint64)
        for b in range(4):
            others = [j for j in range(4) if j != b]
            rest = sum(
                chunks[j] << np.uint64(16 * rank)
                for rank, j in enumerate(others)
            )
            for s in range(4):
                sub = (rest >> np.uint64(12 * s)) & np.uint64(0xFFF)
                keys[:, 4 * b + s] = chunks[b] | (sub << np.uint64(16))
        # table id packs into bits 28..32 of the key: one int64 column
        # instead of two, and the groupby key is COARSE (4096 buckets)
        # — a 28-bit key space would make millions of 1-member groups
        # and the per-group dispatch tax dominates; exact-key runs are
        # recovered vectorized inside the bucket
        packed = (
            keys | (np.arange(16, dtype=np.uint64)[None, :] << np.uint64(28))
        ).reshape(-1)
        # Fibonacci-hash the packed key's top bits into 4096 buckets
        # (uint64 arithmetic: the multiply wraps intentionally)
        gbkt = (
            (packed * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(52)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "gbkt": gbkt,
                "table_key": packed.astype(np.int64),
                "doc_id": np.repeat(ids, 16),
                "simhash": np.repeat(sims.view(np.int64), 16),
            }
        )

    def _sweep_run(table, docs, sims, out_a, out_b, out_h):
        """Pairwise sweep over one exact (table, key) run."""
        usig, inv = np.unique(sims, return_inverse=True)
        if len(usig) > max_bucket_sigs:
            import logging

            logging.getLogger("ragflow_ray.dedup").warning(
                "simhash bucket (table=%d) truncated: %d -> %d unique "
                "signatures (%d docs dropped from pair generation)",
                table, len(usig), max_bucket_sigs,
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

        # exact-duplicate signatures: all tables share them; emit from
        # table 0 only
        if table == 0:
            for s in range(n):
                grp = docs_s[starts[s] : starts[s + 1]]
                if len(grp) > 1:
                    ii, jj = np.triu_indices(len(grp), k=1)
                    out_a.append(grp[ii])
                    out_b.append(grp[jj])
                    out_h.append(np.zeros(len(ii), dtype=np.int64))

        block = 256
        for i0 in range(0, n, block):
            xor = usig[i0 : i0 + block, None] ^ usig[None, :]
            ham = _popcount64(xor).astype(np.int64)
            # first shared table per pair (iterate descending: table 0
            # wins); sharing table t == (xor & mask[t]) == 0
            fb = np.full(xor.shape, 16, dtype=np.int64)
            for t in range(15, -1, -1):
                fb[(xor & _TABLE_MASKS[t]) == 0] = t
            rows = np.arange(i0, min(i0 + block, n))[:, None]
            cols = np.arange(n)[None, :]
            qual = (ham > 0) & (ham <= max_hamming) & (fb == table) & (cols > rows)
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

    def verify(group: pd.DataFrame):
        tkeys = group["table_key"].to_numpy().astype(np.int64)
        docs = group["doc_id"].to_numpy().astype(np.int64)
        sims = group["simhash"].to_numpy().astype(np.int64).view(np.uint64)

        order = np.argsort(tkeys, kind="stable")
        tkeys, docs, sims = tkeys[order], docs[order], sims[order]
        starts = np.flatnonzero(np.r_[True, tkeys[1:] != tkeys[:-1]])
        ends = np.r_[starts[1:], len(tkeys)]
        sizes = ends - starts

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        # singleton runs (the overwhelming majority) are filtered
        # vectorized; only real candidate clusters reach Python
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            _sweep_run(int(tkeys[s]) >> 28, docs[s:e], sims[s:e],
                       out_a, out_b, out_h)

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
        .groupby("gbkt")
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
    guarded: a group beyond ``max_label_size`` members is sub-blocked
    by a seeded random-hyperplane LSH of the vectors (enough planes to
    bound the expected sub-block size) and the pairwise sweep runs per
    sub-block — near-dup pairs landing in different sub-blocks are
    missed, which is logged loudly (explicit approximation, never a
    silent drop).  Sub-blocking only ever activates above the
    threshold, so small-corpus results stay exact and oracle-checked."""

    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def pairs_in_label(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > max_label_size:
            import logging

            n_planes = max(1, int(np.ceil(np.log2(len(group) / max_label_size))))
            logging.getLogger("ragflow_ray.dedup").warning(
                "embedding label %s: %d members > %d — sub-blocking with "
                "%d LSH hyperplanes (cross-block near-dups are not compared)",
                group["label"].iloc[0], len(group), max_label_size, n_planes,
            )
            mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
            planes = np.random.RandomState(12345).randn(mat.shape[1], n_planes)
            sig = ((mat @ planes) > 0) @ (1 << np.arange(n_planes))
            if len(np.unique(sig)) == 1:
                # degenerate (near-identical vectors): no split possible —
                # truncate deterministically rather than recurse forever
                group = group.nsmallest(max_label_size, "vec_id")
                return pairs_in_label(group)
            parts = [
                pairs_in_label(group.iloc[np.nonzero(sig == s)[0]])
                for s in np.unique(sig)
            ]
            parts = [p for p in parts if len(p)]
            if not parts:
                return pd.DataFrame(
                    {c: pd.Series([], dtype="int64")
                     for c in ("vec_a", "vec_b", "label")}
                )
            return pd.concat(parts, ignore_index=True)
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


# -- near-dup clusters (distributed connected components) -----------------


def dedup_clusters(sf_dir: str, max_rounds: int = 64):
    """Connected components over the exact n-gram near-dup pairs:
    every document in a near-dup pair is assigned its component's
    minimum doc_id (``cluster_keeper``) — the cluster-level dedup a
    training-data pipeline runs after pair generation (keep one doc
    per component, not one per pair).

    Distributed min-label propagation, the hash-to-min pattern:

    * labels start as each node's own id;
    * per round, every edge forwards its endpoints' labels both ways
      (two hash joins), and each node takes the minimum seen —
      computed in the 64-bucket vectorized ``map_groups`` (same
      discipline as the pair dedup, no per-node groupby);
    * labels are monotonically non-increasing, so a round that leaves
      ``SUM(label)`` unchanged has converged — a scalar aggregate per
      round, never a driver-side label set;
    * rounds are bounded by the component diameter (near-dup
      components are clique-ish: 1–2 rounds in practice) and by
      ``max_rounds`` as the backstop.

    The SQL oracle replays the same components with a recursive CTE
    over the identical pair predicate.
    """
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    label_schema = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])

    pairs = ngram_jaccard_dups(sf_dir)
    pairs = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_id", "cluster_keeper")}
        )
    # an empty join partition yields a schema-less block that breaks
    # Arrow's hash join — size partitions to the pair set
    n_parts = max(1, min(8, n_pairs // 64 + 1))

    def seed(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.unique(np.concatenate([a, b]))
        return pa.table({"doc_id": ids, "label": ids}, schema=label_schema)

    def min_label(g: pd.DataFrame):
        ids = g["doc_id"].to_numpy().astype(np.int64)
        lbl = g["label"].to_numpy().astype(np.int64)
        order = np.lexsort((lbl, ids))
        ids, lbl = ids[order], lbl[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return pa.table(
            {"doc_id": ids[starts], "label": lbl[starts]}, schema=label_schema
        )

    def bucketed(ds):
        def add_pkey(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"doc_id": ids,
                 "label": t["label"].to_numpy(zero_copy_only=False).astype(np.int64),
                 "pkey": ids % _PAIR_BUCKETS}
            )

        return (
            ds.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("pkey")
            .map_groups(min_label, batch_format="pandas")
        )

    # per-block seed labels may repeat a node across blocks: collapse
    labels = bucketed(
        pairs.map_batches(seed, batch_format="pyarrow")
    ).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def fwd(cols):
        src, dst = cols

        def rename(t: pa.Table) -> pa.Table:
            # this pyarrow's Table.rename_columns wants a full name
            # list; rebuild explicitly
            return pa.table({"doc_id": t[src], "other": t[dst]})

        return rename

    for _round in range(max_rounds):
        via_a = (
            pairs.map_batches(fwd(("doc_a", "doc_b")), batch_format="pyarrow")
            .join(labels, join_type="inner", num_partitions=n_parts, on=("doc_id",))
            .select_columns(["other", "label"])
            .rename_columns({"other": "doc_id"})
        )
        via_b = (
            pairs.map_batches(fwd(("doc_b", "doc_a")), batch_format="pyarrow")
            .join(labels, join_type="inner", num_partitions=n_parts, on=("doc_id",))
            .select_columns(["other", "label"])
            .rename_columns({"other": "doc_id"})
        )
        labels = bucketed(labels.union(via_a).union(via_b)).materialize()
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # min-label propagation moves the minimum one hop per round, so
        # a chain-shaped component with min-id eccentricity > max_rounds
        # exits here with split components — say so loudly instead of
        # returning silently-wrong clusters
        import logging

        logging.getLogger(__name__).warning(
            "dedup_clusters: label propagation did NOT converge in %d "
            "rounds — components with diameter > %d are split; raise "
            "max_rounds for chain-shaped duplicate structures",
            max_rounds, max_rounds,
        )

    df = labels.to_pandas().rename(columns={"label": "cluster_keeper"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "cluster_keeper"):
        df[c] = df[c].astype("int64")
    return df


# -- incremental (new-batch-vs-corpus) dedup -----------------------------


def dedup_incremental(sf_dir: str, new_source: str = "src19",
                      join_partitions: int = 8):
    """Streaming-ingestion dedup: which docs of an incoming batch
    (``source == new_source``) duplicate something already in the
    corpus (every other source)?  Key = the order-insensitive
    token-set signature (same convention as :func:`token_set_dedup`);
    ``dup_of`` = the id-minimal existing doc sharing it.

    The distributed plan an incremental ingest pipeline needs: ONE
    signature ``map_batches`` over the whole corpus computes the side
    flag inline (text is stripped there — only ``(bucket, hash, id,
    flag)`` ever shuffles; r5 folded the r4 shape's two filtered
    branches, which executed the scan twice, into this single pass),
    then ONE coarse-bucket groupby co-partitions old and new rows and
    each bucket vector-matches new docs against the id-minimal old doc
    per signature.  This is the hybrid_topk / events_order_asof
    co-partition pattern — it replaced a ``Dataset.join`` whose
    hash-join finalize crashed nondeterministically on
    empty/schema-less left partitions (CORRECTNESS_r03's one red row)
    and BASELINE measured the pattern ~2x cheaper than the join
    operator at this scale anyway.
    ``join_partitions`` is kept for API compatibility; the coarse
    bucket count is fixed and every block carries the pinned schema,
    so no partition can be schema-less.
    """
    import pyarrow as pa

    _N_BUCKETS = 256
    side_schema = pa.schema(
        [("bucket", pa.int64()), ("token_set_hash", pa.string()),
         ("doc_id", pa.int64()), ("is_new", pa.int64())]
    )

    def sig_all(batch: pa.Table) -> pa.Table:
        # ONE signature pass over the whole corpus with the side flag
        # computed inline — the r4 shape ran two filtered branches off
        # the same read, executing the parquet scan (and the filter
        # operators) twice for disjoint halves of the same rows
        sigs = [token_set_signature(t) for t in batch["text"].to_pylist()]
        srcs = batch["source"].to_pylist()
        ids = batch["doc_id"].cast(pa.int64())
        return pa.table(
            {"bucket": pa.array(
                [int(s[:4], 16) % _N_BUCKETS for s in sigs],
                type=pa.int64()),
             "token_set_hash": pa.array(sigs, type=pa.string()),
             "doc_id": ids,
             "is_new": pa.array(
                 [1 if s == new_source else 0 for s in srcs],
                 type=pa.int64())},
            schema=side_schema,
        )

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))
    both_sig = docs.map_batches(sig_all, batch_format="pyarrow")

    out_schema = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])

    def match(group: pd.DataFrame):
        is_new = group["is_new"].to_numpy() == 1
        old_min = group[~is_new].groupby("token_set_hash")["doc_id"].min()
        news = group[is_new]
        dup = news["token_set_hash"].map(old_min)
        keep = dup.notna().to_numpy()
        return pa.table(
            {"doc_id": news["doc_id"].to_numpy()[keep].astype("int64"),
             "dup_of": dup.to_numpy()[keep].astype("int64")},
            schema=out_schema,
        )

    df = (
        both_sig
        .groupby("bucket")
        .map_groups(match, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_id", "dup_of")}
        )
    for c in ("doc_id", "dup_of"):
        df[c] = df[c].astype("int64")
    return df


# -- passage-level (sub-document) exact dedup ----------------------------

PASSAGE_WORDS = 16


def passage_dedup(sf_dir: str, window: int = PASSAGE_WORDS,
                  join_partitions: int = 8):
    """Sub-document exact dedup: find documents that contain
    corpus-duplicated *passages* (the boilerplate/template detection a
    crawl-curation pipeline runs — headers, footers and licence blocks
    repeat across docs even when no whole document is a duplicate).

    Passage = consecutive non-overlapping ``window``-word slice of the
    ``split(' ')`` word list (trailing partial slice included; empty
    text is one empty passage).  A passage is *duplicated* when its
    md5 occurs ≥ 2 times corpus-wide, counting multiplicity — so a
    doc repeating its own passage also reports it.

    Distributed plan: one explode pass emits ``(bkt, ph, doc_id,
    n_passages)`` rows; ONE coarse hash-bucket exchange co-locates
    every copy of a passage, each bucket counts df and reduces to
    per-doc dup partials vectorized (the unique long tail dies inside
    the bucket, never re-shuffling), and a tiny per-doc groupby lands
    the verdicts.  r3 shipped the df gate as a count aggregate + hash
    join — a second full all-to-all over the same rows plus Ray's
    join operator (the ngram_jaccard fold applied here too).  No
    driver-side state at any point; output is dup-doc-sized.
    """
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Max, Sum

    pass_schema = pa.schema(
        [("bkt", pa.int64()), ("ph", pa.string()), ("doc_id", pa.int64()),
         ("n_passages", pa.int64())]
    )

    def explode(batch: pd.DataFrame):
        phs, ids, totals = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            npass = (len(words) + window - 1) // window
            for i in range(npass):
                chunk = " ".join(words[i * window:(i + 1) * window])
                phs.append(hashlib.md5(chunk.encode()).hexdigest())
                ids.append(int(doc_id))
                totals.append(npass)
        return pa.table(
            {"bkt": pa.array(
                 [int(h[:4], 16) & 1023 for h in phs], type=pa.int64()),
             "ph": pa.array(phs, type=pa.string()),
             "doc_id": pa.array(ids, type=pa.int64()),
             "n_passages": pa.array(totals, type=pa.int64())},
            schema=pass_schema,
        )

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_passages", pa.int64()),
         ("n_dup_passages", pa.int64())]
    )

    _warn = _skew_warn()

    def bucket_dups(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("passage_dedup.bkt", len(group), _warn)
        # every copy of a ph is in this bucket: row count per ph IS
        # its corpus-wide multiplicity (df >= 2, counting multiplicity)
        df_per_row = group.groupby("ph", sort=False)["doc_id"].transform("size")
        dup = group[df_per_row.to_numpy() >= 2]
        if dup.empty:
            return part_schema.empty_table()
        agg = dup.groupby("doc_id", as_index=False).agg(
            n_passages=("n_passages", "max"),
            n_dup_passages=("ph", "size"))
        return pa.table(
            {"doc_id": agg["doc_id"].to_numpy().astype(np.int64),
             "n_passages": agg["n_passages"].to_numpy().astype(np.int64),
             "n_dup_passages": agg["n_dup_passages"].to_numpy().astype(np.int64)},
            schema=part_schema,
        )

    partials = (
        _docs(sf_dir).map_batches(explode, batch_format="pandas")
        .groupby("bkt")
        .map_groups(bucket_dups, batch_format="pandas")
        .materialize()
    )
    # per-doc verdict rows are bounded by (dup docs × buckets their
    # passages land in); when that fits, the max/sum finalize on the
    # driver — only a corpus-scale dup set pays the second all-to-all
    n_partials = partials.count()
    if n_partials == 0:
        # all buckets empty: the collected frame is COLUMNLESS (the
        # pinned-schema empty-groupby quirk) — typed-empty early return
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_passages", "n_dup_passages")}
        )
    if n_partials <= 2_000_000:
        df = (partials.to_pandas()
              .groupby("doc_id", as_index=False)
              .agg(n_passages=("n_passages", "max"),
                   n_dup_passages=("n_dup_passages", "sum")))
    else:
        df = (
            partials.groupby("doc_id")
            .aggregate(Max("n_passages", alias_name="n_passages"),
                       Sum("n_dup_passages", alias_name="n_dup_passages"))
            .to_pandas()
        )
    # a dedup-free corpus leaves every bucket empty and the aggregate
    # returns a columnless frame — keep the typed-empty contract
    if df.empty or "doc_id" not in df.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_passages", "n_dup_passages")}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_passages", "n_dup_passages")}
        )
    for c in ("doc_id", "n_passages", "n_dup_passages"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_passages", "n_dup_passages"]]


SEGMENT_WORDS = 10


def segment_dedup_clean(sf_dir: str, window: int = SEGMENT_WORDS,
                        broadcast_limit: int = 200_000,
                        join_partitions: int = 8):
    """Boilerplate REMOVAL (the CCNet line-dedup step): where
    :func:`passage_dedup` only *flags* documents containing
    corpus-duplicated windows, this pass rewrites each document with
    the duplicated segments cut out — headers, footers and licence
    blocks that repeat across a crawl get deleted in place, the
    surrounding unique prose survives.

    Segment = consecutive non-overlapping ``window``-word slice of the
    ``split(' ')`` word list (trailing partial kept; empty text is one
    empty segment).  Duplicated = md5 occurs ≥ 2 times corpus-wide
    counting multiplicity, so self-repeats are cut too — every copy of
    a duplicated segment is removed, exactly as CCNet drops every
    occurrence of a repeated line.

    Distributed plan: one explode pass emits only digest rows (the
    128-bit md5 as two int64 columns under a 1024-way coarse bucket —
    the TEXT never shuffles, and the dup detection is a bucketed
    vectorized count, not a high-cardinality groupby(hash) aggregate;
    the substring_dedup pattern, back-ported in r5 — the string
    groupby was this op's dominant cost).  ONE materialized read feeds
    both passes.  Reconstruction is size-adaptive on the
    duplicated-hash count:

    * ≤ ``broadcast_limit`` dup hashes — collect just the digest pairs
      (bounded by the branch test itself), ``ray.put`` once
      (worker-process cached), and a second streaming pass over the
      docs re-segments and filters locally.  No shuffle anywhere; the
      document text moves zero times.
    * above the limit — re-explode WITH positions and ``left_anti``
      join the exploded rows against the dup-hash set (hash-partition
      exchange of (h1, h2, doc_id, i, seg) rows), then a per-doc
      ``map_groups`` stitches survivors back in segment order.  Text
      moves twice (explode + join) but the driver never sees it.

    Output (all docs, cleaned): ``doc_id, clean_text, n_removed``.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    from .curation import _cached_broadcast

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("clean_text", pa.string()),
         ("n_removed", pa.int64())]
    )
    dup_schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64())])

    def _segments(text: str) -> list[str]:
        words = text.split(" ")
        return [" ".join(words[i * window:(i + 1) * window])
                for i in range((len(words) + window - 1) // window or 1)]

    def _seg_digests(text: str):
        ds_ = [hashlib.md5(s.encode()).digest() for s in _segments(text)]
        h1 = np.array([int.from_bytes(d[:8], "big", signed=True) for d in ds_],
                      dtype=np.int64)
        h2 = np.array([int.from_bytes(d[8:], "big", signed=True) for d in ds_],
                      dtype=np.int64)
        return h1, h2

    def explode_hashes(batch: pd.DataFrame) -> pa.Table:
        h1s, h2s = [], []
        for text in batch["text"]:
            h1, h2 = _seg_digests(text)
            h1s.append(h1)
            h2s.append(h2)
        h1 = np.concatenate(h1s) if h1s else np.array([], dtype=np.int64)
        h2 = np.concatenate(h2s) if h2s else np.array([], dtype=np.int64)
        return pa.table(
            {"gbkt": pa.array((h1 & 1023).astype(np.int32)),
             "h1": pa.array(h1), "h2": pa.array(h2)}
        )

    _warn = _skew_warn()

    def bucket_dups(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("segment_dedup_clean.gbkt", len(group), _warn)
        sizes = group.groupby(["h1", "h2"]).size()
        dup = sizes.index[sizes.values >= 2]
        if len(dup) == 0:
            return dup_schema.empty_table()
        h1, h2 = zip(*dup)
        return pa.table(
            {"h1": pa.array(list(h1), type=pa.int64()),
             "h2": pa.array(list(h2), type=pa.int64())},
            schema=dup_schema,
        )

    docs = _docs(sf_dir).materialize()
    dup_hashes = (
        docs.map_batches(explode_hashes, batch_format="pandas")
        .groupby("gbkt")
        .map_groups(bucket_dups, batch_format="pandas")
        .materialize()
    )
    n_dup = dup_hashes.count()

    if n_dup <= broadcast_limit:
        # hash set is dimension-sized: broadcast once, rebuild locally
        ddf = dup_hashes.to_pandas()
        dup_ref = ray.put(
            frozenset(zip(ddf["h1"], ddf["h2"])) if n_dup else frozenset()
        )

        def clean(batch: pd.DataFrame) -> pa.Table:
            dup = _cached_broadcast(dup_ref)
            ids, outs, removed = [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                segs = _segments(text)
                h1, h2 = _seg_digests(text)
                keep = [s for s, k in zip(segs, zip(h1, h2)) if k not in dup]
                ids.append(int(doc_id))
                outs.append(" ".join(keep))
                removed.append(len(segs) - len(keep))
            return pa.table(
                {"doc_id": pa.array(ids, type=pa.int64()),
                 "clean_text": pa.array(outs, type=pa.string()),
                 "n_removed": pa.array(removed, type=pa.int64())},
                schema=out_schema,
            )

        return (
            docs.map_batches(clean, batch_format="pandas")
            .sort("doc_id")
        )

    # join branch: positions + text through a hash-partition anti-join
    seg_schema = pa.schema(
        [("h1", pa.int64()), ("h2", pa.int64()), ("doc_id", pa.int64()),
         ("i", pa.int64()), ("seg", pa.string()), ("n_segs", pa.int64())]
    )
    # sentinel digest: survives the anti-join so a fully-duplicated doc
    # still reaches the stitch with clean_text='' instead of vanishing.
    # (doc_id, INT64_MIN) collides with a real duplicated segment's md5
    # only at ~2^-64 per segment — the same collision-resistance this
    # op's digest-equality dup test already assumes.
    _SENTINEL_H2 = -(1 << 63)

    def explode_full(batch: pd.DataFrame) -> pa.Table:
        h1s, h2s, ids, idx, segs, totals = [], [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            ss = _segments(text)
            h1, h2 = _seg_digests(text)
            h1s.append(h1)
            h2s.append(h2)
            ids.extend([int(doc_id)] * len(ss))
            idx.extend(range(len(ss)))
            segs.extend(ss)
            totals.extend([len(ss)] * len(ss))
            h1s.append(np.array([int(doc_id)], dtype=np.int64))
            h2s.append(np.array([_SENTINEL_H2], dtype=np.int64))
            ids.append(int(doc_id))
            idx.append(-1)
            segs.append("")
            totals.append(len(ss))
        return pa.table(
            {"h1": pa.array(np.concatenate(h1s) if h1s
                            else np.array([], dtype=np.int64)),
             "h2": pa.array(np.concatenate(h2s) if h2s
                            else np.array([], dtype=np.int64)),
             "doc_id": pa.array(ids, type=pa.int64()),
             "i": pa.array(idx, type=pa.int64()),
             "seg": pa.array(segs, type=pa.string()),
             "n_segs": pa.array(totals, type=pa.int64())},
            schema=seg_schema,
        )

    exploded = docs.map_batches(explode_full, batch_format="pandas")
    kept = exploded.join(
        dup_hashes, join_type="left_anti",
        num_partitions=max(1, min(join_partitions, n_dup // 64 + 1)),
        on=("h1", "h2"),
    )

    def stitch(group: pd.DataFrame) -> pa.Table:
        g = group[group["i"] >= 0].sort_values("i")
        return pa.table(
            {"doc_id": [int(group["doc_id"].iloc[0])],
             "clean_text": [" ".join(g["seg"])],
             "n_removed": [int(group["n_segs"].iloc[0]) - len(g)]},
            schema=out_schema,
        )

    return (
        kept.groupby("doc_id").map_groups(stitch, batch_format="pandas")
        .sort("doc_id")
    )


# ---- exact substring dedup (stride-1 windows, Lee et al. 2022) -----------

SUBSTR_WINDOW = 16  # words per stride-1 window


def substring_dedup(sf_dir: str, window: int = SUBSTR_WINDOW,
                    broadcast_limit: int = 200_000,
                    join_partitions: int = 8):
    """Exact duplicated-SUBSTRING removal in the style of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better"):
    where :func:`segment_dedup_clean` cuts ALIGNED non-overlapping
    segments, this pass slides a ``window``-word window at stride 1, so
    a duplicated run is caught at ANY word offset, and every word
    covered by at least one corpus-duplicated window is cut.
    Overlapping duplicated windows merge naturally into maximal removed
    ranges — the per-word coverage union IS the range merge.

    Duplicated = the window's md5 occurs ≥ 2 times corpus-wide counting
    multiplicity (self-repeats cut too, as in the paper's suffix-array
    formulation which counts positions, not documents).  Docs shorter
    than ``window`` words have no windows and pass through unchanged.

    Distributed plan (mirrors :func:`segment_dedup_clean`): pass 1
    explodes hash-only rows (stride 1 → ~W rows/doc; the full 128-bit
    digest ships as two int64 columns under a 1024-way coarse bucket
    key — the text never shuffles) into a bucketed vectorized count
    (not a high-cardinality groupby(hash) aggregate); reconstruction is
    size-adaptive on the duplicated-hash count — broadcast set +
    second streaming pass under ``broadcast_limit`` (text moves zero
    times), else the dup (doc_id, i) start positions are aggregated
    per doc (output-bounded: ≤ one list per doc) and hash-join
    co-partitioned back onto the docs by doc_id, so the text moves
    once and the driver never sees it.

    Output (all docs): ``doc_id, clean_text, n_removed`` where
    ``n_removed`` counts removed WORDS (covered positions), sorted by
    doc_id.
    """
    import pyarrow as pa
    import ray

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("clean_text", pa.string()),
         ("n_removed", pa.int64())]
    )
    dup_schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64())])

    # _docs already splits to small row blocks (read_docs_split), so
    # the md5-heavy explode/clean passes get task parallelism; ONE
    # materialized read feeds the detection pass and the clean pass
    _docs_m = _docs(sf_dir).materialize()

    def docs():
        return _docs_m

    def _win_digests(words: list[str]) -> list[bytes]:
        return [
            hashlib.md5(" ".join(words[i:i + window]).encode()).digest()
            for i in range(len(words) - window + 1)
        ]

    def _split64(ds_: list[bytes]):
        h1 = np.array([int.from_bytes(d[:8], "big", signed=True) for d in ds_],
                      dtype=np.int64)
        h2 = np.array([int.from_bytes(d[8:], "big", signed=True) for d in ds_],
                      dtype=np.int64)
        return h1, h2

    def explode_hashes(batch: pd.DataFrame) -> pa.Table:
        digests = []
        for text in batch["text"]:
            digests.extend(_win_digests(text.split(" ")))
        # stride-1 hashes are almost all unique, so a direct
        # groupby(hash) is a high-cardinality aggregate (the slow
        # path — see the ngram pair-dedup precedent above): instead
        # the full 128-bit digest ships as two int64 columns (2.4
        # bytes-per-window vs 32-char hex) under a 1024-way coarse
        # bucket key, and each bucket counts vectorized
        h1, h2 = _split64(digests)
        return pa.table(
            {"gbkt": pa.array((h1 & 1023).astype(np.int32)),
             "h1": pa.array(h1), "h2": pa.array(h2)}
        )

    _warn = _skew_warn()

    def bucket_dups(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("substring_dedup.gbkt", len(group), _warn)
        sizes = group.groupby(["h1", "h2"]).size()
        dup = sizes.index[sizes.values >= 2]
        if len(dup) == 0:
            return dup_schema.empty_table()
        h1, h2 = zip(*dup)
        return pa.table(
            {"h1": pa.array(list(h1), type=pa.int64()),
             "h2": pa.array(list(h2), type=pa.int64())},
            schema=dup_schema,
        )

    dup_hashes = (
        docs().map_batches(explode_hashes, batch_format="pandas")
        .groupby("gbkt")
        .map_groups(bucket_dups, batch_format="pandas")
        .materialize()
    )
    n_dup = dup_hashes.count()

    def _cut(words: list[str], starts: list[int]) -> tuple[str, int]:
        covered = np.zeros(len(words), dtype=bool)
        for i in starts:
            covered[i:i + window] = True
        n_cut = int(covered.sum())
        if not n_cut:
            return " ".join(words), 0
        kept = [w for w, c in zip(words, covered) if not c]
        return " ".join(kept), n_cut

    if n_dup <= broadcast_limit:
        df = dup_hashes.to_pandas()
        dup_ref = ray.put(
            frozenset(zip(df["h1"], df["h2"])) if n_dup else frozenset()
        )

        def clean(batch: pd.DataFrame) -> pa.Table:
            from .curation import _cached_broadcast

            dup = _cached_broadcast(dup_ref)
            ids, outs, removed = [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                words = text.split(" ")
                h1, h2 = _split64(_win_digests(words))
                starts = [i for i, k in enumerate(zip(h1, h2)) if k in dup]
                clean_text, n_cut = _cut(words, starts)
                ids.append(int(doc_id))
                outs.append(clean_text)
                removed.append(n_cut)
            return pa.table(
                {"doc_id": pa.array(ids, type=pa.int64()),
                 "clean_text": pa.array(outs, type=pa.string()),
                 "n_removed": pa.array(removed, type=pa.int64())},
                schema=out_schema,
            )

        return (
            docs().map_batches(clean, batch_format="pandas")
            .sort("doc_id")
        )

    # join branch: dup start positions per doc (small), co-partitioned
    # back onto the docs — the stride-1 window TEXT is never exploded
    pos_schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                            ("doc_id", pa.int64()), ("i", pa.int64())])

    def explode_pos(batch: pd.DataFrame) -> pa.Table:
        digests, ids, idx = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            ds_ = _win_digests(text.split(" "))
            digests.extend(ds_)
            ids.extend([int(doc_id)] * len(ds_))
            idx.extend(range(len(ds_)))
        h1, h2 = _split64(digests)
        return pa.table(
            {"h1": pa.array(h1), "h2": pa.array(h2),
             "doc_id": pa.array(ids, type=pa.int64()),
             "i": pa.array(idx, type=pa.int64())},
            schema=pos_schema,
        )

    dup_pos = (
        docs().map_batches(explode_pos, batch_format="pandas")
        .join(dup_hashes, join_type="inner",
              num_partitions=max(1, min(join_partitions, n_dup // 64 + 1)),
              on=("h1", "h2"))
        .select_columns(["doc_id", "i"])
    )

    # common-schema union + one groupby co-partitions dup starts with
    # their doc text (the hybrid_topk join pattern — no join operator)
    union_schema = pa.schema(
        [("doc_id", pa.int64()), ("i", pa.int64()), ("text", pa.string())]
    )

    def tag_pos(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "i": t["i"],
             "text": pa.nulls(t.num_rows, type=pa.string())},
            schema=union_schema,
        )

    def tag_doc(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"],
             "i": pa.array([-1] * t.num_rows, type=pa.int64()),
             "text": t["text"]},
            schema=union_schema,
        )

    both = dup_pos.map_batches(tag_pos, batch_format="pyarrow").union(
        docs().map_batches(tag_doc, batch_format="pyarrow")
    )

    def stitch(group: pd.DataFrame) -> pa.Table:
        text_rows = group[group["i"] < 0]
        words = str(text_rows["text"].iloc[0]).split(" ")
        starts = [int(i) for i in group["i"] if i >= 0]
        clean_text, n_cut = _cut(words, starts)
        return pa.table(
            {"doc_id": [int(group["doc_id"].iloc[0])],
             "clean_text": [clean_text],
             "n_removed": [n_cut]},
            schema=out_schema,
        )

    return (
        both.groupby("doc_id").map_groups(stitch, batch_format="pandas")
        .sort("doc_id")
    )


# ---- winnowing fingerprints (local document fingerprinting) ---------------

WINNOW_K = 4  # words per k-gram
WINNOW_W = 4  # winnowing window (guarantee threshold t = w + k - 1 grams)
WINNOW_DF_CAP = 64  # fingerprints shared by more docs are boilerplate
WINNOW_MIN_SHARED = 2

_WINNOW_SCHEMA = None


def _winnow_schema():
    import pyarrow as pa

    global _WINNOW_SCHEMA
    if _WINNOW_SCHEMA is None:
        _WINNOW_SCHEMA = pa.schema([("doc_id", pa.int64()), ("fp", pa.int64())])
    return _WINNOW_SCHEMA


def _winnow_batch(batch: pd.DataFrame, kgram: int, window: int):
    """(doc_id, fp) rows for one batch — the winnowing selection kernel
    shared by :func:`winnow_fingerprints` and
    :func:`winnow_overlap_pairs`."""
    import numpy as np
    import pyarrow as pa

    ids_out, fps_out = [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        words = text.split(" ")
        n_g = len(words) - kgram + 1
        if n_g < window:
            continue
        h = np.fromiter(
            (int(hashlib.md5(
                " ".join(words[i : i + kgram]).encode()
             ).hexdigest()[:8], 16) for i in range(n_g)),
            dtype=np.int64, count=n_g,
        )
        win = np.lib.stride_tricks.sliding_window_view(h, window)
        # rightmost argmin = (window-1) - argmin over the reversed
        # window (np.argmin returns the FIRST minimum)
        rev_arg = np.argmin(win[:, ::-1], axis=1)
        sel = np.arange(len(win)) + (window - 1) - rev_arg
        fps = np.unique(h[sel])
        ids_out.extend([int(doc_id)] * len(fps))
        fps_out.extend(fps.tolist())
    return pa.table(
        {"doc_id": pa.array(ids_out, type=pa.int64()),
         "fp": pa.array(fps_out, type=pa.int64())},
        schema=_winnow_schema(),
    )


def winnow_fingerprints(sf_dir: str, kgram: int = WINNOW_K,
                        window: int = WINNOW_W, concurrency=None):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local-fingerprinting scheme): per doc, hash
    every ``kgram``-word shingle, slide a ``window`` of consecutive
    hashes, and select each window's minimum (RIGHTMOST position on
    ties — the paper's robust-winnowing rule); the distinct selected
    hashes are the doc's fingerprint set.

    Any shared substring of at least ``window + kgram - 1`` words is
    GUARANTEED to contribute at least one common fingerprint between
    two documents, while only ~2/(window+1) of the gram hashes are
    kept — the index a partial-overlap dedup builds is a fraction of
    the full shingle index (complementary to ``ngram_jaccard_dups``,
    which measures whole-doc set similarity, and to
    ``passage_dedup``'s aligned fixed windows).

    One stateless streaming pass, vectorized per doc (sliding-window
    min + rightmost-argmin via reversed argmax over a stride view);
    md5-derived gram hashes keep the selection mirrored bit-exactly in
    the SQL oracle.  Docs with fewer than ``window + kgram - 1`` words
    have no complete window and emit nothing (mirrored by the oracle's
    window ranges).
    """
    df = (
        _docs(sf_dir)
        .map_batches(lambda b: _winnow_batch(b, kgram, window),
                     batch_format="pandas")
        .to_pandas()
        .sort_values(["doc_id", "fp"])
        .reset_index(drop=True)
    )
    for c in ("doc_id", "fp"):
        df[c] = df[c].astype("int64")
    return df


def winnow_overlap_pairs(sf_dir: str, kgram: int = WINNOW_K,
                         window: int = WINNOW_W,
                         df_cap: int = WINNOW_DF_CAP,
                         min_shared: int = WINNOW_MIN_SHARED,
                         concurrency=None):
    """Partial-overlap candidate pairs from shared winnowing
    fingerprints: (doc_a, doc_b, n_shared) for every pair sharing at
    least ``min_shared`` selected fingerprints — the MOSS-style
    "did these documents copy a passage from each other" sweep that
    whole-document similarity misses.

    Plan (the ngram_jaccard_dups shuffle discipline, but counting
    shared keys per pair instead of deduping):

    1. fingerprint pass (shared :func:`_winnow_batch` kernel) —
       (doc_id, fp) rows, already distinct per doc;
    2. coarse ``fp & 1023`` bucket groupby → one vectorized run-walk
       emits each fp's pairs, with the df 2..``df_cap`` gate enforced
       ON the run (all copies of an fp co-locate under the bucket key,
       so the run length IS the document frequency; hotter fps are
       boilerplate — a viral footer would otherwise emit O(df²)
       pairs — and the cap is mirrored in the oracle so both sides
       see the identical pair universe).  r3 shipped the gate as a
       separate count aggregate + hash join before the bucket
       exchange — a second full all-to-all over the same rows for a
       filter the walk enforces for free (the same fold as
       ngram_jaccard_dups);
    3. a second small groupby on the 64-way ``pkey`` counts each
       pair's shared fps (only pair rows shuffle, never documents).
    """
    import numpy as np
    import pyarrow as pa

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_shared", pa.int64())]
    )

    def with_bucket(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy()
        return t.append_column(
            "fbkt", pa.array(fp & np.int64(1023), type=pa.int64())
        )

    fps = (
        _docs(sf_dir)
        .map_batches(lambda b: _winnow_batch(b, kgram, window),
                     batch_format="pandas")
        .map_batches(with_bucket, batch_format="pyarrow")
    )

    _warn = _skew_warn()

    def bucket_pairs(group: pd.DataFrame):
        """All pairs of every fp run inside one coarse bucket — the
        shared :func:`_run_pair_walk` kernel with the 2..``df_cap``
        stop-fp gate on the raw run (fingerprints are already distinct
        per doc, so each fp contributes a pair at most once)."""
        return _run_pair_walk(group, ["fp"], max_df=df_cap,
                              tag="winnow_overlap_pairs.fbkt", warn=_warn)

    def count_pairs(g: pd.DataFrame):
        arr, counts = np.unique(
            np.stack([g["doc_a"].to_numpy().astype(np.int64),
                      g["doc_b"].to_numpy().astype(np.int64)], axis=1),
            axis=0, return_counts=True,
        )
        keep = counts >= min_shared
        return pa.table(
            {"doc_a": arr[keep, 0], "doc_b": arr[keep, 1],
             "n_shared": counts[keep].astype(np.int64)},
            schema=out_schema,
        )

    raw = (
        fps.groupby("fbkt")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()  # cut the plan between the two all-to-alls
    )
    # when the raw pair rows fit the driver budget the shared-fp count
    # runs locally (np.unique with counts == the per-pkey kernel) and
    # the second all-to-all is skipped; only a genuinely large pair
    # universe pays the pkey exchange (metadata count, no extra pass)
    if raw.count() <= 2_000_000:
        g = raw.select_columns(["doc_a", "doc_b"]).to_pandas()
        df = count_pairs(g).to_pandas()
    else:
        df = (
            raw.groupby("pkey")
            .map_groups(count_pairs, batch_format="pandas")
            .to_pandas()
        )
    df = df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    for c in ("doc_a", "doc_b", "n_shared"):
        df[c] = df[c].astype("int64")
    return df[["doc_a", "doc_b", "n_shared"]]


# -- cross-source contamination matrix ------------------------------------

OVERLAP_NGRAM = 8
_OVL_BUCKETS = 1024


def source_overlap_matrix(sf_dir: str, n: int = OVERLAP_NGRAM):
    """Cross-source contamination: for every source pair (a < b), the
    number of DISTINCT word ``n``-grams occurring in both — the
    leakage matrix a corpus curator reads before mixing sources (the
    same 8-gram convention as benchmark decontamination).  Docs
    shorter than ``n`` words contribute their whole text as one gram
    (the ngram_jaccard convention).

    Scale plan: per-doc distinct grams ship as md5 digests split into
    two int64 columns (never gram text), a coarse digest bucket
    co-partitions all copies of a gram in ONE exchange, each bucket
    dedupes (gram, source) and self-merges to source pairs
    vectorized, and only the constant-size per-bucket pair counts
    reach a driver-side final sum.  Pair blowup per gram is bounded by
    S(S-1)/2 (sources, not docs)."""
    return _gram_label_matrix(
        sf_dir, lambda b: b["source"].astype(str).tolist(), n,
        ("source_a", "source_b", "n_shared_grams"))


def _gram_label_matrix(sf_dir: str, label_of, n: int,
                       out_cols: tuple[str, str, str]):
    """Shared kernel for the gram-contamination matrices: distinct
    word ``n``-grams per doc tagged with ``label_of(batch)``'s label,
    one coarse digest-bucket exchange, per-bucket (label_a < label_b)
    pair counts, driver-side sum.  See :func:`source_overlap_matrix`
    for the scale argument (pair blowup bounded by labels², never
    docs)."""
    import hashlib as _hashlib

    import pyarrow as pa

    col_a, col_b, col_n = out_cols
    part_schema = pa.schema(
        [("bucket", pa.int64()), ("hi", pa.int64()), ("lo", pa.int64()),
         ("label", pa.string())]
    )

    def grams(batch: pd.DataFrame) -> pa.Table:
        rows_b, rows_hi, rows_lo, rows_lab = [], [], [], []
        for text, lab in zip(batch["text"], label_of(batch)):
            words = text.split(" ")
            if len(words) < n:
                gs = {" ".join(words)}
            else:
                gs = {" ".join(words[i : i + n])
                      for i in range(len(words) - n + 1)}
            for g in gs:
                d = _hashlib.md5(g.encode()).digest()
                hi = int.from_bytes(d[:8], "big", signed=True)
                lo = int.from_bytes(d[8:], "big", signed=True)
                rows_b.append((hi & 0x7FFFFFFF) % _OVL_BUCKETS)
                rows_hi.append(hi)
                rows_lo.append(lo)
                rows_lab.append(lab)
        return pa.table(
            {"bucket": pa.array(rows_b, type=pa.int64()),
             "hi": pa.array(rows_hi, type=pa.int64()),
             "lo": pa.array(rows_lo, type=pa.int64()),
             "label": pa.array(rows_lab, type=pa.string())},
            schema=part_schema,
        )

    pair_schema = pa.schema(
        [(col_a, pa.string()), (col_b, pa.string()), ("n", pa.int64())]
    )

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        d = group.drop_duplicates(["hi", "lo", "label"])
        m = d.merge(d, on=["hi", "lo"], suffixes=("_a", "_b"))
        m = m[m["label_a"] < m["label_b"]]
        if m.empty:
            return pair_schema.empty_table()
        cnt = m.groupby(["label_a", "label_b"], as_index=False).size()
        return pa.table(
            {col_a: cnt["label_a"].astype(str).to_numpy(),
             col_b: cnt["label_b"].astype(str).to_numpy(),
             "n": cnt["size"].to_numpy().astype("int64")},
            schema=pair_schema,
        )

    # the per-bucket pair counts are ≤ L²/2 rows per bucket (labels,
    # not docs) — the final sum is driver-side, no second all-to-all
    df = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(grams, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .groupby([col_a, col_b], as_index=False)
        .agg(**{col_n: ("n", "sum")})
        .sort_values([col_a, col_b]).reset_index(drop=True)
    )
    df[col_n] = df[col_n].astype("int64")
    return df


def split_leakage(sf_dir: str, n: int = OVERLAP_NGRAM):
    """Cross-SPLIT contamination: for every train/val/test split pair,
    the number of DISTINCT word ``n``-grams occurring in documents of
    both — the leakage audit run after :func:`curation.
    stratified_split` assigns splits.  Exact-duplicate leakage is zero
    BY CONSTRUCTION (the split key is the content hash); this measures
    the near-duplicate leakage that construction cannot prevent, on
    the same 8-gram convention as benchmark decontamination.

    Same single-exchange kernel as :func:`source_overlap_matrix`
    (labels² pair bound, here 3 labels); the split label re-derives
    per doc from ``md5(text)`` exactly as the split op does."""
    from .curation import SPLIT_MOD, SPLIT_TRAIN_LT, SPLIT_VAL_LT

    def label_of(batch: pd.DataFrame) -> list[str]:
        labs = []
        for t in batch["text"]:
            bkt = int(hashlib.md5(t.encode()).hexdigest()[:8],
                      16) % SPLIT_MOD
            labs.append("train" if bkt < SPLIT_TRAIN_LT
                        else "val" if bkt < SPLIT_VAL_LT else "test")
        return labs

    return _gram_label_matrix(
        sf_dir, label_of, n, ("split_a", "split_b", "n_shared_grams"))


def source_dup_rate(sf_dir: str, n_buckets: int = 1024,
                    driver_limit: int = 5_000_000):
    """Per-source exact-duplicate rate: document count, distinct
    content-hash count and ``dup_rate = 1 − distinct/docs`` (rounded
    to 6 decimals) — the source-health scorecard run before choosing
    per-source mixture weights (a high dup rate demotes a crawl
    source before any pair-level dedup spends cycles on it).

    Distributed plan: per-batch DISTINCT (source, md5-as-2×int64)
    digest partials (text never shuffles — the :func:`exact_dedup`
    digest convention) → under ``driver_limit`` the distinct table
    finalizes on the driver; above it the digest rows co-partition
    under the 1024-way coarse digest bucket and each bucket counts its
    distinct (source, digest) pairs vectorized — every copy of a
    digest lands in one bucket, so the per-source sums are exact.
    Document counts reduce through a separate one-column partial
    pass."""
    import numpy as np
    import pyarrow as pa

    exp_schema = pa.schema([("source", pa.string()), ("h1", pa.int64()),
                            ("h2", pa.int64()), ("bucket", pa.int64())])

    def digest_partial(b: pd.DataFrame) -> pa.Table:
        h1s = np.empty(len(b), dtype=np.int64)
        h2s = np.empty(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"].to_numpy()):
            d = hashlib.md5(str(t).encode()).digest()
            h1s[i] = int.from_bytes(d[:8], "big", signed=True)
            h2s[i] = int.from_bytes(d[8:], "big", signed=True)
        g = pd.DataFrame({"source": b["source"].to_numpy(),
                          "h1": h1s, "h2": h2s}).drop_duplicates()
        h1 = g["h1"].to_numpy()
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "h1": h1, "h2": g["h2"].to_numpy(),
                         "bucket": h1 % n_buckets}, schema=exp_schema)

    cnt_schema = pa.schema([("source", pa.string()),
                            ("n_distinct", pa.int64())])

    def bucket_distinct(group: pd.DataFrame) -> pa.Table:
        if not len(group):
            return pa.table({"source": pa.array([], pa.string()),
                             "n_distinct": pa.array([], pa.int64())},
                            schema=cnt_schema)
        g = (group.drop_duplicates(["source", "h1", "h2"])
             .groupby("source", as_index=False).size()
             .rename(columns={"size": "n_distinct"}))
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "n_distinct": g["n_distinct"].to_numpy()
                         .astype("int64")}, schema=cnt_schema)

    digests = (_docs(sf_dir, columns=("source", "text"),
                     rows_per_block=2048)
               .map_batches(digest_partial, batch_format="pandas")
               .materialize())
    if digests.count() <= driver_limit:
        d = (digests.to_pandas()
             .drop_duplicates(["source", "h1", "h2"])
             .groupby("source", as_index=False).size()
             .rename(columns={"size": "n_distinct"}))
    else:
        d = (digests.groupby("bucket")
             .map_groups(bucket_distinct, batch_format="pandas")
             .to_pandas()
             .groupby("source", as_index=False)
             .agg(n_distinct=("n_distinct", "sum")))

    counts = (_docs(sf_dir, columns=("source",), rows_per_block=4096)
              .map_batches(lambda b: b.groupby("source", as_index=False)
                           .size().rename(columns={"size": "n_docs"}),
                           batch_format="pandas")
              .to_pandas()
              .groupby("source", as_index=False)
              .agg(n_docs=("n_docs", "sum")))
    df = counts.merge(d, on="source").sort_values("source")
    df = df.reset_index(drop=True)
    for c in ("n_docs", "n_distinct"):
        df[c] = df[c].astype("int64")
    df["dup_rate"] = (1 - df["n_distinct"] / df["n_docs"]).round(6)
    return df[["source", "n_docs", "n_distinct", "dup_rate"]]


# -- edit-distance verification over winnow candidates ---------------------

LEV_CAP = 256  # distances at or above the cap report the cap itself


def _lev_bytes(a: np.ndarray, b: np.ndarray, cap: int = LEV_CAP) -> int:
    """Exact Levenshtein distance between two uint8 arrays, capped at
    ``cap`` (a distance >= cap returns cap) — BYTE semantics, matching
    DuckDB's ``levenshtein`` (which edits UTF-8 bytes, not codepoints).

    Classic two-row DP with the horizontal dependency resolved by the
    running-min transform, so each row is pure numpy:

        new[j] = min(m[j], new[j-1] + 1)   with  new[0] = i
               = j + cummin(m[t] - t)[j]   over  t <= j

    O(len(a)) vectorized rows; rows whose minimum reaches ``cap``
    terminate early (the per-row DP minimum is non-decreasing)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return min(max(n, m), cap)
    if abs(n - m) >= cap:
        return cap
    idx = np.arange(m + 1, dtype=np.int32)
    prev = idx.copy()
    m2 = np.empty(m + 1, dtype=np.int32)
    for i in range(1, n + 1):
        cost = (b != a[i - 1]).astype(np.int32)
        m2[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=m2[1:])
        new = np.minimum.accumulate(m2 - idx) + idx
        if int(new.min()) >= cap:
            return cap
        prev, m2 = new, prev
    return int(min(prev[-1], cap))


def levenshtein_near_dups(sf_dir: str, kgram: int = WINNOW_K,
                          window: int = WINNOW_W,
                          df_cap: int = WINNOW_DF_CAP,
                          min_shared: int = WINNOW_MIN_SHARED,
                          cap: int = LEV_CAP):
    """Character-level edit distance for every winnow candidate pair:
    (doc_a, doc_b, lev_dist) where the candidates are exactly
    :func:`winnow_overlap_pairs`' output and ``lev_dist`` is the
    byte-level Levenshtein distance capped at ``cap`` — the
    post-filter a near-dup pipeline runs when "same passage" evidence
    needs tightening into "same text modulo small edits" (the one
    dedup family where order of edits, not bag-of-grams, decides).

    Oracled directly against DuckDB's ``levenshtein()`` (byte
    semantics on both sides; the engine diffs the UTF-8 encoding).

    Scale contract: the pair universe is duplicated-content-sized
    (the winnow df-gate bounds each fingerprint's fan-out at
    ``df_cap``); texts for pair members broadcast ONCE via
    ``ray.put`` keyed by doc_id — corpus text never shuffles and
    never lands on the driver.  The DP kernel is O(len_a) numpy rows
    per pair with an early cap exit, spread over the pool by
    repartitioning the pair list."""
    import pyarrow as pa
    import ray

    pairs = winnow_overlap_pairs(sf_dir, kgram=kgram, window=window,
                                 df_cap=df_cap, min_shared=min_shared)
    out_cols = ("doc_a", "doc_b", "lev_dist")
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in out_cols})

    need = np.union1d(pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy())
    need_ref = ray.put(set(int(x) for x in need))

    grab_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def grab(b: pd.DataFrame) -> pa.Table:
        ids = ray.get(need_ref)
        kept = b[b["doc_id"].isin(ids)]
        return pa.table({"doc_id": kept["doc_id"].to_numpy(np.int64),
                         "text": kept["text"].astype(str).tolist()},
                        schema=grab_schema)

    texts = (_docs(sf_dir, rows_per_block=4096)
             .map_batches(grab, batch_format="pandas")
             .to_pandas())
    text_ref = ray.put(dict(zip(texts["doc_id"].astype(int),
                                texts["text"])))

    import ray.data as rd

    out_schema = pa.schema([(c, pa.int64()) for c in out_cols])

    def dist_batch(b: pd.DataFrame) -> pa.Table:
        tmap = ray.get(text_ref)
        enc = {}

        def _enc(did: int) -> np.ndarray:
            arr = enc.get(did)
            if arr is None:
                arr = np.frombuffer(
                    tmap[did].encode("utf-8"), dtype=np.uint8)
                enc[did] = arr
            return arr

        da = b["doc_a"].to_numpy()
        db = b["doc_b"].to_numpy()
        dist = np.fromiter(
            (_lev_bytes(_enc(int(x)), _enc(int(y)), cap)
             for x, y in zip(da, db)),
            dtype=np.int64, count=len(da))
        return pa.table({"doc_a": da.astype(np.int64),
                         "doc_b": db.astype(np.int64),
                         "lev_dist": dist}, schema=out_schema)

    n_blocks = max(1, min(64, len(pairs) // 8))
    df = (rd.from_pandas(pairs[["doc_a", "doc_b"]])
          .repartition(n_blocks)
          .map_batches(dist_batch, batch_format="pandas")
          .to_pandas()
          .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    for c in out_cols:
        df[c] = df[c].astype("int64")
    return df[list(out_cols)]
