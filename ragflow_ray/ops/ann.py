"""Similarity search over the ``embeddings`` table.

* :func:`brute_force_topk` — exact cosine top-k per query: the query
  matrix is broadcast once (``ray.put``), every batch does one
  float64 matmul, per-batch top-k partials are merged in a final
  small reduction.  DuckDB-oracled (integer ranks, deterministic
  vec_id tiebreak).
* :func:`ivf_topk` — the scale path: coarse k-means-style centroids
  from a deterministic sample, search only the ``n_probe`` nearest
  inverted lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


import pyarrow as pa

# declared scorer-output schema: identical hashable block schemas
# across actors (silences Ray's block-schema dedup warning)
_PARTIAL_SCHEMA = pa.schema(
    [("q_vec_id", pa.int64()), ("vec_id", pa.int64()), ("score", pa.float64())]
)


def _embeddings(sf_dir: str):
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _head_rows(path: str, n: int, columns: list[str]):
    """Read only the head of a parquet file: stream record batches and
    stop as soon as ``n`` rows are in hand.  Never materializes the
    table — at corpus scale the embeddings are many files and the
    query/seed set is the first rows of the first (vec_id-sorted) file,
    so the driver-side read stays O(n), not O(dataset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    batches = []
    got = 0
    for rb in pf.iter_batches(batch_size=max(n, 256), columns=columns):
        batches.append(rb)
        got += rb.num_rows
        if got >= n:
            break
    if not batches:
        return pf.schema_arrow.empty_table().select(columns)
    return pa.Table.from_batches(batches)


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The first ``n_queries`` vec_ids (ordered) are the query set —
    deterministic and reproducible from SQL.  The corpus writer emits
    vec_id-sorted files, so the head of the file is the id-minimal set;
    the head is re-sorted defensively."""
    t = _head_rows(
        f"{sf_dir}/embeddings.parquet", n_queries, ["vec_id", "embedding"]
    )
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return df["vec_id"].to_numpy(), q


def _score_wanted(ids, mat, assignment, wanted, queries, query_ids, k):
    """Shared bucketed-scorer kernel (IVF lists and LSH buckets):
    for each wanted bucket, exact-score its member vectors against the
    probing queries and keep a per-(query, bucket, batch) partial
    top-k.  The tie-break / rounding contract downstream is
    load-bearing for the fixture oracles — keep ONE copy."""
    rows_q, rows_v, rows_s = [], [], []
    for b, qis in wanted.items():
        mask = assignment == b
        if not mask.any():
            continue
        sub, sub_ids = mat[mask], ids[mask]
        sims = queries[qis] @ sub.T
        for row, qi in enumerate(qis):
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims[row], kk - 1)[:kk]
            rows_q.extend([query_ids[qi]] * kk)
            rows_v.extend(sub_ids[idx])
            rows_s.extend(sims[row][idx])
    return pa.table(
        {
            "q_vec_id": np.asarray(rows_q, dtype=np.int64),
            "vec_id": np.asarray(rows_v, dtype=np.int64),
            "score": np.asarray(rows_s, dtype=np.float64),
        },
        schema=_PARTIAL_SCHEMA,
    )


def _reduce_topk(partials, k: int):
    """Distributed per-query top-k reduce over the partial Dataset —
    top-k under the (score rounded to 9 dp desc, vec_id asc) order is
    a semilattice reduce (merging partial top-ks and re-taking top-k
    yields the global top-k), so it needs NO shuffle: two narrow
    ``map_batches`` combine levels (~100× fan-in each, measured vs the
    r4 ``groupby(q_vec_id)`` all-to-all which cost ~0.8 s of fixed
    scheduling per call at 32 cpus) collapse the nq × k × n_blocks
    partial rows to nq × k × ⌈n_blocks/10^4⌉ before the driver — at
    100 TB (~10^6 blocks) that is ~100 × nq × k short fixed-width
    rows.  The rounding / tie-break contract matches
    :func:`_merge_partials` exactly (which re-applies it idempotently
    on the result)."""

    def combine_topk(b: pd.DataFrame) -> pa.Table:
        g = b.copy()
        g["score_r"] = g["score"].round(9)
        g = g.sort_values(["q_vec_id", "score_r", "vec_id"],
                          ascending=[True, False, True])
        g = g.groupby("q_vec_id", as_index=False).head(k)
        return pa.table(
            {"q_vec_id": g["q_vec_id"].to_numpy().astype(np.int64),
             "vec_id": g["vec_id"].to_numpy().astype(np.int64),
             "score": g["score"].to_numpy().astype(np.float64)},
            schema=_PARTIAL_SCHEMA,
        )

    out = partials
    for _ in range(2):
        out = out.map_batches(combine_topk, batch_format="pandas",
                              batch_size=8192)
    return out


def _merge_partials(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Tiny driver-side merge of the per-batch partial top-k set
    (nq × k × n_blocks rows): round scores to absorb summation-order
    jitter, sort (score desc, vec_id asc), head(k), 1-based rank."""
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("q_vec_id", "vec_id", "rank")}
        )
    df = df.copy()
    df["score_r"] = df["score"].round(9)
    df = df.sort_values(["q_vec_id", "score_r", "vec_id"],
                        ascending=[True, False, True])
    df = df.groupby("q_vec_id", as_index=False).head(k)
    df["rank"] = df.groupby("q_vec_id").cumcount() + 1
    return df[["q_vec_id", "vec_id", "rank"]].reset_index(drop=True)


def brute_force_topk(sf_dir: str, k: int = 10, n_queries: int = 5, concurrency=None):
    """Exact cosine top-k: → (q_vec_id, vec_id, rank), rank 1..k, ties
    broken by ascending vec_id.  Scores are excluded from the result so
    the comparison is float-robust; ordering uses them internally.

    The scorer is a stateless task (``concurrency`` is accepted for
    caller compatibility): the broadcast query matrix is pure numpy,
    so ``ray.get`` per task is a zero-copy plasma view — an actor pool
    here bought nothing but ~2 s of per-query startup (the r5
    finding)."""
    import ray

    query_ids, queries = _load_queries(sf_dir, n_queries)
    qref = ray.put(queries)

    def score_topk(batch: pd.DataFrame):
        qmat = ray.get(qref)  # (nq, dim) unit vectors, zero-copy
        ids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = qmat @ mat.T  # (nq, batch)
        kk = min(k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q.extend([query_ids[qi]] * kk)
            out_v.extend(ids[idx])
            out_s.extend(sims[qi][idx])
        return pa.table(
            {
                "q_vec_id": np.asarray(out_q, dtype=np.int64),
                "vec_id": np.asarray(out_v, dtype=np.int64),
                "score": np.asarray(out_s, dtype=np.float64),
            },
            schema=_PARTIAL_SCHEMA,
        )

    partials = _embeddings(sf_dir).map_batches(
        score_topk, batch_format="pandas", batch_size=4096,
    )
    # final merge: the partial top-k set is tiny (nq × k × n_blocks)
    # distributed nq-x-k reduce first: the driver never sees a
    # block-count-proportional row set
    return _merge_partials(_reduce_topk(partials, k).to_pandas(), k)


def range_search(sf_dir: str, threshold: float = 0.2, n_queries: int = 5):
    """Exact cosine radius (range) search: every (query, vector) pair
    with similarity strictly above ``threshold`` → (q_vec_id, vec_id),
    sorted.  The top-k family answers "the nearest k"; range search
    answers "everything this close" — the recall-oriented variant a
    retrieval pipeline uses for candidate generation.

    Same distributed shape as :func:`brute_force_topk` minus the
    reduce: the query matrix broadcasts once (``ray.put``, zero-copy
    numpy view per task), each batch does one float64 matmul and
    forwards ONLY its matching id pairs — the result stream is
    match-sized, never corpus-sized, and there is no shuffle at all.
    Scores are excluded from the result; the default threshold sits
    ≥1e-4 from every pairwise similarity in the testdata, so the
    strict ``>`` agrees bit-for-bit with the SQL oracle's."""
    import ray

    query_ids, queries = _load_queries(sf_dir, n_queries)
    qref = ray.put(queries)
    pair_schema = pa.schema([("q_vec_id", pa.int64()), ("vec_id", pa.int64())])

    def match_pairs(batch: pd.DataFrame) -> pa.Table:
        qmat = ray.get(qref)
        ids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = qmat @ mat.T  # (nq, batch)
        qi, vi = np.nonzero(sims > threshold)
        return pa.table(
            {"q_vec_id": np.asarray(query_ids)[qi].astype(np.int64),
             "vec_id": ids[vi].astype(np.int64)},
            schema=pair_schema,
        )

    df = (
        _embeddings(sf_dir)
        .map_batches(match_pairs, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    return (df.sort_values(["q_vec_id", "vec_id"]).reset_index(drop=True)
            .astype({"q_vec_id": "int64", "vec_id": "int64"}))


def label_vector_sums(sf_dir: str):
    """Per-label element-wise vector aggregate: micro-scaled integer
    sums per dimension (the exact form of a centroid computation that
    a float-summation order cannot perturb) + member count."""
    import pandas as pd
    import ray.data as rd

    from ..sources.readers import read_parquet_clean
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        scaled = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        n, dim = scaled.shape
        # partial per-batch per-label sums — only (labels × dim) rows
        # leave each batch
        df = pd.DataFrame(
            {
                "label": np.repeat(batch["label"].to_numpy(), dim).astype("int64"),
                "dim": np.tile(np.arange(dim, dtype=np.int64), n),
                "sum_x1e6": scaled.reshape(-1),
                "n": np.repeat(1, n * dim).astype("int64"),
            }
        )
        return df.groupby(["label", "dim"], as_index=False).agg(
            sum_x1e6=("sum_x1e6", "sum"), n=("n", "sum")
        )

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_x1e6", alias_name="sum_x1e6"), Sum("n", alias_name="n_values"))
        .sort(["label", "dim"])
        .to_pandas()
    )
    for c in ("label", "dim", "sum_x1e6", "n_values"):
        out[c] = out[c].astype("int64")
    return out


def ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 5, n_lists: int = 16,
             n_probe: int = 4, concurrency=None):
    """IVF approximate top-k: centroid list from a deterministic sample,
    per-vector list assignment inside map_batches, search only the
    n_probe nearest lists per query."""
    import ray

    query_ids, queries = _load_queries(sf_dir, n_queries)

    # deterministic "training": centroids = normalized vectors of the
    # first n_lists * 4 ids, k-means-lite (one assignment+mean round);
    # head-only read — the full table never touches the driver
    seed_df = (
        _head_rows(f"{sf_dir}/embeddings.parquet", n_lists * 4, ["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .head(n_lists * 4)
    )
    seeds = np.stack(seed_df["embedding"].to_numpy()).astype(np.float64)
    seeds /= np.maximum(np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12)
    centroids = seeds[:n_lists].copy()
    assign = np.argmax(seeds @ centroids.T, axis=1)
    for c in range(n_lists):
        members = seeds[assign == c]
        if len(members):
            centroids[c] = members.mean(axis=0)
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    probe_lists = np.argsort(-(queries @ centroids.T), axis=1)[:, :n_probe]
    wanted: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for li in lists:
            wanted.setdefault(int(li), []).append(qi)

    cref = ray.put((centroids, queries, query_ids, wanted))

    def ivf_score(batch: pd.DataFrame):
        # stateless task; the broadcast tuple caches per worker process
        from .curation import _cached_broadcast

        cents, qmat, qids, want = _cached_broadcast(cref)
        ids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(mat @ cents.T, axis=1)
        return _score_wanted(ids, mat, lists, want, qmat, qids, k)

    partials = _embeddings(sf_dir).map_batches(
        ivf_score, batch_format="pandas", batch_size=4096
    )
    # distributed nq-x-k reduce first: the driver never sees a
    # block-count-proportional row set
    return _merge_partials(_reduce_topk(partials, k).to_pandas(), k)


LSH_PLANES = 8
LSH_SEED = 7


def _lsh_planes(dim: int) -> np.ndarray:
    """The pinned random-hyperplane set (seed IS the spec, shared with
    the independent fixture re-derivation)."""
    return np.random.RandomState(LSH_SEED).randn(LSH_PLANES, dim)


def _lsh_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row: bit b set iff ``v @ plane_b >= 0``."""
    bits = (mat @ planes.T) >= 0.0
    return bits @ (1 << np.arange(LSH_PLANES, dtype=np.int64))


def lsh_topk(sf_dir: str, k: int = 10, n_queries: int = 5, concurrency=None):
    """LSH-bucketed approximate top-k — the hash-partition scale path
    next to :func:`ivf_topk`'s clustered one: vectors land in
    ``2**LSH_PLANES`` sign-pattern buckets, each query probes its own
    bucket plus all Hamming-distance-1 neighbors (multi-probe), and
    only probed-bucket members are scored exactly.

    Unlike IVF there is no training read at all — the planes are a
    seeded constant — so the stage broadcast is O(planes + queries)
    regardless of corpus size, and bucket assignment inside
    ``map_batches`` is one matmul + sign reduction per batch.
    """
    import ray

    query_ids, queries = _load_queries(sf_dir, n_queries)
    planes = _lsh_planes(queries.shape[1])

    q_buckets = _lsh_buckets(queries, planes)
    wanted: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        probes = [int(b)] + [int(b) ^ (1 << p) for p in range(LSH_PLANES)]
        for pb in probes:
            wanted.setdefault(pb, []).append(qi)

    cref = ray.put((planes, queries, query_ids, wanted))

    def lsh_score(batch: pd.DataFrame):
        # stateless task; the broadcast tuple caches per worker process
        from .curation import _cached_broadcast

        pl, qmat, qids, want = _cached_broadcast(cref)
        ids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        buckets = _lsh_buckets(mat, pl)
        # buckets partition the corpus, so (q, vec) pairs stay
        # unique across probes — no pair dedup needed downstream
        return _score_wanted(ids, mat, buckets, want, qmat, qids, k)

    partials = _embeddings(sf_dir).map_batches(
        lsh_score, batch_format="pandas", batch_size=4096,
    )
    # distributed nq-x-k reduce first: the driver never sees a
    # block-count-proportional row set
    return _merge_partials(_reduce_topk(partials, k).to_pandas(), k)


# ---- product quantization (ADC) top-k -------------------------------------

PQ_SUBSPACES = 8     # 64-dim vectors -> 8 subvectors of 8 dims
PQ_CENTROIDS = 16    # 4-bit codes per subspace
PQ_ITERS = 3


def _pq_assign(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Euclidean nearest sub-centroid; np.argmin tie-break = lowest
    index (pinned, mirrored by tools/make_pq_fixture.py)."""
    d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    return np.argmin(d, axis=1)


def pq_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
            m: int = PQ_SUBSPACES, n_cent: int = PQ_CENTROIDS,
            iters: int = PQ_ITERS, concurrency=None,
            batch_size: int = 4096):
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al. 2011) — the memory-bounded scale path of the ANN
    family: at 10^12 vectors neither the float matrix (brute force)
    nor per-list float storage (IVF) fits, but ``m`` 4-bit codes per
    vector (4 bytes here vs 256 for the raw float32s) do.

    Codebook training is the same distributed integer-scaled Lloyd
    discipline as ops/cluster.py, run for ALL subspaces in one
    streaming pass per round: per batch, each subvector assigns to its
    Euclidean-nearest sub-centroid and only (subspace, centroid, dim)
    partial sums leave the task — m × n_cent × (D/m) = D × n_cent
    rows, constant in corpus size.  Scoring streams once more: each
    batch encodes its vectors (argmin per subspace) and scores every
    query via the ADC table (query-subvector · sub-centroid inner
    products, summed over subspaces in fixed order), emitting only
    per-batch partial top-k rows.

    Deterministic: integer-scaled training sums, batch-independent
    per-row encode/score, scores rounded to 9 dp in the tiny driver
    merge, ties to ascending vec_id.  Oracled by the independent
    re-derivation tools/make_pq_fixture.py.  Output: (q_vec_id,
    vec_id, rank).
    """
    import pyarrow as pa
    import ray

    query_ids, queries = _load_queries(sf_dir, n_queries)

    # ---- codebook: seeds = sub-slices of the n_cent id-minimal vectors
    seed_df = (
        _head_rows(f"{sf_dir}/embeddings.parquet", n_cent,
                   ["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id").head(n_cent)
    )
    seed = np.stack(seed_df["embedding"].to_numpy()).astype(np.float64)
    seed /= np.maximum(np.linalg.norm(seed, axis=1, keepdims=True), 1e-12)
    dim = seed.shape[1]
    dsub = dim // m
    cents = seed.reshape(n_cent, m, dsub).transpose(1, 0, 2).copy()  # [m, K, dsub]

    partial_schema = pa.schema(
        [("sub", pa.int64()), ("cent", pa.int64()), ("dim", pa.int64()),
         ("sum_x1e6", pa.int64()), ("n", pa.int64())]
    )

    # one materialization shared by every training round AND the ADC
    # scoring pass — an iterative algorithm re-reading parquet per
    # round pays O(iters) scans (the ops/cluster.py r5 discipline);
    # the object store spills if the vector table outgrows memory
    ds = _embeddings(sf_dir).materialize()
    scale = 1_000_000

    def train_combine(b: pd.DataFrame) -> pa.Table:
        # narrow tree-combine for the int64 training partials — the
        # reduce is order-free, so no all-to-all is needed (see
        # cluster._lloyd_rounds for the measured fixed-cost rationale)
        g = b.groupby(["sub", "cent", "dim"], as_index=False).agg(
            sum_x1e6=("sum_x1e6", "sum"), n=("n", "sum"))
        return pa.table(
            {"sub": g["sub"].to_numpy().astype(np.int64),
             "cent": g["cent"].to_numpy().astype(np.int64),
             "dim": g["dim"].to_numpy().astype(np.int64),
             "sum_x1e6": g["sum_x1e6"].to_numpy().astype(np.int64),
             "n": g["n"].to_numpy().astype(np.int64)},
            schema=partial_schema,
        )

    for _ in range(iters):
        cts = cents

        def train_partial(batch: pd.DataFrame, _c=cts) -> pa.Table:
            mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scaled = np.floor(mat * scale + 0.5).astype(np.int64)
            subs, cs, dims, sums, ns = [], [], [], [], []
            for s in range(m):
                sub = mat[:, s * dsub:(s + 1) * dsub]
                a = _pq_assign(sub, _c[s])
                ssum = np.zeros((n_cent, dsub), dtype=np.int64)
                np.add.at(ssum, a, scaled[:, s * dsub:(s + 1) * dsub])
                cnt = np.bincount(a, minlength=n_cent).astype(np.int64)
                subs.append(np.full(n_cent * dsub, s, dtype=np.int64))
                cs.append(np.repeat(np.arange(n_cent, dtype=np.int64), dsub))
                dims.append(np.tile(np.arange(dsub, dtype=np.int64), n_cent))
                sums.append(ssum.reshape(-1))
                ns.append(np.repeat(cnt, dsub))
            return pa.table(
                {"sub": np.concatenate(subs), "cent": np.concatenate(cs),
                 "dim": np.concatenate(dims), "sum_x1e6": np.concatenate(sums),
                 "n": np.concatenate(ns)},
                schema=partial_schema,
            )

        reduced = (
            ds.map_batches(train_partial, batch_format="pandas",
                           batch_size=batch_size)
            .map_batches(train_combine, batch_format="pandas",
                         batch_size=128 * m * n_cent * dsub)
            .to_pandas()
            .groupby(["sub", "cent", "dim"], as_index=False)
            .agg(s=("sum_x1e6", "sum"), n=("n", "sum"))
            .sort_values(["sub", "cent", "dim"])
        )
        new = cents.copy()
        for (s, c), grp in reduced.groupby(["sub", "cent"]):
            n = int(grp["n"].iloc[0])
            if n == 0:
                continue
            vec = grp["s"].to_numpy(dtype=np.float64) / scale / n
            if len(vec) == dsub:
                new[int(s), int(c)] = vec
        if np.array_equal(new, cents):
            # exact convergence: identical centroids make every later
            # round a bit-identical no-op, so stopping here cannot
            # change the result — the pinned ITERS=3 fixture spec
            # (tools/make_pq_fixture.py) is unaffected
            break
        cents = new

    # ---- ADC scoring pass: encode per batch, score via table lookups
    qsub = queries.reshape(len(queries), m, dsub)
    # table[q, s, j] = <query q's subvector s, sub-centroid j>
    table = np.einsum("qsd,sjd->qsj", qsub, cents)
    tref = ray.put((cents, table))

    score_schema = pa.schema(
        [("q_vec_id", pa.int64()), ("vec_id", pa.int64()),
         ("score", pa.float64())]
    )

    def pq_score(batch: pd.DataFrame) -> pa.Table:
        # stateless task; the (codebooks, ADC table) broadcast caches
        # per worker process
        from .curation import _cached_broadcast

        cents_b, table = _cached_broadcast(tref)
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        codes = np.empty((len(ids), m), dtype=np.int64)
        for s in range(m):
            codes[:, s] = _pq_assign(
                mat[:, s * dsub:(s + 1) * dsub], cents_b[s]
            )
        qs, vs, sc = [], [], []
        for qi, qid in enumerate(query_ids):
            # score = Σ_s table[qi, s, code_s] in fixed s order
            scores = table[qi, np.arange(m), codes].sum(axis=1)
            kk = min(k, len(ids))
            top = np.argpartition(-scores, kk - 1)[:kk]
            qs.append(np.full(kk, int(qid), dtype=np.int64))
            vs.append(ids[top])
            sc.append(scores[top])
        return pa.table(
            {"q_vec_id": np.concatenate(qs),
             "vec_id": np.concatenate(vs),
             "score": np.concatenate(sc)},
            schema=score_schema,
        )

    partials = ds.map_batches(
        pq_score, batch_format="pandas", batch_size=batch_size,
    )
    # distributed nq-x-k reduce first: the driver never sees a
    # block-count-proportional row set
    return _merge_partials(_reduce_topk(partials, k).to_pandas(), k)


def _label_centroids(ds):
    """Micro-scaled-integer label centroids over an (embedding, label)
    Dataset — Σ round(x·1e6) per (label, dim) through per-batch
    partials + one narrow combine level, finalized on the driver
    (labels are strata: bounded).  The integer sums make the float64
    centroid bit-identical under any summation order — the exactness
    anchor :func:`label_coherence` and :func:`label_affinity` share
    with their SQL oracles.  Returns (labels, label→row index,
    centroid matrix)."""
    sum_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                            ("s", pa.int64()), ("n", pa.int64())])

    def cent_partial(b: pd.DataFrame) -> pa.Table:
        mat = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        scaled = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        n, dim = scaled.shape
        g = (pd.DataFrame(
            {"label": np.repeat(b["label"].to_numpy(), dim).astype("int64"),
             "dim": np.tile(np.arange(dim, dtype=np.int64), n),
             "s": scaled.reshape(-1),
             "n": np.ones(n * dim, dtype=np.int64)})
             .groupby(["label", "dim"], as_index=False)
             .agg(s=("s", "sum"), n=("n", "sum")))
        return pa.table({"label": g["label"].to_numpy(),
                         "dim": g["dim"].to_numpy(),
                         "s": g["s"].to_numpy(), "n": g["n"].to_numpy()},
                        schema=sum_schema)

    def cent_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["label", "dim"], as_index=False, sort=False).agg(
            s=("s", "sum"), n=("n", "sum"))
        return pa.table({"label": g["label"].to_numpy().astype("int64"),
                         "dim": g["dim"].to_numpy().astype("int64"),
                         "s": g["s"].to_numpy().astype("int64"),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=sum_schema)

    sums = (ds.map_batches(cent_partial, batch_format="pandas")
            .map_batches(cent_combine, batch_format="pandas",
                         batch_size=65536)
            .to_pandas()
            .groupby(["label", "dim"], as_index=False)
            .agg(s=("s", "sum"), n=("n", "sum")))
    labels = np.sort(sums["label"].unique())
    dim = int(sums["dim"].max()) + 1
    idx = {int(l): i for i, l in enumerate(labels)}
    cents = np.zeros((len(labels), dim), dtype=np.float64)
    for lab, g in sums.groupby("label"):
        g = g.sort_values("dim")
        cents[idx[int(lab)]] = (g["s"].to_numpy().astype(np.float64)
                                / (g["n"].to_numpy() * 1_000_000.0))
    return labels, idx, cents


def label_affinity(sf_dir: str):
    """Pairwise label-centroid cosine matrix (upper triangle,
    label_a < label_b) — the confusable-label diagnostic run next to
    :func:`label_coherence`: two labels whose centroids sit close are
    candidates for merging or for stratified-split leakage review.

    ONE pass builds the shared micro-scaled-integer centroids
    (:func:`_label_centroids`); the k×k cosine matrix is a driver-side
    matmul over the labels-sized centroid matrix (k bounded — never
    data-sized).  Cosines round to 6 decimals (the ann.py float
    idiom)."""
    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    labels, _, cents = _label_centroids(ds)
    cnorm = np.sqrt((cents * cents).sum(axis=1))
    rows_a, rows_b, coss = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            # per-pair dot in the SQL's per-dim-sum order class;
            # round-6 absorbs association
            c = float(np.dot(cents[i], cents[j]) / (cnorm[i] * cnorm[j]))
            rows_a.append(int(labels[i]))
            rows_b.append(int(labels[j]))
            coss.append(round(c, 6))
    return pd.DataFrame({
        "label_a": pd.Series(rows_a, dtype="int64"),
        "label_b": pd.Series(rows_b, dtype="int64"),
        "cos": pd.Series(coss, dtype="float64"),
    })


def label_coherence(sf_dir: str):
    """Intra-label embedding coherence: per label, the mean and min
    cosine of each member vector to its label centroid — the cluster-
    quality / label-noise diagnostic run before using labels as
    training strata (a noisy label shows a low mean and a long
    negative min tail).

    Exactness contract: the centroid is the micro-scaled INTEGER mean
    (:func:`label_vector_sums` form — ``Σ round(x·1e6)`` per dim over
    the label, divided by ``n·1e6`` as float64), so both sides derive
    a bit-identical centroid under any summation order; each member's
    cosine to it rounds to 9 decimals, and the per-label mean of those
    rounds to 6 (the ann.py float-association idiom).

    Distributed plan, two passes over ONE materialized narrow read:
    pass 1 emits per-batch (label × dim) integer partial sums → one
    narrow combine level → labels×dim driver finalize (labels are
    strata: bounded); the tiny centroid matrix ships in the task
    closure of pass 2, which emits per-batch (label, Σcos, min cos, n)
    partials — constant-size per batch — combined the same way.  No
    all-to-all at any point."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    ).materialize()
    labels, idx, cents = _label_centroids(ds)
    cnorm = np.sqrt((cents * cents).sum(axis=1))

    cos_schema = pa.schema([("label", pa.int64()),
                            ("sum_cos", pa.float64()),
                            ("min_cos", pa.float64()),
                            ("n", pa.int64())])

    def cos_partial(b: pd.DataFrame) -> pa.Table:
        mat = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        li = np.asarray([idx[int(l)] for l in b["label"].to_numpy()])
        c = cents[li]
        dot = (mat * c).sum(axis=1)
        nx = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round(dot / (nx * cnorm[li]), 9)
        g = (pd.DataFrame({"label": b["label"].to_numpy().astype("int64"),
                           "cos": cos})
             .groupby("label", as_index=False)
             .agg(sum_cos=("cos", "sum"), min_cos=("cos", "min"),
                  n=("cos", "size")))
        return pa.table({"label": g["label"].to_numpy(),
                         "sum_cos": g["sum_cos"].to_numpy(),
                         "min_cos": g["min_cos"].to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=cos_schema)

    parts = (ds.map_batches(cos_partial, batch_format="pandas")
             .to_pandas()
             .groupby("label", as_index=False)
             .agg(sum_cos=("sum_cos", "sum"), min_cos=("min_cos", "min"),
                  n=("n", "sum")))
    parts = parts.sort_values("label").reset_index(drop=True)
    out = pd.DataFrame({
        "label": parts["label"].astype("int64"),
        "n_vecs": parts["n"].astype("int64"),
        "mean_cos": (parts["sum_cos"] / parts["n"]).round(6),
        "min_cos": parts["min_cos"].astype("float64"),
    })
    return out[["label", "n_vecs", "mean_cos", "min_cos"]]


def ann_recall(sf_dir: str, k: int = 10, n_queries: int = 5,
               concurrency=None):
    """Recall@``k`` of the approximate ANN variants against the exact
    brute-force ground truth — the acceptance gate an index rollout
    runs before swapping retrieval backends (IVF probes trade recall
    for fan-in; LSH buckets trade it for hashing).

    Composition op: the three component searches are this module's
    own distributed queries (each already oracled); the driver-side
    merge is bounded at ``n_queries × k`` rows regardless of corpus
    size.  ``*_hits`` is the exact intersection size per query id;
    ``*_recall`` is ONE division rounded to 6."""
    brute = brute_force_topk(sf_dir, k=k, n_queries=n_queries,
                             concurrency=concurrency)
    ivf = ivf_topk(sf_dir, k=k, n_queries=n_queries,
                   concurrency=concurrency)
    lsh = lsh_topk(sf_dir, k=k, n_queries=n_queries,
                   concurrency=concurrency)

    def hits(approx: pd.DataFrame) -> pd.Series:
        m = brute.merge(approx[["q_vec_id", "vec_id"]],
                        on=["q_vec_id", "vec_id"], how="inner")
        return m.groupby("q_vec_id").size()

    qids = sorted(brute["q_vec_id"].unique())
    ih = hits(ivf).reindex(qids, fill_value=0).astype("int64")
    lh = hits(lsh).reindex(qids, fill_value=0).astype("int64")
    return pd.DataFrame({
        "q_vec_id": pd.Series(qids, dtype="int64"),
        "ivf_hits": ih.to_numpy(),
        "ivf_recall": (ih.to_numpy() / float(k)).round(6),
        "lsh_hits": lh.to_numpy(),
        "lsh_recall": (lh.to_numpy() / float(k)).round(6),
    })
