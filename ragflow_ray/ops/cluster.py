"""Embedding clustering ops: distributed Lloyd k-means and
SemDeDup-style within-cluster semantic pruning.

* :func:`kmeans_clusters` — the canonical iterative distributed
  algorithm: a fixed number of Lloyd rounds where each round is ONE
  streaming pass over the embeddings (assign inside ``map_batches``,
  per-batch integer-scaled partial sums per cluster, a K×dim-row
  groupby reduce, centroid update on the driver).  Only
  ``k × dim``-sized partials ever shuffle; the table itself never
  collects.  Float safety: per-cluster sums are micro-scaled int64
  (the ``label_vector_sums`` convention), so the reduced sums — and
  therefore the next round's centroids — are exact integers regardless
  of batch partitioning, making every round bit-deterministic under
  any parallelism.
* :func:`semdedup` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
  shape: cluster with k-means, then inside each cluster greedily keep
  the id-minimal representative of every cosine-similar group.  The
  per-cluster prune runs in ``groupby("cluster").map_groups`` — at
  corpus scale k grows with the corpus (the paper's own scaling rule),
  so each group stays bounded and no driver state exists.

Both are oracled by an independent naive re-derivation fixture
(``tools/make_cluster_fixtures.py`` — no ragflow_ray imports), keyed
by the embeddings corpus key ``SUM(floor(embedding[0]*1e6+0.5))``.

Reference anchor: the reference's RAPTOR stage clusters chunk
embeddings with GMM+UMAP around an LLM summarizer
(/root/reference/rag/raptor.py:86-140) — out of scope as an LLM stage;
these ops are the deterministic, engine-native clustering equivalents
a training-data pipeline needs (semantic dedup, corpus bucketing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

K_CLUSTERS = 8
KMEANS_ITERS = 3
SEMDEDUP_TAU = 0.25
_SCALE = 1_000_000

_PARTIAL_SCHEMA = pa.schema(
    [
        ("cluster", pa.int64()),
        ("dim", pa.int64()),
        ("sum_x1e6", pa.int64()),
        ("n", pa.int64()),
    ]
)

_ASSIGN_SCHEMA = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])


def _embeddings(sf_dir: str):
    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _seed_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: the k id-minimal vectors, normalized (the
    corpus writer emits vec_id-sorted files; head-only read)."""
    from .ann import _head_rows

    df = (
        _head_rows(f"{sf_dir}/embeddings.parquet", k, ["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .head(k)
    )
    return _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by cosine; np.argmax tie-break = lowest index
    (pinned, mirrored by the fixture)."""
    return np.argmax(mat @ centroids.T, axis=1)


def _combine_partials(b: pd.DataFrame) -> pa.Table:
    """Narrow tree-combine level for Lloyd partials: sum ~128 blocks'
    worth of (cluster, dim) partial rows into one — a plain map stage,
    never an all-to-all."""
    g = b.groupby(["cluster", "dim"], as_index=False).agg(
        sum_x1e6=("sum_x1e6", "sum"), n=("n", "sum"))
    return pa.table(
        {
            "cluster": g["cluster"].to_numpy().astype(np.int64),
            "dim": g["dim"].to_numpy().astype(np.int64),
            "sum_x1e6": g["sum_x1e6"].to_numpy().astype(np.int64),
            "n": g["n"].to_numpy().astype(np.int64),
        },
        schema=_PARTIAL_SCHEMA,
    )


def _lloyd_rounds(sf_dir: str, k: int, iters: int, concurrency,
                  batch_size: int = 4096, ds=None) -> np.ndarray:
    """Run ``iters`` Lloyd rounds, one streaming pass each; returns the
    final normalized centroid matrix.

    Per-round reduce shape (r5): the per-batch partials are exact
    int64 (cluster, dim) sums, so the reduce is order-free — instead
    of a ``groupby().aggregate()`` all-to-all (measured ~0.8 s FIXED
    cost per round at 32 cpus, pure scheduling for 512-row partials)
    the partials flow through ONE narrow ``map_batches`` combine level
    (×~128 fan-in, no shuffle) and the driver sums the remainder.
    Driver rows are bounded by ceil(n_blocks/128) × k × dim — a 100-TB
    run at ~1M blocks is ~4M tiny int rows; add a second combine level
    before this ever matters.  The input dataset is materialized once
    and reused across rounds (and by callers for the final assignment
    pass): an iterative algorithm re-reading parquet every round pays
    O(iters) scans; the object store spills if the vector table
    outgrows memory."""
    centroids = _seed_centroids(sf_dir, k)
    if ds is None:
        ds = _embeddings(sf_dir).materialize()

    for _ in range(iters):
        # plain stateless function, NOT an actor pool: a fresh pool per
        # Lloyd round pays actor spin-up every iteration, while the
        # centroid matrix is k×dim floats (~4 KB) — cheap to ship in
        # the task closure to warm workers
        cts = centroids

        def partial_sums(batch: pd.DataFrame, _c=cts) -> pa.Table:
            mat = _norm_rows(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            )
            scaled = np.floor(mat * _SCALE + 0.5).astype(np.int64)
            assign = _assign(mat, _c)
            kk, dim = _c.shape
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, assign, scaled)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cluster": np.repeat(np.arange(kk, dtype=np.int64), dim),
                    "dim": np.tile(np.arange(dim, dtype=np.int64), kk),
                    "sum_x1e6": sums.reshape(-1),
                    "n": np.repeat(counts, dim),
                },
                schema=_PARTIAL_SCHEMA,
            )

        reduced = (
            ds.map_batches(
                partial_sums,
                batch_format="pandas",
                batch_size=batch_size,
            )
            .map_batches(
                _combine_partials,
                batch_format="pandas",
                batch_size=128 * k * centroids.shape[1],
            )
            .to_pandas()
            .groupby(["cluster", "dim"], as_index=False)
            .agg(s=("sum_x1e6", "sum"), n=("n", "sum"))
        )
        new = centroids.copy()
        dim = centroids.shape[1]
        piv = reduced.sort_values(["cluster", "dim"])
        for c, grp in piv.groupby("cluster"):
            n = int(grp["n"].iloc[0])  # same count repeated per dim
            if n == 0:
                continue
            vec = grp["s"].to_numpy(dtype=np.float64) / _SCALE / n
            if len(vec) == dim:
                new[int(c)] = vec
        centroids = _norm_rows(new)
    return centroids


def kmeans_clusters(
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    concurrency=None,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Final (vec_id, cluster) assignment after ``iters`` Lloyd rounds
    plus the per-cluster member count.  ``batch_size`` only re-slices
    the streaming passes — the integer-scaled partial sums make the
    result bit-identical under ANY batching/parallelism (pinned by
    test_ops.TestCluster)."""
    ds = _embeddings(sf_dir).materialize()
    centroids = _lloyd_rounds(sf_dir, k, iters, concurrency, batch_size,
                              ds=ds)

    def assigner(batch: pd.DataFrame, _c=centroids) -> pa.Table:
        mat = _norm_rows(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        )
        return pa.table(
            {
                "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
                "cluster": _assign(mat, _c).astype(np.int64),
            },
            schema=_ASSIGN_SCHEMA,
        )

    df = (
        ds
        .map_batches(
            assigner,
            batch_format="pandas",
            batch_size=batch_size,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sizes = df.groupby("cluster")["vec_id"].transform("size").astype("int64")
    df["cluster_size"] = sizes
    return df


def semdedup(
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    tau: float = SEMDEDUP_TAU,
    concurrency=None,
) -> pd.DataFrame:
    """SemDeDup: within each k-means cluster, greedy id-order sweep —
    a vector is dropped when its cosine to an already-kept member of
    the same cluster reaches ``tau``; ``dup_of`` is the id-minimal
    such keeper.  Similarities are rounded to 9 dp before the
    threshold test (the ann.py float-jitter convention, mirrored by
    the fixture)."""
    ds = _embeddings(sf_dir).materialize()
    centroids = _lloyd_rounds(sf_dir, k, iters, concurrency, ds=ds)

    def assigner(batch: pd.DataFrame, _c=centroids) -> pd.DataFrame:
        mat = _norm_rows(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        )
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
                "cluster": _assign(mat, _c).astype(np.int64),
                "embedding": batch["embedding"],
            }
        )

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("vec_id")
        ids = group["vec_id"].to_numpy().astype(np.int64)
        mat = _norm_rows(np.stack(group["embedding"].to_numpy()).astype(np.float64))
        kept_rows: list[int] = []
        keep = np.zeros(len(ids), dtype=bool)
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        for i in range(len(ids)):
            if kept_rows:
                sims = np.round(mat[kept_rows] @ mat[i], 9)
                hit = np.nonzero(sims >= tau)[0]
                if hit.size:
                    dup_of[i] = ids[kept_rows[int(hit[0])]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": group["cluster"].to_numpy().astype(np.int64),
                "keep": keep.astype(np.int64),
                "dup_of": dup_of,
            }
        )

    out = (
        ds
        .map_batches(
            assigner,
            batch_format="pandas",
            batch_size=4096,
        )
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in ("vec_id", "cluster", "keep", "dup_of"):
        out[c] = out[c].astype("int64")
    return out


RAPTOR_K_TOP = 4
RAPTOR_K_LEAF = 3
RAPTOR_LOCAL_ITERS = 3


def raptor_tree(
    sf_dir: str,
    k_top: int = RAPTOR_K_TOP,
    k_leaf: int = RAPTOR_K_LEAF,
    iters: int = KMEANS_ITERS,
    local_iters: int = RAPTOR_LOCAL_ITERS,
    concurrency=None,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """RAPTOR-style two-level cluster tree over the embeddings (the
    reference's RAPTOR stage builds exactly this hierarchy around an
    LLM summarizer, rag/raptor.py:86-140 — the summarizer is out of
    scope, the tree is the engine-native part): level 0 is the
    distributed integer-scaled Lloyd of :func:`kmeans_clusters`;
    level 1 re-clusters each level-0 cluster LOCALLY inside
    ``groupby("l0").map_groups`` — the RAPTOR recursion step, where
    each group is orders of magnitude smaller than the corpus, so
    local float Lloyd is safe and no second corpus-wide exchange
    happens.

    Level-1 pinned spec (mirrored by tools/make_raptor_fixture.py):
    group rows sorted by vec_id; seeds = the min(k_leaf, n) id-minimal
    normalized vectors; ``local_iters`` Lloyd rounds with cosine
    argmax assignment (ties → lowest index) and normalized float
    means over members in vec_id order (empty subclusters keep their
    centroid).

    Output: ``vec_id, l0, l1, leaf_size`` sorted by vec_id.
    """
    ds = _embeddings(sf_dir).materialize()
    centroids = _lloyd_rounds(sf_dir, k_top, iters, concurrency,
                              batch_size, ds=ds)

    def assigner(batch: pd.DataFrame, _c=centroids) -> pd.DataFrame:
        mat = _norm_rows(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        )
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
                "l0": _assign(mat, _c).astype(np.int64),
                "embedding": batch["embedding"],
            }
        )

    def subcluster(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("vec_id")
        ids = group["vec_id"].to_numpy().astype(np.int64)
        mat = _norm_rows(
            np.stack(group["embedding"].to_numpy()).astype(np.float64)
        )
        k_eff = min(k_leaf, len(ids))
        cents = mat[:k_eff].copy()
        assign = _assign(mat, cents)
        for _ in range(local_iters):
            new = cents.copy()
            for c in range(k_eff):
                members = mat[assign == c]
                if len(members):
                    new[c] = members.sum(axis=0) / len(members)
            cents = _norm_rows(new)
            assign = _assign(mat, cents)
        leaf_sizes = np.bincount(assign, minlength=k_eff)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "l0": group["l0"].to_numpy().astype(np.int64),
                "l1": assign.astype(np.int64),
                "leaf_size": leaf_sizes[assign].astype(np.int64),
            }
        )

    out = (
        ds
        .map_batches(assigner, batch_format="pandas", batch_size=batch_size)
        .groupby("l0")
        .map_groups(subcluster, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in ("vec_id", "l0", "l1", "leaf_size"):
        out[c] = out[c].astype("int64")
    return out


def embedding_covariance(sf_dir: str, scale: int = 1000):
    """Exact covariance (second-moment) matrix of the embedding column
    — the upper triangle as integer numerators

        ``cov_num[i, j] = n·Σ(v_i·v_j) − Σv_i · Σv_j``

    over milli-scaled integer components ``v = round(x·1000)`` (the
    population covariance of the quantized vectors is
    ``cov_num / n²``; returning the integer numerator keeps the oracle
    comparison float-free, the :func:`label_vector_sums` convention one
    moment higher).  The matrix feeds PCA / whitening / feature-drift
    diagnostics over an embedding corpus.

    Distributed plan: ONE streaming pass; each batch stacks its rows
    into a ``(b, d)`` matrix, quantizes, and emits the ``d(d+1)/2``
    upper-triangle Gram entries (``Vᵀ·V`` — a single int64 matmul)
    plus the ``d`` component sums and a count, all under one
    ``(i, j, s)`` schema — constant ``O(d²)`` rows per batch, never
    data-sized.  One narrow combine level shrinks the partials; the
    driver finalizes with PYTHON-int products (no intermediate
    overflow).  Nothing shuffles.

    int64 envelope (documented, not silent): per-batch Gram entries
    are ≤ b·scale² ≈ 4e9, combine sums ≤ n·scale² — safe past 1e12
    rows; the EMITTED ``cov_num ≤ n²·scale²`` caps the exact-integer
    output at ~3e6 rows with unit-range embeddings.  Beyond that,
    lower ``scale`` (the statistic is then covariance of the coarser
    quantization — still exact for what it names)."""
    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    part_schema = pa.schema(
        [("i", pa.int64()), ("j", pa.int64()), ("s", pa.int64())]
    )

    def gram_partial(b: pd.DataFrame) -> pa.Table:
        mat = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        v = np.floor(mat * scale + 0.5).astype(np.int64)
        d = v.shape[1]
        gram = v.T @ v  # int64 accumulate, b·scale² bounded
        iu, ju = np.triu_indices(d)
        rows_i = np.concatenate(
            [iu, np.arange(d, dtype=np.int64), [-1]])
        rows_j = np.concatenate(
            [np.full(d, -1, dtype=np.int64), [-1]], dtype=np.int64)
        rows_j = np.concatenate([ju, rows_j])
        s = np.concatenate(
            [gram[iu, ju], v.sum(axis=0),
             np.array([len(v)], dtype=np.int64)])
        return pa.table(
            {"i": rows_i.astype(np.int64), "j": rows_j.astype(np.int64),
             "s": s.astype(np.int64)},
            schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["i", "j"], as_index=False, sort=False).agg(
            s=("s", "sum"))
        return pa.table(
            {"i": g["i"].to_numpy().astype(np.int64),
             "j": g["j"].to_numpy().astype(np.int64),
             "s": g["s"].to_numpy().astype(np.int64)},
            schema=part_schema)

    sums = (
        ds.map_batches(gram_partial, batch_format="pandas",
                       batch_size=4096)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["i", "j"], as_index=False).agg(s=("s", "sum"))
    )
    n = int(sums.loc[(sums["i"] == -1) & (sums["j"] == -1), "s"].iloc[0])
    sx = {int(r["i"]): int(r["s"])
          for _, r in sums[(sums["j"] == -1) & (sums["i"] >= 0)].iterrows()}
    tri = sums[(sums["i"] >= 0) & (sums["j"] >= 0)].sort_values(
        ["i", "j"]).reset_index(drop=True)
    cov_num = [
        n * int(s) - sx[int(i)] * sx[int(j)]
        for i, j, s in zip(tri["i"], tri["j"], tri["s"])
    ]
    return pd.DataFrame({
        "i": tri["i"].astype("int64"),
        "j": tri["j"].astype("int64"),
        "cov_num": pd.Series(cov_num, dtype="int64"),
    })
