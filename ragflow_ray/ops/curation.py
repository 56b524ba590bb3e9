"""Corpus-curation operators over the ``documents`` table.

The selection/cleaning passes a training-data pipeline runs between
dedup and tokenization:

* :func:`decontaminate`    — benchmark-overlap check: flag corpus docs
  sharing any 8-gram with a held-out benchmark set (the standard
  train/test contamination sweep).  The benchmark side is tiny and
  broadcast once (``ray.put``); the corpus side streams.
* :func:`stratified_sample` — deterministic content-hash sampling:
  keep a doc iff ``int(md5(text)[:8], 16) % 100 < rate`` — stable
  across reruns, parallelism and row order, and exactly mirrored in
  SQL.
* :func:`quality_filter`   — threshold filter over the quality
  features (token count, punctuation density, stopword presence).
* :func:`length_histogram` — doc-length distribution in 16-token
  buckets (partial-aggregated inside batches; the groupby sees one
  row per (bucket) per block).

All four are exactly DuckDB-oracled via ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..state.skewmon import warn_rows as _skew_warn

# shared ASCII-exact token definition (see textstats._TOKEN_RUN)
from .textstats import _TOKEN_RUN, _WS_ASCII  # noqa: E402

DECON_NGRAM = 8
DECON_BENCHMARK_DOCS = 20

# Quality-gate definition — the ONE source for quality_filter,
# curate_and_pack, and the SQL oracles in __ray_entry__ (which import
# these).  QF_PUNCT / QF_STOP_WORDS are written in the regex subset
# valid in both Python `re` and DuckDB `regexp_*`.
QF_MIN_TOKENS = 16
QF_MAX_PUNCT_X100 = 50
QF_PUNCT = r"[.,!?;:]"
QF_STOP_WORDS = "the|a|of|to|and"
QF_PUNCT_RE = re.compile(QF_PUNCT)
QF_STOP_RE = re.compile(rf"\b(?:{QF_STOP_WORDS})\b")


def _docs(sf_dir: str, columns=("doc_id", "text"), rows_per_block: int = 256):
    from ..sources.readers import read_docs_split

    # split-on-read: the shared one-row-group parquet would otherwise
    # run every Python-heavy per-doc pass as a single task.  Block size
    # is a per-op choice (r3 verdict): 256 for per-doc Python loops,
    # >=2048 where a C-level kernel does the work.
    return read_docs_split(sf_dir, columns=list(columns),
                           rows_per_block=rows_per_block)


def _grams(text: str, n: int) -> set[str]:
    words = text.split(" ")
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def decontaminate(sf_dir: str, n_benchmark: int = DECON_BENCHMARK_DOCS,
                  n: int = DECON_NGRAM):
    """Corpus docs contaminated by the benchmark set: (doc_id, n_hits)
    where n_hits = how many of the doc's distinct 8-grams appear in
    ANY benchmark doc (benchmark = the ``n_benchmark`` lowest doc_ids,
    themselves excluded from the scan).

    The benchmark gram set is built from a bounded head read and
    broadcast once; the corpus never shuffles — contamination checks
    against a fixed eval suite are broadcast joins, not all-to-all.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    # bounded driver read: benchmark = n_benchmark id-minimal docs.
    # The sortedness decision comes from parquet row-group statistics
    # (a footer-only read): non-overlapping ascending doc_id ranges →
    # the head lives entirely in the leading row groups, read just
    # those; otherwise stream every batch with a running nsmallest —
    # either way driver memory is O(n_benchmark + batch), never the
    # table, and the result is exact for ANY row order.
    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    md = pf.metadata
    id_col = next(
        (i for i in range(md.num_columns)
         if md.schema.column(i).name == "doc_id"), None
    )

    def _rg_stats(k: int):
        st = md.row_group(k).column(id_col).statistics
        return (st.min, st.max) if st is not None and st.has_min_max else None

    sorted_layout = id_col is not None and md.num_row_groups > 0
    if sorted_layout:
        prev_max = None
        for k in range(md.num_row_groups):
            s = _rg_stats(k)
            if s is None or (prev_max is not None and s[0] < prev_max):
                sorted_layout = False
                break
            prev_max = s[1]

    if sorted_layout:
        k, rows = 0, 0
        while k < md.num_row_groups and rows < n_benchmark:
            rows += md.row_group(k).num_rows
            k += 1
        head = pf.read_row_groups(
            list(range(k)), columns=["doc_id", "text"]
        ).to_pandas().nsmallest(n_benchmark, "doc_id")
    else:
        head = None
        for rb in pf.iter_batches(batch_size=4096, columns=["doc_id", "text"]):
            chunk = rb.to_pandas()
            head = (
                chunk if head is None else pd.concat([head, chunk])
            ).nsmallest(n_benchmark, "doc_id")
        if head is None:
            head = pd.DataFrame({"doc_id": [], "text": []})
    bench_ids = set(int(i) for i in head["doc_id"])
    bench_grams: set[str] = set()
    for t in head["text"]:
        bench_grams |= _grams(t, n)
    gram_ref = ray.put(bench_grams)
    max_bench = max(bench_ids) if bench_ids else -1

    schema = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])

    def scan(batch: pd.DataFrame):
        grams = ray.get(gram_ref)
        ids, hits = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if int(doc_id) <= max_bench and int(doc_id) in bench_ids:
                continue
            k = len(_grams(text, n) & grams)
            if k:
                ids.append(int(doc_id))
                hits.append(k)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_hits": pa.array(hits, type=pa.int64())},
            schema=schema,
        )

    df = (
        _docs(sf_dir).map_batches(scan, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ("doc_id", "n_hits"):
        df[c] = df[c].astype("int64")
    return df


def _hash_gate_sample(sf_dir: str, carry: str, rate_of):
    """Deterministic content-hash sampling core shared by
    :func:`stratified_sample` and :func:`mixture_sample`: keep a doc
    iff ``int(md5(text)[:8], 16) % 100 < rate_of(batch[carry])`` —
    stable across reruns, parallelism and row order, and exactly
    mirrored in SQL.  ``rate_of`` maps one ``carry``-column value to a
    keep percentage; there is exactly ONE copy of the hash-gate
    invariant here."""
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), (carry, pa.string())])

    def pick(batch: pd.DataFrame):
        ids, vals = [], []
        for doc_id, text, val in zip(batch["doc_id"], batch["text"],
                                     batch[carry]):
            h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
            if h % 100 < rate_of(val):
                ids.append(int(doc_id))
                vals.append(val)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             carry: pa.array(vals, type=pa.string())},
            schema=schema,
        )

    df = (
        _docs(sf_dir, columns=("doc_id", "text", carry))
        .map_batches(pick, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def stratified_sample(sf_dir: str, rate_pct: int = 10):
    """Deterministic ``rate_pct``% content-hash sample, with language
    kept as the stratum column."""
    return _hash_gate_sample(sf_dir, "lang", lambda _lang: rate_pct)


MIXTURE_RATES_PCT = {"src0": 100, "src1": 50, "src2": 25}
MIXTURE_DEFAULT_PCT = 10


def mixture_sample(sf_dir: str, rates_pct: dict[str, int] | None = None,
                   default_pct: int = MIXTURE_DEFAULT_PCT):
    """Corpus mixing: per-source keep rates (upweight curated sources,
    downsample the crawl tail).  Keep iff
    ``int(md5(text)[:8], 16) % 100 < rate(source)`` — the same
    deterministic content-hash gate as :func:`stratified_sample`, but
    with a per-stratum rate table (broadcast implicitly via task
    closure: it is a constant-sized dict, not data).
    """
    rates = dict(MIXTURE_RATES_PCT if rates_pct is None else rates_pct)
    return _hash_gate_sample(
        sf_dir, "source", lambda src: rates.get(src, default_pct)
    )


def quality_filter(sf_dir: str, min_tokens: int = QF_MIN_TOKENS,
                   max_punct_per_token_x100: int = QF_MAX_PUNCT_X100):
    """Keeper ids after the quality gate: enough tokens, bounded
    punctuation density, at least one stopword (the reference-style
    'looks like prose' screen).  Gate definition = the QF_* module
    constants (shared with curate_and_pack and the SQL oracles)."""
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64())])

    def gate(batch: pd.DataFrame):
        text = batch["text"]
        n_tokens = text.str.count(_TOKEN_RUN)
        n_punct = text.str.count(QF_PUNCT_RE)
        has_stop = text.str.count(QF_STOP_RE) > 0
        keep = (
            (n_tokens >= min_tokens)
            & (n_punct * 100 <= max_punct_per_token_x100 * n_tokens)
            & has_stop
        )
        import numpy as np

        ids = batch["doc_id"].to_numpy()[keep.to_numpy()].astype(np.int64)
        return pa.table({"doc_id": ids}, schema=schema)

    df = (
        _docs(sf_dir).map_batches(gate, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def source_rollup(sf_dir: str):
    """Per-source curation dashboard row: doc count, total tokens,
    distinct token-set signatures (the CCNet-style per-domain view —
    ``n_docs - n_distinct_sigs`` is the source's internal-dup count).

    Count-gated on the parquet-footer doc count: under the driver
    budget the narrow (source, sig, n_tokens) rows collect to ONE
    driver groupby computing all three levels (the corpus TEXT never
    collects — only 32-hex sigs).  Past the budget: per-batch
    (source, sig) rows, one groupby to distinct signatures, then
    per-batch partial counts into a tiny per-source groupby.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from .dedup import token_set_signature

    sig_schema = pa.schema(
        [("source", pa.string()), ("sig", pa.string()), ("n_tokens", pa.int64())]
    )

    def sigs(batch: pd.DataFrame):
        out_src, out_sig, out_tok = [], [], []
        n_tok = batch["text"].str.count(_TOKEN_RUN)
        for src, text, nt in zip(batch["source"], batch["text"], n_tok):
            out_src.append(src)
            out_sig.append(token_set_signature(text))
            out_tok.append(int(nt))
        return pa.table(
            {"source": out_src, "sig": out_sig, "n_tokens": out_tok},
            schema=sig_schema,
        )

    rows_ds = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(sigs, batch_format="pandas")
    )

    # count-gate (parquet-footer doc count): the per-doc rows are one
    # 32-hex sig + a source + an int64 each, so under the driver
    # budget all three rollup levels (including the distinct-sig
    # count) run as one driver groupby — no exchange at all.  Past it
    # the three-aggregate distributed path is the scale shape.
    import pyarrow.dataset as pads

    n_total = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    if n_total <= 2_000_000:
        pdf = rows_ds.to_pandas()
        df = (
            pdf.groupby("source", as_index=False)
            .agg(n_docs=("sig", "size"), n_tokens=("n_tokens", "sum"),
                 n_distinct_sigs=("sig", "nunique"))
            .sort_values("source").reset_index(drop=True)
        )
        for c in ("n_docs", "n_tokens", "n_distinct_sigs"):
            df[c] = df[c].astype("int64")
        return df[["source", "n_docs", "n_tokens", "n_distinct_sigs"]]

    # materialized once: two consumers below would otherwise re-run
    # the corpus scan and every md5 (Ray Datasets are lazy lineages)
    rows = rows_ds.materialize()
    per_doc = rows.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens")
    )
    distinct = (
        rows.groupby(["source", "sig"])
        .aggregate(Count(alias_name="_n"))
        .groupby("source")
        .aggregate(Count(alias_name="n_distinct_sigs"))
    )
    a = per_doc.to_pandas()
    b = distinct.to_pandas()
    df = a.merge(b, on="source").sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "n_tokens", "n_distinct_sigs"):
        df[c] = df[c].astype("int64")
    return df[["source", "n_docs", "n_tokens", "n_distinct_sigs"]]


PACK_SEQ_LEN = 2048          # token budget per packed training sequence
PACK_BUCKET = 1024           # docs per prefix-sum bucket


def pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN,
                   bucket: int = PACK_BUCKET,
                   broadcast_limit: int = 2_000_000):
    """Concat-then-split sequence packing: lay every document out on
    one global token tape (in doc_id order) and cut it into
    ``seq_len``-token training sequences — each doc gets the sequence
    index and intra-sequence offset where it starts.

    The global exclusive prefix sum is the interesting distributed
    part (Ray Data has no scan operator):

    1. one streaming pass computes per-bucket token sums
       (bucket = ``doc_id // bucket``; partial sums inside each batch,
       then a tiny groupby over N/bucket rows);
    2. the driver exclusive-scans the bucket sums (driver data is
       #buckets-sized, not corpus-sized) and broadcasts the offsets;
    3. one bounded ``groupby(bucket)`` pass cumsums inside each bucket
       (groups are ≤ ``bucket`` docs by construction — no skew) and
       adds the broadcast bucket offset.

    Token definition = ``_TOKEN_RUN`` match count (maximal runs of
    non-ASCII-whitespace; empty text = 0 tokens), shared with
    ``token_stats`` and its SQL oracle.
    """
    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(_TOKEN_RUN).astype("int64")
        ids = batch["doc_id"].astype("int64")
        return pd.DataFrame(
            {"doc_id": ids, "n_tokens": n, "bucket": ids // bucket}
        )

    # materialized once — the bucket-sum aggregate and the placement
    # groupby both consume it; without this the corpus read and token
    # counting lineage would execute twice
    toks = _docs(sf_dir).map_batches(tokens, batch_format="pandas").materialize()
    return _pack(toks, seq_len, broadcast_limit)


def _pack(toks, seq_len: int, broadcast_limit: int = 2_000_000):
    """The distributed prefix-sum placement over a MATERIALIZED
    Dataset of (doc_id, n_tokens, bucket) rows — shared by
    :func:`pack_sequences` and :func:`curate_and_pack`.

    Count-gated: the rows are three int64s per doc, and the global
    prefix over doc_id-sorted rows is IDENTICAL to the bucket-major
    placement (buckets partition doc_id ranges in order, and each
    bucket's base offset is the cumsum of the preceding buckets'
    totals) — so under the driver budget the whole placement is one
    driver cumsum, skipping both the bucket-sum aggregate and the
    placement exchange.  Past the budget the two-exchange distributed
    path below is the 100-TB shape."""
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    n_rows = toks.count()  # materialized input — metadata count
    if n_rows <= broadcast_limit:
        df = toks.to_pandas().sort_values("doc_id").reset_index(drop=True)
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("doc_id", "n_tokens",
                                           "seq_index", "seq_offset")})
        n = df["n_tokens"].to_numpy().astype(np.int64)
        prefix = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_tokens": n,
             "seq_index": prefix // seq_len, "seq_offset": prefix % seq_len}
        )
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def bucket_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("bucket", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "bucket_tokens"})

    sums = (
        toks.map_batches(bucket_partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("bucket_tokens", alias_name="bucket_tokens"))
        .to_pandas().sort_values("bucket")
    )
    if sums.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "n_tokens",
                                       "seq_index", "seq_offset")})
    offsets = dict(zip(
        sums["bucket"].astype("int64"),
        np.concatenate([[0], np.cumsum(sums["bucket_tokens"].to_numpy())[:-1]])
        .astype("int64"),
    ))
    off_ref = ray.put(offsets)

    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("seq_index", pa.int64()), ("seq_offset", pa.int64())]
    )

    def place(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id")
        base = ray.get(off_ref)[int(g["bucket"].iloc[0])]
        n = g["n_tokens"].to_numpy()
        prefix = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table(
            {"doc_id": g["doc_id"].to_numpy(), "n_tokens": n,
             "seq_index": prefix // seq_len, "seq_offset": prefix % seq_len},
            schema=schema,
        )

    df = (
        toks.groupby("bucket").map_groups(place, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def curate_and_pack(sf_dir: str, seq_len: int = PACK_SEQ_LEN,
                    bucket: int = PACK_BUCKET,
                    broadcast_limit: int = 2_000_000):
    """The end-to-end curation composition as ONE lazy plan: quality
    gate → exact-dedup keepers → sequence packing of the survivors.

    * stage 1 is a single ``map_batches`` that computes the quality
      features, applies the gate, and emits only surviving
      (doc_id, n_tokens, digest) rows — filtered at the source, the
      corpus text never moves past this point (the 128-bit content
      md5 ships as two int64 columns under a 1024-way coarse bucket);
    * exact dedup is ONE coarse-bucket exchange: every copy of a
      content hash co-locates under its bucket, so the id-minimal
      keeper test runs vectorized inside the bucket walk — r4 shipped
      this as a min-per-hash aggregate + ``Dataset.join``, i.e. TWO
      all-to-alls plus the join operator for a filter the walk
      enforces for free (the ngram df-gate fold, applied here in r5);
    * the survivors feed the same bucket prefix-sum placement as
      :func:`pack_sequences`.

    Thresholds and regexes are the QF_* module constants (shared with
    :func:`quality_filter`); the SQL oracle composes the identical
    CTEs (QUALIFY min-per-hash).
    """
    import pyarrow as pa

    feat_schema = pa.schema(
        [("hbkt", pa.int64()), ("h1", pa.int64()), ("h2", pa.int64()),
         ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("bucket", pa.int64())]
    )
    keep_schema = pa.schema([("doc_id", pa.int64()),
                             ("n_tokens", pa.int64()),
                             ("bucket", pa.int64())])

    def survivors(batch: pd.DataFrame):
        text = batch["text"]
        n_tokens = text.str.count(_TOKEN_RUN)
        n_punct = text.str.count(QF_PUNCT_RE)
        has_stop = text.str.count(QF_STOP_RE) > 0
        keep = (
            (n_tokens >= QF_MIN_TOKENS)
            & (n_punct * 100 <= QF_MAX_PUNCT_X100 * n_tokens)
            & has_stop
        ).to_numpy()
        ids = batch["doc_id"].to_numpy()[keep].astype("int64")
        toks = n_tokens.to_numpy()[keep].astype("int64")
        digests = [hashlib.md5(t.encode()).digest()
                   for t in text.to_numpy()[keep]]
        h1 = np.array([int.from_bytes(d[:8], "big", signed=True)
                       for d in digests], dtype=np.int64)
        h2 = np.array([int.from_bytes(d[8:], "big", signed=True)
                       for d in digests], dtype=np.int64)
        return pa.table(
            {"hbkt": pa.array(h1 & np.int64(1023)),
             "h1": pa.array(h1), "h2": pa.array(h2),
             "doc_id": ids, "n_tokens": toks, "bucket": ids // bucket},
            schema=feat_schema,
        )

    _warn = _skew_warn()

    def bucket_keepers(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("curate_and_pack.hbkt", len(group), _warn)
        is_keeper = (
            group.groupby(["h1", "h2"])["doc_id"].transform("min")
            == group["doc_id"]
        ).to_numpy()
        kept = group[is_keeper]
        return pa.table(
            {"doc_id": kept["doc_id"].to_numpy().astype("int64"),
             "n_tokens": kept["n_tokens"].to_numpy().astype("int64"),
             "bucket": kept["bucket"].to_numpy().astype("int64")},
            schema=keep_schema,
        )

    toks = (
        _docs(sf_dir).map_batches(survivors, batch_format="pandas")
        .groupby("hbkt")
        .map_groups(bucket_keepers, batch_format="pandas")
        .materialize()
    )
    return _pack(toks, seq_len, broadcast_limit)


def training_order(sf_dir: str, seed: str = "epoch0"):
    """Deterministic seeded global shuffle for training export: every
    doc gets position key ``md5(doc_id || '-' || seed)`` and the
    corpus is sorted by it — reproducible across runs, parallelism
    and input order, and exactly mirrored in SQL.  The sort is a
    full-corpus all-to-all by design: a training shuffle IS a global
    exchange; at 100 TB the same key feeds ``repartition`` +
    per-partition sort instead of one total order."""
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.string())])

    def key(batch: pd.DataFrame):
        ids = batch["doc_id"].astype("int64")
        pos = [
            hashlib.md5(f"{i}-{seed}".encode()).hexdigest() for i in ids
        ]
        return pa.table(
            {"doc_id": ids.to_numpy(), "pos": pos}, schema=schema
        )

    df = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(key, batch_format="pandas")
        .sort("pos").to_pandas()
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


REP_TOP_WORD_X1000 = 200     # most frequent word ≤ 20% of tokens
REP_TOP_BIGRAM_X1000 = 180   # most frequent bigram ≤ 18% of bigram slots
REP_DUP_TRIGRAM_X1000 = 600  # ≤ 60% of trigram slots inside repeated trigrams


def repetition_signals(sf_dir: str):
    """Gopher-style repetition quality signals per document (Rae et
    al. 2021 §A.1.1, adapted to word-token fractions): the fraction of
    tokens taken by the most frequent word, the fraction of bigram
    slots taken by the most frequent bigram, and the fraction of
    trigram slots covered by trigrams occurring more than once —
    integer-scaled ×1000 (floor) so the DuckDB oracle is bit-exact.
    ``keep`` = 1 when all three are under the Gopher-ish thresholds.

    Embarrassingly parallel: one pass inside ``map_batches``, no
    shuffle; per-doc Counters are bounded by doc length.
    """
    import pyarrow as pa
    from collections import Counter

    schema = pa.schema(
        [("doc_id", pa.int64()), ("top_word_x1000", pa.int64()),
         ("top_bigram_x1000", pa.int64()), ("dup_trigram_x1000", pa.int64()),
         ("keep", pa.int64())]
    )

    def sig(batch: pd.DataFrame):
        out = {k: [] for k in schema.names}
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n = len(words)
            tw = 1000 * max(Counter(words).values()) // n if n else 0
            if n > 1:
                bc = Counter(zip(words, words[1:]))
                tb = 1000 * max(bc.values()) // (n - 1)
            else:
                tb = 0
            if n > 2:
                tc = Counter(zip(words, words[1:], words[2:]))
                dupp = sum(v for v in tc.values() if v >= 2)
                dt = 1000 * dupp // (n - 2)
            else:
                dt = 0
            keep = int(
                tw <= REP_TOP_WORD_X1000
                and tb <= REP_TOP_BIGRAM_X1000
                and dt <= REP_DUP_TRIGRAM_X1000
            )
            out["doc_id"].append(int(doc_id))
            out["top_word_x1000"].append(tw)
            out["top_bigram_x1000"].append(tb)
            out["dup_trigram_x1000"].append(dt)
            out["keep"].append(keep)
        return pa.table(out, schema=schema)

    df = (
        _docs(sf_dir).map_batches(sig, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


QUANTILES_X100 = (50, 90, 99)


def length_quantiles(sf_dir: str):
    """Exact token-length quantiles (p50/p90/p99) computed by the
    distributed counting-sort pattern: token counts are small ints, so
    a per-value count histogram (partial-aggregated in batches, tiny
    groupby) lands a #distinct-values-sized table on the driver and
    the exact order statistics fall out of its cumulative sum — no
    sort of the corpus, no sampling sketch.  Quantile definition:
    smallest value whose cumulative count reaches ``ceil(p * N)``
    (mirrored exactly in SQL)."""
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"n_tokens": pd.Series([], dtype="int64"),
                                 "n_docs": pd.Series([], dtype="int64")})
        n = batch["text"].str.count(_TOKEN_RUN).astype("int64")
        out = (
            pd.DataFrame({"n_tokens": n}).groupby("n_tokens", as_index=False)
            .size().rename(columns={"size": "n_docs"})
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    # value-bounded histogram partials: one narrow combine level + a
    # driver groupby instead of the ~0.8 s fixed small-result
    # groupby.aggregate exchange (the r5 reduce discipline)
    hist = (
        _docs(sf_dir).map_batches(partial, batch_format="pandas")
        .map_batches(_hist_combine("n_tokens"), batch_format="pandas",
                     batch_size=65536)
        .to_pandas()
        .groupby("n_tokens", as_index=False).agg(n_docs=("n_docs", "sum"))
        .sort_values("n_tokens")
    )
    values = hist["n_tokens"].to_numpy()
    cum = np.cumsum(hist["n_docs"].to_numpy())
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for p in QUANTILES_X100:
        # ceil(p/100 * N) in integers; the (x + 99) // 100 form is used
        # verbatim in the SQL oracle (DuckDB // truncates toward zero,
        # so the negate-floor-negate ceil idiom does NOT port)
        rank = (p * total + 99) // 100
        idx = int(np.searchsorted(cum, rank, side="left"))
        rows.append({"p_x100": p,
                     "n_tokens": int(values[min(idx, len(values) - 1)])
                     if total else 0})
    df = pd.DataFrame(rows)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def _hist_combine(key: str):
    """Narrow combine level for value-bounded count-histogram
    partials (``(key, n_docs)`` rows): merges ~65k partial rows per
    task so the driver finalize sees a bounded table."""
    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).agg(n_docs=("n_docs", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        return g
    return combine


def length_histogram(sf_dir: str, bucket_tokens: int = 16):
    """Doc-count per 16-token length bucket (partial counts inside
    each batch, a narrow combine level, then a driver groupby over
    ≤ a few hundred buckets)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # keep the block schema stable on empty input
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n_docs": pd.Series([], dtype="int64")})
        n_tokens = batch["text"].str.count(_TOKEN_RUN)
        g = pd.DataFrame({"bucket": (n_tokens // bucket_tokens).astype("int64")})
        out = (
            g.groupby("bucket", as_index=False).size()
            .rename(columns={"size": "n_docs"})
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    df = (
        _docs(sf_dir).map_batches(partial, batch_format="pandas")
        .map_batches(_hist_combine("bucket"), batch_format="pandas",
                     batch_size=65536)
        .to_pandas()
        .groupby("bucket", as_index=False).agg(n_docs=("n_docs", "sum"))
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    for c in ("bucket", "n_docs"):
        df[c] = df[c].astype("int64")
    return df


PER_SOURCE_CAP = 15


def per_source_cap(sf_dir: str, cap: int = PER_SOURCE_CAP):
    """Per-source document cap (the CCNet-style per-domain limit: no
    single crawl domain may dominate the mixture).  Keeps, per source,
    the ``cap`` docs ranked first by ``(md5(text), doc_id)`` — a
    deterministic pseudo-random order, so the cap is an unbiased
    sample that is stable across reruns, parallelism and row order.

    Distributed plan: a per-batch partial top-``cap`` per source (each
    batch forwards at most ``cap`` rows per source it saw — every
    global winner is a batch winner), then one ``groupby(source)``
    merge over ≤ cap × n_blocks rows.  The corpus text never moves:
    only (source, rank-key, doc_id) triples shuffle.
    """
    import pyarrow as pa

    key_schema = pa.schema(
        [("source", pa.string()), ("rk", pa.string()), ("doc_id", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        rk = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]]
        g = (
            pd.DataFrame({"source": batch["source"].to_numpy(),
                          "rk": rk,
                          "doc_id": batch["doc_id"].to_numpy()})
            .sort_values(["source", "rk", "doc_id"])
            .groupby("source", as_index=False).head(cap)
        )
        return pa.table(
            {"source": g["source"].astype(str).to_numpy(),
             "rk": g["rk"].to_numpy(),
             "doc_id": g["doc_id"].to_numpy().astype("int64")},
            schema=key_schema,
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("rank", pa.int64())]
    )

    def merge(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["rk", "doc_id"]).head(cap)
        return pa.table(
            {"doc_id": g["doc_id"].to_numpy().astype("int64"),
             "source": g["source"].astype(str).to_numpy(),
             "rank": list(range(1, len(g) + 1))},
            schema=out_schema,
        )

    df = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
        .to_pandas().sort_values(["source", "rank"]).reset_index(drop=True)
    )
    for c in ("doc_id", "rank"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "source", "rank"]]


def top_docs_per_source(sf_dir: str, k: int = 3):
    """Per-group top-k (the SQL ``ROW_NUMBER() OVER (PARTITION BY
    source ORDER BY n_chars DESC, doc_id)`` window, rank ≤ k): the
    longest ``k`` documents of every source, with a deterministic
    doc-id tiebreak.

    Top-k per group is a semilattice: every global winner is a winner
    of its own batch, so each batch forwards at most k rows per source
    it saw, a narrow combine level re-takes the per-source head over
    ~65k partial rows per task, and the driver finalize ranks a table
    bounded by sources × k × (combine fan-in) — the corpus text never
    leaves the read tasks (the scan is pruned to three int/dict
    columns, no ``text`` at all)."""

    def head_k(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.sort_values(["source", "n_chars", "doc_id"],
                          ascending=[True, False, True])
            .groupby("source", as_index=False).head(k)
        )
        out = g[["source", "doc_id", "n_chars"]].reset_index(drop=True)
        for c in ("doc_id", "n_chars"):
            out[c] = out[c].astype("int64")
        return out

    df = (
        _docs(sf_dir, columns=("doc_id", "source", "n_chars"),
              rows_per_block=4096)
        .map_batches(head_k, batch_format="pandas")
        .map_batches(head_k, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
    df = head_k(df)
    df["rank"] = (df.groupby("source").cumcount() + 1).astype("int64")
    return (df[["source", "rank", "doc_id", "n_chars"]]
            .sort_values(["source", "rank"]).reset_index(drop=True))


def source_length_quantiles(sf_dir: str):
    """Exact per-source length quantiles (p50/p90/p99 of ``n_chars``)
    by the distributed counting-sort pattern of
    :func:`length_quantiles`, grouped: per-batch (source, n_chars)
    count partials → one narrow combine level → a driver table bounded
    by sources × distinct lengths, whose per-source cumulative sums
    yield the exact order statistics.  Quantile definition: smallest
    value whose per-source cumulative count reaches ``ceil(p * N_src)``
    (mirrored exactly in SQL).  The scan is pruned to two columns."""
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby(["source", "n_chars"], as_index=False)
            .size().rename(columns={"size": "n_docs"})
        )
        for c in ("n_chars", "n_docs"):
            g[c] = g[c].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "n_chars"], as_index=False).agg(
            n_docs=("n_docs", "sum"))
        for c in ("n_chars", "n_docs"):
            g[c] = g[c].astype("int64")
        return g

    hist = (
        _docs(sf_dir, columns=("source", "n_chars"), rows_per_block=4096)
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source", "n_chars"], as_index=False).agg(
            n_docs=("n_docs", "sum"))
        .sort_values(["source", "n_chars"]).reset_index(drop=True)
    )
    rows = []
    for source, g in hist.groupby("source", sort=True):
        values = g["n_chars"].to_numpy()
        cum = np.cumsum(g["n_docs"].to_numpy())
        total = int(cum[-1])
        for p in QUANTILES_X100:
            # ceil(p/100 * N) in integers — same idiom as
            # length_quantiles, stated verbatim in the SQL oracle
            rank = (p * total + 99) // 100
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append({"source": source, "p_x100": p,
                         "n_chars": int(values[min(idx, len(values) - 1)])})
    df = pd.DataFrame(rows)
    for c in ("p_x100", "n_chars"):
        df[c] = df[c].astype("int64")
    return df[["source", "p_x100", "n_chars"]]


def lm_cross_entropy(sf_dir: str, broadcast_limit: int = 2_000_000):
    """CCNet-style LM quality scoring: per-doc cross-entropy under the
    corpus's own MLE bigram model → (doc_id, cross_entropy, n_bigrams).

    For every adjacent `[a-z]+` word pair (a, b) in a document,
    nll = ln C(a) − ln C(a,b) with counts taken over the whole corpus
    (unigram denominator, so a doc's own bigrams always have count ≥ 1
    — no OOV/backoff path); the score is the mean nll rounded to 6
    decimals (absorbs summation-association and libm-ulp differences
    between numpy and the DuckDB oracle — the ann.py convention).
    Wikipedia-like text scores low, gibberish scores high; thresholding
    this score is the LM filter of CCNet (Wenzek et al. 2020).

    Distributed plan, two passes:

    1. counts — per-batch Counter partials over (a, b) pairs and
       unigrams (one combined table, bigram rows carry b, unigram rows
       b='' — impossible as a word), then one ``groupby(a, b).sum``;
       the result is model-sized (distinct bigrams), not corpus-sized.
    2. scoring — size-adaptive like :func:`~.relational.events_order_asof`:
       a model under ``broadcast_limit`` rows ships once via ``ray.put``
       and each batch scores vectorized against two dicts (no shuffle);
       a bigger model takes the join path: docs explode to
       (doc_id, a, b) rows, two distributed hash joins attach the
       counts, and a ``groupby(doc_id)`` sums — corpus-scale safe, at
       the cost of the exchange.
    """
    import math

    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z]+")
    count_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]
    )

    def count_partial(batch: pd.DataFrame) -> pa.Table:
        # C-level kernels: findall+explode once, unigram value_counts,
        # bigrams from a shift that respects doc boundaries (the index
        # of the exploded series is the source row)
        flat = batch["text"].str.findall(word_re).explode().dropna()
        if flat.empty:
            return count_schema.empty_table()
        uni = flat.value_counts()
        nxt = flat.shift(-1)
        same_doc = pd.Series(flat.index, index=flat.index).shift(-1) == flat.index
        pairs = pd.DataFrame({"a": flat[same_doc], "b": nxt[same_doc]})
        bigc = pairs.groupby(["a", "b"], sort=False).size()
        a_col = list(uni.index) + [p[0] for p in bigc.index]
        b_col = [""] * len(uni) + [p[1] for p in bigc.index]
        n_col = list(uni.to_numpy()) + list(bigc.to_numpy())
        return pa.table({"a": a_col, "b": b_col, "n": n_col}, schema=count_schema)

    def count_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["a", "b"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        return pa.table(
            {"a": g["a"].astype(str).to_numpy(),
             "b": g["b"].astype(str).to_numpy(),
             "n": g["n"].to_numpy().astype("int64")},
            schema=count_schema,
        )

    # one materialized read feeds the count pass and the scoring pass;
    # the (a, b) reduce goes through a narrow combine level (Zipfian
    # text means the hot keys — most of the mass — collapse ~batch-fold)
    # and finalizes on the driver when the combined row count, an
    # UPPER bound on distinct model rows, fits the broadcast budget;
    # only a genuinely model-scale vocabulary pays the groupby
    # all-to-all (in the join branch below, which needs the model as a
    # Dataset anyway)
    docs = _docs(sf_dir).materialize()
    partials = (
        docs
        # bundle the split-read's small blocks back into big batches:
        # this pass emits VOCAB-sized partials per batch, so more
        # batches = linearly more combine input
        .map_batches(count_partial, batch_format="pandas",
                     batch_size=2048)
        .map_batches(count_combine, batch_format="pandas",
                     batch_size=65536)
        .materialize()
    )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("cross_entropy", pa.float64()),
         ("n_bigrams", pa.int64())]
    )

    upper_rows = partials.count()
    if upper_rows == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cross_entropy": pd.Series([], dtype="float64"),
             "n_bigrams": pd.Series([], dtype="int64")}
        )
    if upper_rows <= broadcast_limit:
        import ray

        mdf = (partials.to_pandas()
               .groupby(["a", "b"], as_index=False).agg(n=("n", "sum")))
        uni_ln = {
            a: math.log(n) for a, b, n in
            zip(mdf["a"], mdf["b"], mdf["n"]) if b == ""
        }
        big_ln = {
            (a, b): math.log(n) for a, b, n in
            zip(mdf["a"], mdf["b"], mdf["n"]) if b != ""
        }
        model_ref = ray.put((uni_ln, big_ln))

        def score(batch: pd.DataFrame) -> pa.Table:
            # stateless task + per-worker-process model cache: the
            # dicts deserialize once per worker (re-ray.get per batch
            # measured ~2× the whole query; a fresh actor POOL per
            # query measured ~2 s of startup — the dsir finding)
            uni_ln, big_ln = _cached_broadcast(model_ref)
            ids, ces, nbs = [], [], []
            for doc_id, t in zip(batch["doc_id"], batch["text"]):
                ws = word_re.findall(t)
                if len(ws) < 2:
                    continue
                total = sum(
                    uni_ln[a] - big_ln[(a, b)] for a, b in zip(ws, ws[1:])
                )
                ids.append(int(doc_id))
                ces.append(round(total / (len(ws) - 1), 6))
                nbs.append(len(ws) - 1)
            return pa.table(
                {"doc_id": ids, "cross_entropy": ces, "n_bigrams": nbs},
                schema=out_schema,
            )

        df = (
            docs.map_batches(score, batch_format="pandas",
                             batch_size=2048)
            .to_pandas()
        )
        return df.sort_values("doc_id").reset_index(drop=True)

    model = (
        partials.groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    model_rows = model.count()

    # join path: model too big to broadcast
    explode_schema = pa.schema(
        [("doc_id", pa.int64()), ("a", pa.string()), ("b", pa.string())]
    )

    def explode(batch: pd.DataFrame) -> pa.Table:
        ids, a_col, b_col = [], [], []
        for doc_id, t in zip(batch["doc_id"], batch["text"]):
            ws = word_re.findall(t)
            for a, b in zip(ws, ws[1:]):
                ids.append(int(doc_id))
                a_col.append(a)
                b_col.append(b)
        return pa.table(
            {"doc_id": ids, "a": a_col, "b": b_col}, schema=explode_schema
        )

    def uni_rows(batch: pd.DataFrame) -> pa.Table:
        u = batch[batch["b"] == ""]
        return pa.table(
            {"a": u["a"].to_numpy(), "n_uni": u["n"].to_numpy().astype("int64")},
            schema=pa.schema([("a", pa.string()), ("n_uni", pa.int64())]),
        )

    def big_rows(batch: pd.DataFrame) -> pa.Table:
        g = batch[batch["b"] != ""]
        return pa.table(
            {"a": g["a"].to_numpy(), "b": g["b"].to_numpy(),
             "n_big": g["n"].to_numpy().astype("int64")},
            schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n_big", pa.int64())]),
        )

    uni = model.map_batches(uni_rows, batch_format="pandas")
    big = model.map_batches(big_rows, batch_format="pandas")
    pairs = docs.map_batches(explode, batch_format="pandas")
    # partition count sized to the MODEL side (the passage_dedup rule):
    # an empty hash partition on the small side of a join degrades to a
    # schema-less block that kills the join, so stay at 1 partition
    # until the model is comfortably larger than the partition count
    n_parts = max(1, min(8, model_rows // 64 + 1))
    # materialize between the two joins: each JoinOperator holds
    # per-partition aggregator actors, and two live at once can starve
    # each other out of CPU slots on a small cluster
    joined = pairs.join(
        big, join_type="inner", num_partitions=n_parts, on=("a", "b")
    ).materialize().join(uni, join_type="inner", num_partitions=n_parts, on=("a",))

    def nll(batch: pd.DataFrame) -> pa.Table:
        v = np.log(batch["n_uni"].to_numpy()) - np.log(batch["n_big"].to_numpy())
        return pa.table(
            {"doc_id": batch["doc_id"].to_numpy().astype("int64"),
             "nll": v, "one": np.ones(len(v), dtype="int64")},
            schema=pa.schema([("doc_id", pa.int64()), ("nll", pa.float64()),
                              ("one", pa.int64())]),
        )

    agg = (
        joined.map_batches(nll, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("nll", alias_name="total"), Sum("one", alias_name="n_bigrams"))
        .to_pandas()
    )
    agg["cross_entropy"] = (agg["total"] / agg["n_bigrams"]).round(6)
    agg = agg.sort_values("doc_id").reset_index(drop=True)
    agg["doc_id"] = agg["doc_id"].astype("int64")
    agg["n_bigrams"] = agg["n_bigrams"].astype("int64")
    return agg[["doc_id", "cross_entropy", "n_bigrams"]]


# -- PII redaction ---------------------------------------------------------

# Written in the regex subset valid in BOTH Python `re` and DuckDB's RE2
# (no capture groups — `findall`/`regexp_extract_all` must both return
# whole matches).  The ONE source for the engine pass and the SQL oracle
# (__ray_entry__ f-strings these constants into the oracle query).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b555-\d{4}\b"


def pii_scrub(sf_dir: str):
    """PII detection + redaction — the regex scrub every crawl-curation
    pipeline runs before training (emails / IPv4s / phone numbers →
    typed placeholders), with per-doc hit counts for auditing.

    The synthetic corpus carries no organic PII, so the pass runs over
    a deterministic augmentation (doc-id-derived email/ip/phone
    appended to each text) mirrored token-for-token in the SQL oracle —
    the same constructed-input discipline as the template roundtrips.

    Scrub order matters and is pinned: emails first (their domains
    contain dots an IPv4 pattern could nibble), then IPv4, then phone;
    each count is taken on the text as it stood BEFORE that rule's
    replacement.  One stateless vectorized ``map_batches`` pass
    (pandas ``.str`` kernels = compiled-regex C loop), no shuffle but
    the output sort; at 100 TB this is a pure streaming scan.
    """
    import numpy as np

    _TLDS = np.array(["com", "org", "net"])

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        idv = ids.to_numpy()
        t = batch["text"].astype(str)
        aug = (
            t + " contact " + t.str.split(" ").str[0] + "." + ids.astype(str)
            + "@example." + pd.Series(_TLDS[idv % 3], index=batch.index)
            + " ip 10." + (ids % 256).astype(str)
            + "." + (ids * 7 % 256).astype(str)
            + "." + (ids * 13 % 256).astype(str)
            + " tel 555-" + (ids % 10000).astype(str).str.zfill(4)
        )
        n_emails = aug.str.count(PII_EMAIL)
        t1 = aug.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
        n_ips = t1.str.count(PII_IPV4)
        t2 = t1.str.replace(PII_IPV4, "<IP>", regex=True)
        n_phones = t2.str.count(PII_PHONE)
        t3 = t2.str.replace(PII_PHONE, "<PHONE>", regex=True)
        return pd.DataFrame(
            {"doc_id": ids, "n_emails": n_emails.astype("int64"),
             "n_ips": n_ips.astype("int64"),
             "n_phones": n_phones.astype("int64"), "clean_text": t3}
        )

    return _docs(sf_dir).map_batches(scrub, batch_format="pandas").sort("doc_id")


# ---- DSIR importance weighting ------------------------------------------

DSIR_BUCKETS = 1024

# token → raw 32-bit md5 prefix, shared by every task that lands in
# the same worker PROCESS (persists across tasks like actor state,
# without the per-query actor-pool startup); independent of n_buckets
# because the modulo applies at lookup time
_BOW_MEMO: dict[str, int] = {}


def _hashed_bow_flat(texts: "pd.Series", word_re, n_buckets: int):
    """→ (row position in batch, bucket id) int64 arrays for every
    word occurrence in the batch — one findall+explode per batch (C
    kernels), md5 only per NEW distinct token."""
    if len(_BOW_MEMO) > 1 << 20:
        # the cache trades md5 calls for memory; on a high-cardinality
        # corpus (urls, ids) it would grow O(distinct tokens) for the
        # worker's lifetime — reset past 1M entries, hot tokens
        # repopulate immediately
        _BOW_MEMO.clear()
    flat = texts.reset_index(drop=True).str.findall(word_re).explode().dropna()
    if flat.empty:
        return (np.empty(0, dtype=np.int64),) * 2
    for w in pd.unique(flat.to_numpy()):
        if w not in _BOW_MEMO:
            _BOW_MEMO[w] = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
    buckets = flat.map(_BOW_MEMO).to_numpy(dtype=np.int64) % n_buckets
    return flat.index.to_numpy(dtype=np.int64), buckets


# broadcast-object cache shared by every task that lands in the same
# worker process: ray.get of a dict-shaped broadcast deserializes on
# every call (only numpy payloads are zero-copy), so cache by ObjectRef
_BCAST_CACHE: dict[str, object] = {}


def _cached_broadcast(ref):
    import ray

    key = ref.hex()
    val = _BCAST_CACHE.get(key)
    if val is None:
        if len(_BCAST_CACHE) > 4:
            _BCAST_CACHE.clear()
        val = _BCAST_CACHE[key] = ray.get(ref)
    return val
DSIR_TARGET_LANG = "en"


def dsir_importance(sf_dir: str, n_buckets: int = DSIR_BUCKETS,
                    target_lang: str = DSIR_TARGET_LANG, concurrency=None):
    # `concurrency` is accepted for caller compatibility; both passes
    # run as stateless tasks now (see docstring) and ignore it.
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) over hashed unigram features: per-doc
    log-importance weight ``log p_target(doc) - log p_raw(doc)`` under
    add-one-smoothed hashed bag-of-words models.

    Two streaming passes over ONE materialized narrow read (an
    iterative consumer re-reading parquet pays O(passes) scans — the
    r5 cluster.py discipline), no corpus collection.  Both passes are
    STATELESS tasks, not actor pools: the pool's only job here was the
    token→hash memo, which a module-level dict in each worker process
    provides for free, and spinning a fresh pool per pass cost ~2 s
    against the task path's 0.2 s (measured at sf0.1/32 CPUs — the
    same finding as the r4 kmeans per-round-pool fix).

    1. model build — per-batch partial (bucket, target_count,
       raw_count) rows (``n_buckets`` rows per batch at most) through
       a narrow ``map_batches`` combine level (~100× fan-in) to a
       bounded driver-side sum: integer partials make the reduce
       order-free, so the fixed ~0.8 s cost of a ``groupby`` all-to-all
       at 32 CPUs buys nothing (measured in the r5 Lloyd rewrite);
       the target distribution is the ``lang == target_lang`` subset,
       the raw distribution is the whole corpus;
    2. scoring — the 1024-float weight vector broadcasts via
       ``ray.put`` (zero-copy ``ray.get`` per task); each doc's score
       is its bucket-count vector dotted with the weights.

    Bucket spec (mirrored in SQL): ``int(md5(word)[:8], 16) %
    n_buckets`` over the unified ASCII token runs.  Scores are rounded
    to 6 dp after the sum (the lm_cross_entropy float-absorb
    convention).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    word_re = re.compile(_TOKEN_RUN)

    partial_schema = pa.schema(
        [("bucket", pa.int64()), ("t_cnt", pa.int64()), ("r_cnt", pa.int64())]
    )

    def model_partial(batch: pd.DataFrame) -> pa.Table:
        doc_idx, buckets = _hashed_bow_flat(batch["text"], word_re, n_buckets)
        raw = np.bincount(buckets, minlength=n_buckets)
        is_tgt = (batch["lang"].to_numpy() == target_lang)[doc_idx]
        tgt = np.bincount(buckets[is_tgt], minlength=n_buckets)
        nz = np.nonzero(raw)[0]
        return pa.table(
            {"bucket": nz, "t_cnt": tgt[nz], "r_cnt": raw[nz]},
            schema=partial_schema,
        )

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("bucket", as_index=False).agg(
            t_cnt=("t_cnt", "sum"), r_cnt=("r_cnt", "sum"))
        return pa.table(
            {"bucket": g["bucket"].to_numpy().astype(np.int64),
             "t_cnt": g["t_cnt"].to_numpy().astype(np.int64),
             "r_cnt": g["r_cnt"].to_numpy().astype(np.int64)},
            schema=partial_schema,
        )

    # one read feeds the model pass AND the scoring pass below
    docs = _docs(sf_dir, columns=("doc_id", "text", "lang")).materialize()
    reduced = (
        docs
        .map_batches(model_partial, batch_format="pandas", batch_size=256)
        .map_batches(combine, batch_format="pandas",
                     batch_size=64 * n_buckets)
        .to_pandas()
        .groupby("bucket", as_index=False)
        .agg(t=("t_cnt", "sum"), r=("r_cnt", "sum"))
    )
    t = np.zeros(n_buckets, dtype=np.float64)
    r = np.zeros(n_buckets, dtype=np.float64)
    t[reduced["bucket"].to_numpy()] = reduced["t"].to_numpy()
    r[reduced["bucket"].to_numpy()] = reduced["r"].to_numpy()
    big_t, big_r = t.sum(), r.sum()
    weights = np.log((t + 1.0) / (big_t + n_buckets)) - np.log(
        (r + 1.0) / (big_r + n_buckets)
    )
    wref = ray.put(weights)

    out_schema = pa.schema([("doc_id", pa.int64()), ("dsir_logw", pa.float64())])

    def score(batch: pd.DataFrame) -> pa.Table:
        weights = ray.get(wref)  # zero-copy from the object store
        doc_idx, buckets = _hashed_bow_flat(batch["text"], word_re, n_buckets)
        # per-doc bucket-count matrix keeps the dot-product
        # association identical to the original per-doc
        # ``counts @ weights`` (round(…, 6) then absorbs nothing
        # new); np.add.at is one C pass over the word stream
        counts = np.zeros((len(batch), n_buckets), dtype=np.int64)
        np.add.at(counts, (doc_idx, buckets), 1)
        has_words = np.zeros(len(batch), dtype=bool)
        has_words[doc_idx] = True  # zero-token docs: no evidence,
        # absent from the oracle's unnest-CTE rows
        scores = counts[has_words] @ weights
        ids = batch["doc_id"].to_numpy()[has_words].astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "dsir_logw": pa.array(
                 [round(float(s), 6) for s in scores],
                 type=pa.float64())},
            schema=out_schema,
        )

    df = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pandas", batch_size=256)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


# ---- deterministic train/val/test split ---------------------------------

SPLIT_MOD = 1000
SPLIT_TRAIN_LT = 900
SPLIT_VAL_LT = 950


def stratified_split(sf_dir: str):
    """Leak-safe train/val/test assignment: the split bucket is
    ``int(md5(text)[:8], 16) % 1000`` (train < 900 <= val < 950 <=
    test) — CONTENT-hashed, so byte-identical duplicate docs always
    land in the same split and can never leak across the boundary.
    Output is the per-(source, split) rollup: doc count + exact token
    count.  One stateless pass with per-batch partial aggregation; the
    groupby sees ≤ sources×3 rows per block."""
    import numpy as np
    import pyarrow as pa

    schema = pa.schema(
        [("source", pa.string()), ("split", pa.string()),
         ("n_docs", pa.int64()), ("n_tokens", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        n_tok = batch["text"].str.count(_TOKEN_RUN).astype("int64")
        buckets = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % SPLIT_MOD
             for t in batch["text"]),
            dtype=np.int64, count=len(batch),
        )
        split = np.where(
            buckets < SPLIT_TRAIN_LT, "train",
            np.where(buckets < SPLIT_VAL_LT, "val", "test"),
        )
        df = pd.DataFrame(
            {"source": batch["source"].to_numpy(), "split": split,
             "n_docs": 1, "n_tokens": n_tok.to_numpy()}
        ).groupby(["source", "split"], as_index=False).sum()
        return pa.table(
            {c: pa.array(df[c]) for c in ("source", "split", "n_docs", "n_tokens")},
            schema=schema,
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "split"], as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        for c in ("n_docs", "n_tokens"):
            g[c] = g[c].astype("int64")
        return g

    # (source × split)-sized partials: a narrow combine level + driver
    # groupby instead of the ~0.8 s fixed small-result exchange
    df = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source", "split"], as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        .sort_values(["source", "split"]).reset_index(drop=True)
    )
    for c in ("n_docs", "n_tokens"):
        df[c] = df[c].astype("int64")
    return df


# ---- Naive Bayes language classifier ------------------------------------

NBC_BUCKETS = 4096
NBC_SCALE = 1_000_000


def nb_lang_classify(sf_dir: str, n_buckets: int = NBC_BUCKETS,
                     concurrency=None):
    """Multinomial Naive Bayes language classifier, trained and applied
    as pure distributed aggregation (the fastText-style hashed
    bag-of-words baseline a curation pipeline runs when no pretrained
    langid model ships): add-one-smoothed per-language hashed-unigram
    counts → integer-quantized log weights → per-doc argmax.

    Scale plan: training is ONE streaming pass emitting per-batch
    partial (lang, bucket, cnt) rows — at most langs × ``n_buckets``
    rows per batch, a constant-size exchange like
    :func:`dsir_importance`; the reduced model (langs × n_buckets
    int64) broadcasts via ``ray.put`` and scoring is a second
    streaming pass (one ``np.bincount`` + one integer matvec per doc).
    No shuffle ever sees document text.

    Determinism: weights are ``floor(1e6 · ln((cnt+1)/(tot+B)))`` and
    priors ``floor(1e6 · ln(docs_L/docs))`` — ``math.log`` here and
    DuckDB ``ln`` both resolve to the platform libm (verified bitwise
    over 50k random ratios), and every downstream sum/argmax is
    int64, so the oracle reproduces predictions exactly, ties broken
    by ascending language.  Token-less docs carry no evidence and are
    skipped on both sides (the dsir convention).

    Output: ``doc_id, pred_lang, score_q, correct`` sorted by doc_id.
    """
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    word_re = re.compile(_TOKEN_RUN)

    partial_schema = pa.schema(
        [("lang", pa.string()), ("bucket", pa.int64()), ("cnt", pa.int64())]
    )

    def train_partial(batch: pd.DataFrame) -> pa.Table:
        # batch-vectorized per-lang hashed-BoW counts (shared
        # module-level token→hash memo, stateless task — see
        # dsir_importance's docstring for the measured pool-vs-task
        # rationale); the extra bucket=-1 rows carry the doc-count
        # prior partials so ONE pass feeds both tables (-1 cannot
        # collide with a real bucket; a string sentinel would risk
        # NUL/prefix mangling across the Arrow↔pandas boundary)
        doc_idx, buckets = _hashed_bow_flat(batch["text"], word_re, n_buckets)
        lang_arr = batch["lang"].to_numpy()
        langs_out, buckets_out, cnts_out = [], [], []
        occ_langs = lang_arr[doc_idx]
        for lang in pd.unique(lang_arr):
            vec = np.bincount(buckets[occ_langs == lang],
                              minlength=n_buckets)
            nz = np.nonzero(vec)[0]
            langs_out.extend([str(lang)] * len(nz))
            buckets_out.append(nz)
            cnts_out.append(vec[nz])
            # prior partial: docs of this lang in the batch (ALL docs,
            # token-less included — the prior is over documents)
            langs_out.append(str(lang))
            buckets_out.append(np.array([-1], dtype=np.int64))
            cnts_out.append(np.array(
                [int((lang_arr == lang).sum())], dtype=np.int64))
        return pa.table(
            {"lang": pa.array(langs_out, type=pa.string()),
             "bucket": pa.array(
                 np.concatenate(buckets_out) if buckets_out
                 else np.array([], dtype=np.int64)),
             "cnt": pa.array(
                 np.concatenate(cnts_out) if cnts_out
                 else np.array([], dtype=np.int64))},
            schema=partial_schema,
        )

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["lang", "bucket"], as_index=False).agg(
            cnt=("cnt", "sum"))
        return pa.table(
            {"lang": g["lang"].astype(str).to_numpy(),
             "bucket": g["bucket"].to_numpy().astype(np.int64),
             "cnt": g["cnt"].to_numpy().astype(np.int64)},
            schema=partial_schema,
        )

    # one materialized read feeds the train pass AND the scoring pass;
    # the (lang, bucket) reduce is a narrow combine level + bounded
    # driver sum instead of a groupby all-to-all (langs × n_buckets
    # rows per combined batch; integer partials are order-free)
    docs = _docs(sf_dir, columns=("doc_id", "text", "lang")).materialize()
    both = (
        docs.map_batches(train_partial, batch_format="pandas",
                         batch_size=2048)
        .map_batches(combine, batch_format="pandas",
                     batch_size=64 * n_buckets)
        .to_pandas()
        .groupby(["lang", "bucket"], as_index=False)
        .agg(cnt=("cnt", "sum"))
    )
    is_prior = both["bucket"].to_numpy() == -1
    model_df = both[~is_prior]
    prior_df = pd.DataFrame(
        {"lang": both.loc[is_prior, "lang"].to_numpy(),
         "n_docs": both.loc[is_prior, "cnt"].to_numpy()}
    )

    langs = sorted(prior_df["lang"])
    lidx = {l: i for i, l in enumerate(langs)}
    counts = np.zeros((len(langs), n_buckets), dtype=np.int64)
    for lang, b, c in zip(model_df["lang"], model_df["bucket"], model_df["cnt"]):
        counts[lidx[lang], int(b)] = int(c)
    totals = counts.sum(axis=1)
    n_total_docs = int(prior_df["n_docs"].sum())

    weights = np.empty((len(langs), n_buckets), dtype=np.int64)
    priors = np.empty(len(langs), dtype=np.int64)
    for li, lang in enumerate(langs):
        tot = float(totals[li] + n_buckets)
        weights[li] = [
            math.floor(NBC_SCALE * math.log((c + 1.0) / tot))
            for c in counts[li]
        ]
        n_docs_l = int(prior_df.loc[prior_df["lang"] == lang, "n_docs"].iloc[0])
        priors[li] = math.floor(
            NBC_SCALE * math.log(n_docs_l * 1.0 / n_total_docs)
        )
    model_ref = ray.put((langs, weights, priors))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("pred_lang", pa.string()),
         ("score_q", pa.int64()), ("correct", pa.int64())]
    )

    def score(batch: pd.DataFrame) -> pa.Table:
        langs_m, weights, priors = ray.get(model_ref)
        doc_idx, buckets = _hashed_bow_flat(batch["text"], word_re, n_buckets)
        counts = np.zeros((len(batch), n_buckets), dtype=np.int64)
        np.add.at(counts, (doc_idx, buckets), 1)
        has_words = np.zeros(len(batch), dtype=bool)
        has_words[doc_idx] = True  # token-less docs skipped (dsir rule)
        c = counts[has_words]
        # exact integer math, same values as the per-doc weights @ c
        s = c @ weights.T + priors
        li = np.argmax(s, axis=1)  # langs sorted asc -> first max
        lang_names = np.array(langs_m, dtype=object)
        true_lang = batch["lang"].to_numpy()[has_words]
        return pa.table(
            {"doc_id": pa.array(
                batch["doc_id"].to_numpy()[has_words].astype(np.int64)),
             "pred_lang": pa.array(lang_names[li], type=pa.string()),
             "score_q": pa.array(s[np.arange(len(li)), li].astype(np.int64)),
             "correct": pa.array(
                 (lang_names[li] == true_lang).astype(np.int64))},
            schema=out_schema,
        )

    df = (
        docs.map_batches(score, batch_format="pandas", batch_size=2048)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ("doc_id", "score_q", "correct"):
        df[c] = df[c].astype("int64")
    return df


# ---- UniMax-style temperature mixture ------------------------------------

TMIX_BUDGET_HALF = 2   # target corpus = total_docs // TMIX_BUDGET_HALF
TMIX_SCALE = 1_000_000


def temperature_mix(sf_dir: str):
    """UniMax-style temperature sampling of the source mixture
    (Chung et al. 2023 — flatten the source distribution so the crawl
    head stops dominating): per-source keep probability proportional
    to ``sqrt(n_s)/n_s`` under a ``total//2`` doc budget,

        ``rate_s = min(SCALE, budget·SCALE·w_s // (W·n_s))``,
        ``w_s = floor(sqrt(n_s))``,  ``W = Σ w_s``,

    all integer except IEEE-exact ``sqrt`` (correctly rounded by the
    754 spec, so Python and DuckDB agree bit-for-bit).  The keep gate
    is the shared deterministic content-hash idiom
    (``int(md5(text)[:8], 16) % SCALE < rate_s``) — stable across
    parallelism, reruns and row order.

    Plan: one tiny per-source count aggregate (per-batch partials), a
    constant-size rate dict in the task closure, one streaming filter
    pass.  Output: kept ``doc_id, source`` rows sorted by doc_id.
    """
    import math

    import pyarrow as pa

    # source-sized count partials: a narrow combine level + driver
    # merge instead of the fixed-cost small-result exchange
    counts = (
        _docs(sf_dir, columns=("doc_id", "source"))
        .map_batches(
            lambda b: b.groupby("source", as_index=False)
            .agg(n=("doc_id", "size")),
            batch_format="pandas")
        .map_batches(
            lambda b: b.groupby("source", as_index=False)
            .agg(n=("n", "sum")),
            batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("source", as_index=False).agg(n=("n", "sum"))
    )
    n_by_src = dict(zip(counts["source"], counts["n"].astype(int)))
    w_by_src = {s: math.floor(math.sqrt(float(n))) for s, n in n_by_src.items()}
    w_total = sum(w_by_src.values())
    budget = sum(n_by_src.values()) // TMIX_BUDGET_HALF
    rate = {
        s: min(TMIX_SCALE, (budget * TMIX_SCALE * w_by_src[s])
               // (w_total * n_by_src[s]))
        for s in n_by_src
    }

    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def pick(batch: pd.DataFrame) -> pa.Table:
        ids, srcs = [], []
        for doc_id, text, src in zip(batch["doc_id"], batch["text"],
                                     batch["source"]):
            h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
            if h % TMIX_SCALE < rate[src]:
                ids.append(int(doc_id))
                srcs.append(src)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "source": pa.array(srcs, type=pa.string())},
            schema=schema,
        )

    df = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(pick, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def source_lang_rollup(sf_dir: str):
    """Multi-level corpus dashboard: doc/token totals at (source,
    lang), per-source subtotal, and grand total — the GROUPING
    SETS/ROLLUP pattern.  One streaming pass pre-aggregates ALL
    THREE levels inside each batch (at most ``sources × langs + sources
    + 1`` partial rows per batch, constant in corpus size), then one
    tiny groupby sums the partials — never three scans, never a
    row-level shuffle.  The ALL bucket is spelled ``*`` (matches the
    SQL oracle's COALESCE over ROLLUP nulls).
    """
    import pyarrow as pa

    schema = pa.schema(
        [("source", pa.string()), ("lang", pa.string()),
         ("n_docs", pa.int64()), ("n_tokens", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        # the ALL bucket is spelled '*' on both engine and oracle side
        # (COALESCE), so a REAL source/lang named '*' would silently
        # merge with the rollup subtotals — fail loudly instead
        if (batch["source"] == "*").any() or (batch["lang"] == "*").any():
            raise ValueError(
                "source_lang_rollup: literal '*' occurs as a source/"
                "lang value and would collide with the ALL bucket")
        toks = batch["text"].str.count(_TOKEN_RUN)
        base = pd.DataFrame(
            {"source": batch["source"], "lang": batch["lang"],
             "n_docs": 1, "n_tokens": toks}
        )
        lvl2 = base.groupby(["source", "lang"], as_index=False).sum()
        lvl1 = lvl2.groupby("source", as_index=False)[
            ["n_docs", "n_tokens"]].sum()
        lvl1["lang"] = "*"
        lvl0 = pd.DataFrame(
            {"source": ["*"], "lang": ["*"],
             "n_docs": [lvl2["n_docs"].sum()],
             "n_tokens": [lvl2["n_tokens"].sum()]}
        )
        out = pd.concat(
            [lvl2, lvl1[["source", "lang", "n_docs", "n_tokens"]], lvl0],
            ignore_index=True,
        )
        return pa.table(
            {"source": pa.array(out["source"], type=pa.string()),
             "lang": pa.array(out["lang"], type=pa.string()),
             "n_docs": pa.array(out["n_docs"].astype("int64")),
             "n_tokens": pa.array(out["n_tokens"].astype("int64"))},
            schema=schema,
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        for c in ("n_docs", "n_tokens"):
            g[c] = g[c].astype("int64")
        return g

    # (source × lang + rollup)-sized partials: a narrow combine level
    # + driver merge instead of the fixed-cost small-result exchange
    df = (
        _docs(sf_dir, columns=("text", "source", "lang"))
        .map_batches(partial, batch_format="pandas", batch_size=2048)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source", "lang"], as_index=False)
        .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        .sort_values(["source", "lang"]).reset_index(drop=True)
    )
    for c in ("n_docs", "n_tokens"):
        df[c] = df[c].astype("int64")
    return df


# ---- Gopher-style quality rules -------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WORDLEN_X100 = 300
GOPHER_MAX_WORDLEN_X100 = 1000
GOPHER_MAX_BULLET_X1000 = 900
GOPHER_MAX_ELLIPSIS_X1000 = 300
GOPHER_MAX_SYMBOL_X1000 = 100


def gopher_quality_flags(sf_dir: str):
    """Gopher repetition/format quality rules (Rae et al. 2021 §A1.1),
    the document-level gate a crawl-curation pipeline applies before
    dedup: word-count window, mean-word-length window, bullet-line and
    ellipsis-line fractions, symbol-to-word ratio.  All features are
    integers (x100/x1000 fixed-point, floor semantics) so the SQL
    oracle mirrors bit-for-bit.

    One vectorized pass: lines explode per batch (pandas split+explode,
    C-level), per-doc fractions reduce in the same map — only the
    per-doc feature row ever leaves a task.  Output: one row per doc,
    ``gopher_keep`` = 1 iff every rule passes.
    """
    import numpy as np

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_words = text.str.count(_TOKEN_RUN).astype("int64")
        nonws = text.str.replace(_WS_ASCII, "", regex=True).str.len()
        mean_wl = (nonws * 100) // np.maximum(n_words, 1)

        lines = text.str.split("\n")
        n_lines = lines.str.len().astype("int64")
        ldf = pd.DataFrame(
            {"i": np.repeat(np.arange(len(batch)), n_lines.to_numpy()),
             "line": [ln for doc in lines for ln in doc]}
        )
        stripped = ldf["line"].str.strip(" \t\r\f\v")
        ldf["bullet"] = stripped.str.startswith(("-", "•", "*")).astype("int64")
        ldf["ellipsis"] = stripped.str.endswith(("...", "…")).astype("int64")
        g = ldf.groupby("i")[["bullet", "ellipsis"]].sum()
        bullet = np.zeros(len(batch), dtype=np.int64)
        ellipsis = np.zeros(len(batch), dtype=np.int64)
        bullet[g.index.to_numpy()] = g["bullet"].to_numpy()
        ellipsis[g.index.to_numpy()] = g["ellipsis"].to_numpy()

        n_symbols = (text.str.count("#") + text.str.count(r"\.\.\.")
                     ).astype("int64")
        denom_lines = np.maximum(n_lines.to_numpy(), 1)
        bullet_x1000 = bullet * 1000 // denom_lines
        ellipsis_x1000 = ellipsis * 1000 // denom_lines
        symbol_x1000 = n_symbols.to_numpy() * 1000 // np.maximum(
            n_words.to_numpy(), 1)

        keep = (
            (n_words.to_numpy() >= GOPHER_MIN_WORDS)
            & (n_words.to_numpy() <= GOPHER_MAX_WORDS)
            & (mean_wl.to_numpy() >= GOPHER_MIN_WORDLEN_X100)
            & (mean_wl.to_numpy() <= GOPHER_MAX_WORDLEN_X100)
            & (bullet_x1000 <= GOPHER_MAX_BULLET_X1000)
            & (ellipsis_x1000 <= GOPHER_MAX_ELLIPSIS_X1000)
            & (symbol_x1000 <= GOPHER_MAX_SYMBOL_X1000)
        ).astype("int64")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"],
             "n_words": n_words,
             "mean_wordlen_x100": mean_wl.astype("int64"),
             "bullet_lines_x1000": bullet_x1000,
             "ellipsis_lines_x1000": ellipsis_x1000,
             "symbol_ratio_x1000": symbol_x1000,
             "gopher_keep": keep}
        )

    df = (
        _docs(sf_dir, rows_per_block=2048)
        .map_batches(score, batch_format="pandas")
        .sort("doc_id").to_pandas()
    )
    for c in df.columns:
        if c != "doc_id":
            df[c] = df[c].astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


# ---- C4 terminal-punctuation line filter ----------------------------------

C4_TERMINALS = ('.', '!', '?', '"', "'")


def c4_line_filter(sf_dir: str):
    """C4's line-level cleaning rule (Raffel et al. 2020 §2.2): keep
    only lines ending in a terminal punctuation mark.  Per doc:
    total lines, kept lines, and the character count of the kept lines
    (post-trim) — the integers a downstream rebuild needs, mirrored
    exactly by the SQL oracle.

    Same explode-reduce shape as :func:`gopher_quality_flags`: lines
    never leave the task, one row per doc does."""
    import numpy as np

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch["text"].str.split("\n")
        n_lines = lines.str.len().astype("int64")
        ldf = pd.DataFrame(
            {"i": np.repeat(np.arange(len(batch)), n_lines.to_numpy()),
             "line": [ln for doc in lines for ln in doc]}
        )
        stripped = ldf["line"].str.strip(" \t\r\f\v")
        ldf["keep"] = stripped.str.endswith(C4_TERMINALS).astype("int64")
        ldf["kept_chars"] = stripped.str.len().astype("int64") * ldf["keep"]
        g = ldf.groupby("i")[["keep", "kept_chars"]].sum()
        kept = np.zeros(len(batch), dtype=np.int64)
        chars = np.zeros(len(batch), dtype=np.int64)
        kept[g.index.to_numpy()] = g["keep"].to_numpy()
        chars[g.index.to_numpy()] = g["kept_chars"].to_numpy()
        return pd.DataFrame(
            {"doc_id": batch["doc_id"],
             "n_lines": n_lines.to_numpy(),
             "n_kept_lines": kept,
             "kept_chars": chars}
        )

    df = (
        _docs(sf_dir, rows_per_block=2048)
        .map_batches(score, batch_format="pandas")
        .sort("doc_id").to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


# ---- Gopher repetition rules -----------------------------------------------

REP_MAX_DUP_LINE_X1000 = 300
REP_MAX_DUP_LINE_CHAR_X1000 = 200
REP_MAX_TOP2GRAM_X1000 = 200
REP_MAX_TOP3GRAM_X1000 = 180


def gopher_repetition_flags(sf_dir: str):
    """Gopher repetition rules (Rae et al. 2021 §A1.1 table A1): the
    duplicate-line fraction, duplicate-line CHARACTER fraction, and the
    character fraction covered by the most frequent word 2-gram /
    3-gram.  Integer x1000 fixed-point (floors) so the DuckDB oracle
    mirrors bit-for-bit; the "most frequent n-gram" tie-break is
    max(count) then max(count·len) — deterministic on both sides.

    Lines use the pandas explode path (C-level); the n-gram counters
    are a per-doc Python pass over the whitespace tokens (the same
    _TOKEN_RUN convention as every other op), so the read stays at the
    small per-doc block size.  Only the per-doc feature row leaves the
    task; one row per doc comes back.
    """
    import numpy as np

    tok_re = re.compile(_TOKEN_RUN)

    def top_ngram_chars(words: list[str], n: int) -> int:
        if len(words) < n:
            return 0
        counts: dict[str, int] = {}
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            counts[g] = counts.get(g, 0) + 1
        best_cnt = max(counts.values())
        return max(cnt * len(g) for g, cnt in counts.items()
                   if cnt == best_cnt)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        text_len = text.str.len().astype("int64").to_numpy()

        lines = text.str.split("\n")
        n_lines = lines.str.len().astype("int64").to_numpy()
        ldf = pd.DataFrame(
            {"i": np.repeat(np.arange(len(batch)), n_lines),
             "line": [ln for doc in lines for ln in doc]}
        )
        ldf["chars"] = ldf["line"].str.len().astype("int64")
        g = ldf.groupby(["i", "line"], sort=False).agg(
            cnt=("chars", "size"), chars=("chars", "first"))
        g = g.reset_index()
        per_doc = g.assign(
            dup=g["cnt"] - 1,
            dupc=(g["cnt"] - 1) * g["chars"],
            totc=g["cnt"] * g["chars"],
        ).groupby("i").agg(
            dup_lines=("dup", "sum"), dup_chars=("dupc", "sum"),
            tot_chars=("totc", "sum"))
        dup_lines = np.zeros(len(batch), dtype=np.int64)
        dup_chars = np.zeros(len(batch), dtype=np.int64)
        tot_chars = np.ones(len(batch), dtype=np.int64)
        idx = per_doc.index.to_numpy()
        dup_lines[idx] = per_doc["dup_lines"].to_numpy()
        dup_chars[idx] = per_doc["dup_chars"].to_numpy()
        tot_chars[idx] = np.maximum(per_doc["tot_chars"].to_numpy(), 1)

        top2 = np.zeros(len(batch), dtype=np.int64)
        top3 = np.zeros(len(batch), dtype=np.int64)
        for k, t in enumerate(text):
            words = tok_re.findall(t)
            top2[k] = top_ngram_chars(words, 2)
            top3[k] = top_ngram_chars(words, 3)

        denom_lines = np.maximum(n_lines, 1)
        denom_text = np.maximum(text_len, 1)
        dup_line_x1000 = dup_lines * 1000 // denom_lines
        dup_char_x1000 = dup_chars * 1000 // tot_chars
        top2_x1000 = top2 * 1000 // denom_text
        top3_x1000 = top3 * 1000 // denom_text
        keep = (
            (dup_line_x1000 <= REP_MAX_DUP_LINE_X1000)
            & (dup_char_x1000 <= REP_MAX_DUP_LINE_CHAR_X1000)
            & (top2_x1000 <= REP_MAX_TOP2GRAM_X1000)
            & (top3_x1000 <= REP_MAX_TOP3GRAM_X1000)
        ).astype("int64")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"],
             "dup_line_x1000": dup_line_x1000,
             "dup_line_char_x1000": dup_char_x1000,
             "top2gram_char_x1000": top2_x1000,
             "top3gram_char_x1000": top3_x1000,
             "repetition_keep": keep}
        )

    df = (
        _docs(sf_dir)
        .map_batches(score, batch_format="pandas")
        .sort("doc_id").to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def char_entropy(sf_dir: str):
    """Per-document character-level Shannon entropy — the
    compressibility proxy quality filters threshold (low entropy flags
    repeated-character runs and template boilerplate; cf. the
    reference's garbage heuristics, deepdoc/vision/ocr.py text-score
    family, applied corpus-wide).  Over Unicode codepoints of the full
    text: ``entropy = ln(N) − Σ n_i·ln(n_i) / N`` (nats), rounded to 6
    decimals (absorbs summation-association/libm ulp vs the DuckDB
    oracle).  Empty documents are excluded — both sides.

    Distributed plan: one stateless per-batch pass, no exchange at any
    point — per-doc ``np.unique`` over a codepoint view of the text
    (C-level; the Python loop is per DOC at 256-row blocks, the
    documented per-doc-Python convention).  Output is doc-level
    (doc_id, n_chars, n_distinct, entropy); at corpus scale this is a
    ``write_parquet`` sink, not a driver collect."""
    import numpy as np
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                        ("n_distinct", pa.int64()),
                        ("entropy", pa.float64())])

    def per_doc(b: pd.DataFrame) -> pa.Table:
        doc_ids, n_chars, n_distinct, ents = [], [], [], []
        for did, text in zip(b["doc_id"].to_numpy(), b["text"].to_numpy()):
            s = str(text)
            if not s:
                continue
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            _, counts = np.unique(cps, return_counts=True)
            n = counts.sum()
            cf = counts.astype(np.float64)
            ent = np.log(float(n)) - float((cf * np.log(cf)).sum()) / n
            doc_ids.append(int(did))
            n_chars.append(int(n))
            n_distinct.append(len(counts))
            ents.append(round(ent, 6))
        return pa.table({"doc_id": np.asarray(doc_ids, dtype=np.int64),
                         "n_chars": np.asarray(n_chars, dtype=np.int64),
                         "n_distinct": np.asarray(n_distinct,
                                                  dtype=np.int64),
                         "entropy": np.asarray(ents, dtype=np.float64)},
                        schema=schema)

    df = (_docs(sf_dir)
          .map_batches(per_doc, batch_format="pandas")
          .to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "n_chars", "n_distinct"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_chars", "n_distinct", "entropy"]]
