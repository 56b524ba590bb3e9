"""Text-analysis operators over the ``documents`` table.

Corpus-scale building blocks for a training-data pipeline: token
counting, quality scoring, language identification, and document
fingerprinting.  Every operator is a vectorized ``map_batches``
transform (pandas str kernels / hashlib over arrays); the per-doc
results are deterministic and replicated 1:1 by the DuckDB oracle SQL
in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

_WS = re.compile(r"\s+")
# token = maximal run of non-ASCII-whitespace chars.  The explicit
# class (not \S) pins BOTH sides to identical semantics: Python \s is
# unicode-aware while DuckDB/RE2 \s is ASCII-only, so trim+split-\s+
# silently diverges on docs with leading/trailing or unicode
# whitespace.  regexp counts also make empty text 0 tokens (not 1).
_TOKEN_RUN = r"[^ \t\n\r\f\v]+"
_WS_ASCII = re.compile(r"[ \t\n\r\f\v]+")
_CJK = re.compile(r"[一-鿿]")
_PUNCT = re.compile(r"[.,!?;:]")
_STOPWORDS = ("the", "a", "of", "to", "and")


def _docs(sf_dir: str, rows_per_block: int = 256):
    from ..sources.readers import read_docs_split

    # split-on-read: the shared one-row-group parquet would otherwise
    # run every Python-heavy per-doc pass as a single task.  Block size
    # is a PER-OP choice (r3 verdict): 256 for per-doc Python loops,
    # >=2048 for C-level vectorized partials where the split tax would
    # exceed the kernel work.
    return read_docs_split(sf_dir, columns=["doc_id", "text", "lang"],
                           rows_per_block=rows_per_block)


def token_stats(sf_dir: str):
    """Per-language doc/token/char totals (partial-aggregated inside
    batches before the small groupby)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.count(_TOKEN_RUN)
        chars = batch["text"].str.len()
        g = pd.DataFrame({"lang": batch["lang"], "toks": toks, "chars": chars})
        agg = g.groupby("lang", as_index=False).agg(
            n_docs=("toks", "size"), n_tokens=("toks", "sum"), n_chars=("chars", "sum")
        )
        return agg

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"))
        for c in ("n_docs", "n_tokens", "n_chars"):
            g[c] = g[c].astype("int64")
        return g

    # lang-sized partials: a narrow combine level + driver groupby
    # instead of the ~0.8 s fixed small-result exchange
    df = (
        _docs(sf_dir, rows_per_block=4096)
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"))
        .sort_values("lang").reset_index(drop=True)
    )
    for c in ("n_docs", "n_tokens", "n_chars"):
        df[c] = df[c].astype("int64")
    return df


def quality_scores(sf_dir: str):
    """Per-doc quality features: whitespace tokens, punctuation count,
    stopword count, mean word length (×100, integer)."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        text = batch["text"]
        n_tokens = text.str.count(_TOKEN_RUN)
        n_punct = text.str.count(_PUNCT)
        stop_pat = r"\b(?:%s)\b" % "|".join(_STOPWORDS)
        n_stop = text.str.count(stop_pat)
        nonws = text.str.replace(_WS_ASCII, "", regex=True).str.len()
        mean_wordlen_x100 = (nonws * 100) // np.maximum(n_tokens, 1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens.astype("int64"),
                "n_punct": n_punct.astype("int64"),
                "n_stopwords": n_stop.astype("int64"),
                "mean_wordlen_x100": mean_wordlen_x100.astype("int64"),
            }
        )

    return _docs(sf_dir, rows_per_block=2048).map_batches(
        score, batch_format="pandas").sort("doc_id")


def lang_id(sf_dir: str):
    """Deterministic script-based language bucket per doc (CJK-ratio
    heuristic à la rag/nlp/__init__.py:248-257); aggregated counts."""

    def ident(batch: pd.DataFrame) -> pd.DataFrame:
        cjk = batch["text"].str.count(_CJK)
        total = batch["text"].str.len()
        pred = (cjk * 5 > total).map({True: "zh", False: "latin"})
        g = pd.DataFrame({"pred_lang": pred})
        return g.groupby("pred_lang", as_index=False).size().rename(columns={"size": "n_docs"})

    # two-row result: a narrow combine level + driver groupby instead
    # of the ~0.8 s fixed small-result exchange
    df = (
        _docs(sf_dir, rows_per_block=4096)
        .map_batches(ident, batch_format="pandas")
        .map_batches(
            lambda b: b.groupby("pred_lang", as_index=False)
            .agg(n_docs=("n_docs", "sum")),
            batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("pred_lang", as_index=False).agg(n_docs=("n_docs", "sum"))
        .sort_values("pred_lang").reset_index(drop=True)
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def fingerprints(sf_dir: str):
    """Per-doc content fingerprint: md5 of whitespace-normalized,
    lower-cased text (the exact-dedup key)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        norm = batch["text"].str.lower().str.replace(_WS, " ", regex=True).str.strip()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": [hashlib.md5(t.encode()).hexdigest() for t in norm],
            }
        )

    return _docs(sf_dir, rows_per_block=2048).map_batches(
        fp, batch_format="pandas").sort("doc_id")


BM25_QUERY_TERMS = ("table", "join", "vector")
BM25_LEN_NORM = 50  # additive length normalization (integer stand-in for b/k1)


def _bm25_idf(docs) -> dict[str, int]:
    """Per-term integer idf over one streaming document-frequency pass
    (shared by :func:`bm25_lite_topk` and :func:`hybrid_topk`):
    ``idf_q(t) = (N - df + 1) * 1_000_000 // (df + 1)``."""
    import pyarrow as pa

    df_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                           ("n_docs", pa.int64())])

    def partial_df(batch: pd.DataFrame):
        rows = {"term": [], "df": [], "n_docs": []}
        for term in BM25_QUERY_TERMS:
            rows["term"].append(term)
            # \b-bounded count == whitespace-token membership for this
            # alphanumeric vocabulary, and stays vectorized
            rows["df"].append(
                int(batch["text"].str.contains(rf"\b{term}\b", regex=True).sum())
            )
            rows["n_docs"].append(len(batch))
        return pa.table(rows, schema=df_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("term", as_index=False).agg(
            df=("df", "sum"), n_docs=("n_docs", "sum"))
        return pa.table(
            {"term": g["term"].astype(str).to_numpy(),
             "df": g["df"].to_numpy().astype("int64"),
             "n_docs": g["n_docs"].to_numpy().astype("int64")},
            schema=df_schema,
        )

    # query-term-sized integer partials: one narrow combine level +
    # driver sum instead of a groupby all-to-all (~0.8 s fixed at 32
    # CPUs for a 3-row result — the r5 reduce discipline)
    df_tbl = (
        docs.map_batches(partial_df, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("term", as_index=False)
        .agg(df=("df", "sum"), n_docs=("n_docs", "sum"))
    )
    n_total = int(df_tbl["n_docs"].iloc[0])  # per-term sum == N
    return {
        row["term"]: (n_total - int(row["df"]) + 1) * 1_000_000 // (int(row["df"]) + 1)
        for _, row in df_tbl.iterrows()
    }


def bm25_lite_topk(sf_dir: str, k: int = 20):
    """Integer-quantized BM25-shaped relevance scoring — the engine's
    distributed retrieval-scoring pattern (the reference's ES/Infinity
    retrieval itself is scoped out, SURVEY.md §2.7).

    Two passes, both streaming:

    1. per-term document frequency via a single vectorized scan +
       tiny aggregate (one row per query term);
    2. df values broadcast (they are query-term-sized, not
       corpus-sized) into a scoring scan:

       ``score = Σ_t  tf(t,d) * idf_q(t) // (len_d + LEN_NORM)``
       with ``idf_q(t) = (N - df + 1) * 1_000_000 // (df + 1)``

    All-integer arithmetic → the DuckDB oracle reproduces scores
    bit-exactly; ties break by ascending doc_id.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.readers import read_docs_split

    # the testdata documents table is one row group — without the
    # streaming split the regex scoring scan runs as a single task.
    # Materialized once: the narrow read has two consumers (the idf
    # pass and the scoring scan)
    docs = read_docs_split(
        sf_dir, columns=["doc_id", "text"], rows_per_block=512
    ).materialize()
    idf_ref = ray.put(_bm25_idf(docs))

    score_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64())])

    def score_topk(batch: pd.DataFrame):
        """Score the batch and emit only its local top-k — every global
        top-k row is in its own batch's top-k, so the driver-side merge
        sees ≤ k × n_blocks rows instead of the corpus (no
        all-to-all Sort; the ann.py partial-top-k pattern)."""
        weights = ray.get(idf_ref)
        lengths = batch["text"].str.count(" ").to_numpy() + 1
        total = np.zeros(len(batch), dtype=np.int64)
        for term, w in weights.items():
            tf = batch["text"].str.count(rf"\b{term}\b").to_numpy()
            total += tf * w
        scores = total // (lengths + BM25_LEN_NORM)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        # (score desc, doc_id asc) — lexsort keys are least-significant
        # first
        order = np.lexsort((ids, -scores))[:k]
        return pa.table(
            {"doc_id": ids[order], "score": scores[order]},
            schema=score_schema,
        )

    out = (
        docs.map_batches(score_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = range(1, len(out) + 1)
    for c in ("doc_id", "score", "rank"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "score", "rank"]]


def vocab_topk(sf_dir: str, k: int = 20):
    """Vocabulary construction: the ``k`` most frequent words per
    language (the corpus scan a BPE/unigram tokenizer trainer runs
    first).

    Word = ``split(' ')`` segment (the convention shared with the
    repetition/packing ops and their SQL mirrors; empty text
    contributes one empty-string word).  Distributed plan: per-batch
    partial (lang, word) counts — the long unique tail collapses
    inside each batch before anything moves — then one
    ``groupby(lang, word)`` sum, then a per-language ``map_groups``
    that keeps only the top ``k``.  The per-language groups are
    vocabulary-sized, not corpus-sized, so the final step never sees
    document data.  Ties break on the word (ascending) so the result
    is deterministic; mirrored by the oracle's
    ``row_number() OVER (ORDER BY n DESC, word)``.
    """
    import pyarrow as pa

    from ray.data.aggregate import Sum

    partial_schema = pa.schema(
        [("lang", pa.string()), ("word", pa.string()), ("n", pa.int64())]
    )

    # split+explode builds the per-batch expansion; reindex aligns the
    # repeated lang values with the exploded index.  Output is a
    # schema-pinned Arrow table — unpinned pandas blocks degrade to
    # schema-less empties that defeat Ray's block-schema dedup
    def partial(batch: pd.DataFrame) -> pa.Table:
        words = batch["text"].str.split(" ").explode()
        langs = batch["lang"].reindex(words.index)
        g = (
            pd.DataFrame({"lang": langs.to_numpy(), "word": words.to_numpy()})
            .groupby(["lang", "word"], as_index=False).size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {"lang": g["lang"].astype(str).to_numpy(),
             "word": g["word"].astype(str).to_numpy(),
             "n": g["n"].to_numpy().astype("int64")},
            schema=partial_schema,
        )

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["lang", "word"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        return pa.table(
            {"lang": g["lang"].astype(str).to_numpy(),
             "word": g["word"].astype(str).to_numpy(),
             "n": g["n"].to_numpy().astype("int64")},
            schema=partial_schema,
        )

    # post-aggregate every (lang, word) row is unique, so a per-batch
    # partial top-k is exact after a tiny driver merge (the ann.py
    # pattern) — no groupby(lang) second shuffle, and no
    # one-group-per-language map_groups skew hazard at corpus scale
    def partial_topk(batch: pd.DataFrame) -> pa.Table:
        g = (
            batch.sort_values(["n", "word"], ascending=[False, True])
            .groupby("lang", as_index=False).head(k)
        )
        return pa.table(
            {"lang": g["lang"].astype(str).to_numpy(),
             "word": g["word"].astype(str).to_numpy(),
             "n": g["n"].to_numpy().astype("int64")},
            schema=partial_schema,
        )

    # Zipfian hot words collapse ~batch-fold in a narrow combine level;
    # when the combined row count (an upper bound on distinct (lang,
    # word) pairs) fits, the exact sum + top-k finalize on the driver —
    # a genuinely huge vocabulary keeps the exact groupby all-to-all
    # (partial top-k BEFORE full per-key sums would not be exact)
    partials = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )
    if partials.count() <= 2_000_000:
        df = (partials.to_pandas()
              .groupby(["lang", "word"], as_index=False).agg(n=("n", "sum")))
    else:
        df = (
            partials
            .groupby(["lang", "word"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(partial_topk, batch_format="pandas")
            .to_pandas()  # ≤ k × n_langs × n_blocks rows
        )
    if df.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype="object"),
             "word": pd.Series([], dtype="object"),
             "n": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    df = (
        df.sort_values(["n", "word"], ascending=[False, True])
        .groupby("lang", as_index=False).head(k)
    )
    df["rank"] = df.groupby("lang").cumcount() + 1
    df = df.sort_values(["lang", "rank"]).reset_index(drop=True)
    for c in ("n", "rank"):
        df[c] = df[c].astype("int64")
    return df[["lang", "word", "n", "rank"]]


def pmi_collocations(sf_dir: str, min_count: int = 5, k: int = 50,
                     driver_limit: int = 2_000_000):
    """Collocation (phrase) mining: the top-``k`` adjacent word pairs
    by pointwise mutual information — the statistic behind phrase
    detectors (word2vec-style phrase joining, tokenizer multi-word
    vocab candidates).  Words are ``[a-z]+`` runs (the convention
    shared with lm_cross_entropy); for bigram ``(a, b)`` with count
    ``n_ab``, left/right positional marginals ``n_a·, n_·b`` and total
    bigram count ``N``:

        pmi = ln(n_ab · N / (n_a· · n_·b)),  rounded to 6 decimals

    (the established float-log idiom: both sides compute the ratio in
    the same operation order on exactly-representable integers, and
    the round absorbs ulp-level ln differences).  Pairs below
    ``min_count`` are noise-filtered before ranking; ties break on
    (w1, w2) ascending.

    Distributed plan: per-batch bigram-count partials (pairs built
    with a C-level grouped shift, no per-doc Python) → one narrow
    combine level → under the ``driver_limit`` count gate the
    distinct-bigram table lands on the driver whole; past it, an
    exact distributed groupby rebuilds the counts, the (vocab-sized)
    marginals reduce through their own partial-combine level, and the
    ``min_count`` filter + broadcast-marginal PMI scoring + per-batch
    head-k keep every later stage frequent-bigram-sized."""
    import numpy as np
    import pyarrow as pa

    from .curation import _docs

    pair_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("n_ab", pa.int64())]
    )
    _word_re = re.compile(r"[a-z]+")

    def partial(batch: pd.DataFrame) -> pa.Table:
        words = batch["text"].str.findall(_word_re).explode().dropna()
        if not len(words):
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "n_ab": pa.array([], pa.int64())}, schema=pair_schema)
        w2 = words.groupby(level=0).shift(-1)
        d = pd.DataFrame({"w1": words, "w2": w2}).dropna()
        g = d.groupby(["w1", "w2"], as_index=False).size().rename(
            columns={"size": "n_ab"})
        return pa.table(
            {"w1": g["w1"].astype(str).to_numpy(),
             "w2": g["w2"].astype(str).to_numpy(),
             "n_ab": g["n_ab"].to_numpy().astype("int64")},
            schema=pair_schema,
        )

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["w1", "w2"], as_index=False, sort=False).agg(
            n_ab=("n_ab", "sum"))
        return pa.table(
            {"w1": g["w1"].astype(str).to_numpy(),
             "w2": g["w2"].astype(str).to_numpy(),
             "n_ab": g["n_ab"].to_numpy().astype("int64")},
            schema=pair_schema,
        )

    def _pmi_rank(counts: pd.DataFrame) -> pd.DataFrame:
        # marginals over the FULL bigram table (pre-min_count filter)
        total = int(counts["n_ab"].sum())
        left = counts.groupby("w1")["n_ab"].sum()
        right = counts.groupby("w2")["n_ab"].sum()
        c = counts[counts["n_ab"] >= min_count].copy()
        n = c["n_ab"].to_numpy().astype(np.float64)
        nl = left.reindex(c["w1"]).to_numpy().astype(np.float64)
        nr = right.reindex(c["w2"]).to_numpy().astype(np.float64)
        # operation order pinned to the SQL: (n_ab * N) / (n_l * n_r)
        c["pmi"] = pd.Series(
            np.log((n * total) / (nl * nr)), index=c.index).round(6)
        c = (c.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True]).head(k)
             .reset_index(drop=True))
        c["rank"] = pd.Series(range(1, len(c) + 1), dtype="int64")
        c["n_ab"] = c["n_ab"].astype("int64")
        return c[["rank", "w1", "w2", "n_ab", "pmi"]]

    partials = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )
    if partials.count() <= driver_limit:
        counts = (partials.to_pandas()
                  .groupby(["w1", "w2"], as_index=False)
                  .agg(n_ab=("n_ab", "sum")))
        return _pmi_rank(counts)

    # scale path: exact distributed recount, then marginal reduces —
    # each marginal is vocab-sized and collapses through the same
    # narrow combine level before the (frequent-bigram-sized) scoring
    from ray.data.aggregate import Sum

    exact = (partials.groupby(["w1", "w2"])
             .aggregate(Sum("n_ab", alias_name="n_ab")).materialize())

    def _marginal(col: str):
        def m(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, as_index=False).agg(n=("n_ab", "sum"))
            g["n"] = g["n"].astype("int64")
            return g
        return m

    import ray

    marg = {}
    for col in ("w1", "w2"):
        marg[col] = (
            exact.map_batches(_marginal(col), batch_format="pandas")
            .map_batches(lambda b, c=col: b.groupby(c, as_index=False)
                         .agg(n=("n", "sum")),
                         batch_format="pandas", batch_size=65536)
            .to_pandas().groupby(col)["n"].sum()
        )
    total = int(marg["w1"].sum())
    lref = ray.put(marg["w1"])
    rref = ray.put(marg["w2"])

    def score_head(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_ab"] >= min_count].copy()
        if not len(b):
            return pd.DataFrame({"w1": pd.Series([], dtype="object"),
                                 "w2": pd.Series([], dtype="object"),
                                 "n_ab": pd.Series([], dtype="int64"),
                                 "pmi": pd.Series([], dtype="float64")})
        left, right = ray.get(lref), ray.get(rref)
        n = b["n_ab"].to_numpy().astype(np.float64)
        nl = left.reindex(b["w1"]).to_numpy().astype(np.float64)
        nr = right.reindex(b["w2"]).to_numpy().astype(np.float64)
        b["pmi"] = pd.Series(
            np.log((n * total) / (nl * nr)), index=b.index).round(6)
        return (b.sort_values(["pmi", "w1", "w2"],
                              ascending=[False, True, True]).head(k)
                [["w1", "w2", "n_ab", "pmi"]])

    c = (exact.map_batches(score_head, batch_format="pandas")
         .to_pandas()
         .sort_values(["pmi", "w1", "w2"],
                      ascending=[False, True, True]).head(k)
         .reset_index(drop=True))
    c["rank"] = pd.Series(range(1, len(c) + 1), dtype="int64")
    c["n_ab"] = c["n_ab"].astype("int64")
    return c[["rank", "w1", "w2", "n_ab", "pmi"]]


def bpe_pair_counts(sf_dir: str):
    """Adjacent-symbol pair frequencies over `[a-z]+` word runs — the
    counting step a byte-pair-encoding tokenizer trainer repeats per
    merge (Sennrich et al. 2016, §3).

    Distributed plan: each batch concatenates its word runs with
    space separators into ONE byte buffer and counts pairs with a
    single ``np.bincount`` over ``256*b[:-1] + b[1:]`` (pairs that
    straddle a separator contain a non-letter byte and fall out of
    the [a-z]×[a-z] id range — no per-row or per-word Python).  The
    pair alphabet is bounded (26² = 676), so the per-batch partial is
    tiny and the final ``groupby(pair).sum`` is a constant-size
    exchange regardless of corpus size.
    """
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from ..sources.readers import read_parquet_clean

    word_re = re.compile(r"[a-z]+")
    lo, hi = ord("a"), ord("z")
    partial_schema = pa.schema([("pair", pa.string()), ("n", pa.int64())])
    pair_ids = np.arange(256 * 256, dtype=np.int64)
    id_ok = (
        (pair_ids // 256 >= lo) & (pair_ids // 256 <= hi)
        & (pair_ids % 256 >= lo) & (pair_ids % 256 <= hi)
    )
    id_str = np.array(
        [chr(i // 256) + chr(i % 256) if ok else "" for i, ok in
         zip(pair_ids, id_ok)],
        dtype=object,
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        # one C-level findall over the whole batch: the row join uses a
        # space, which cannot create or fuse [a-z]+ runs across rows
        buf = " ".join(word_re.findall(" ".join(batch["text"]))).encode("ascii")
        if len(buf) < 2:
            return pa.table({"pair": [], "n": []}, schema=partial_schema)
        b = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        ids = 256 * b[:-1] + b[1:]
        counts = np.bincount(ids, minlength=256 * 256)
        keep = (counts > 0) & id_ok
        return pa.table(
            {"pair": id_str[keep], "n": counts[keep]},
            schema=partial_schema,
        )

    # ≤ 676 rows by construction: a narrow combine level + driver
    # groupby instead of the ~0.8 s fixed small-result exchange
    df = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(
            lambda b: b.groupby("pair", as_index=False).agg(n=("n", "sum")),
            batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("pair", as_index=False).agg(n=("n", "sum"))
    )
    df = df.sort_values(["n", "pair"], ascending=[False, True]).reset_index(drop=True)
    df["n"] = df["n"].astype("int64")
    return df[["pair", "n"]]


def bpe_train(sf_dir: str, n_merges: int = 8):
    """Learn ``n_merges`` BPE merge rules over `[a-z]+` word runs
    (Sennrich et al. 2016): → (step, left, right, n).

    The trainer's input is the word-FREQUENCY table, not the corpus —
    so the distributed part is exactly one corpus pass (per-batch
    partial word counts, then ``groupby(word).sum``), after which the
    merge loop runs over vocabulary-sized data on the driver.  That is
    the correct scale shape: a 100 TB corpus has a bounded `[a-z]+`
    vocabulary, and re-scanning the corpus per merge (n_merges × full
    passes) would be strictly worse.  Ties break on the
    lexicographically smallest (left, right) so the rule sequence is
    deterministic; ``n`` is the pair's weighted count at selection
    time.  Oracled by an independent naive re-derivation fixture
    (tools/make_sketch_fixtures.py), keyed by corpus content.
    """
    from collections import Counter

    import pyarrow as pa

    from ray.data.aggregate import Sum

    from ..sources.readers import read_parquet_clean

    word_re = re.compile(r"[a-z]+")
    partial_schema = pa.schema([("word", pa.string()), ("n", pa.int64())])

    def partial(batch: pd.DataFrame) -> pa.Table:
        c = Counter(word_re.findall(" ".join(batch["text"])))
        return pa.table(
            {"word": list(c.keys()), "n": list(c.values())},
            schema=partial_schema,
        )

    vocab = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )

    words = [tuple(w) for w in vocab["word"]]
    freqs = vocab["n"].astype("int64").tolist()
    rules = []
    for step in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for syms, f in zip(words, freqs):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        (left, right), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        rules.append({"step": step, "left": left, "right": right, "n": int(n)})
        merged = left + right
        new_words = []
        for syms in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words

    df = pd.DataFrame(rules, columns=["step", "left", "right", "n"])
    for c in ("step", "n"):
        df[c] = df[c].astype("int64")
    return df


def _bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pinned apply spec: each learned rule in rank order, exhaustively
    left-to-right (deterministic; mirrored by the fixture's independent
    encoder)."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(sf_dir: str, n_merges: int = 8):
    """Tokenize the corpus with the merges :func:`bpe_train` learns →
    (doc_id, n_tokens_bpe, sig).

    ``n_tokens_bpe`` counts post-merge symbols over the doc's `[a-z]+`
    runs; ``sig`` is the md5 of the space-joined symbol stream (an
    order-sensitive exact check on the whole segmentation, not just
    its length).  Two corpus passes total: the trainer's count pass,
    then one encode pass with the 8-rule merge list shipped in the
    task closure (bytes, not a shuffle) and a per-actor word→symbols
    memo so each distinct word is segmented once per block.  Oracled
    by the independent fixture encoder (tools/make_bpe_fixture.py).
    """
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    rules = bpe_train(sf_dir, n_merges=n_merges)
    merges = list(zip(rules["left"], rules["right"]))
    word_re = re.compile(r"[a-z]+")
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens_bpe", pa.int64()),
         ("sig", pa.string())]
    )

    def encode(batch: pd.DataFrame) -> pa.Table:
        memo: dict[str, list[str]] = {}
        ids, counts, sigs = [], [], []
        for doc_id, t in zip(batch["doc_id"], batch["text"]):
            toks: list[str] = []
            for w in word_re.findall(t):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _bpe_apply(w, merges)
                toks.extend(got)
            ids.append(int(doc_id))
            counts.append(len(toks))
            sigs.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
        return pa.table(
            {"doc_id": ids, "n_tokens_bpe": counts, "sig": sigs},
            schema=out_schema,
        )

    df = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(encode, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values("doc_id").reset_index(drop=True)


# ---- TF-IDF top terms ----------------------------------------------------

TFIDF_TOPK = 3


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOPK, concurrency=None):
    """Per-document top-``k`` TF-IDF terms — the keyword-extraction
    pattern behind the reference's statistical term weighting
    (/root/reference/rag/nlp/term_weight.py:150-209 mixes idf-shaped
    scores into retrieval; the serving side is out of scope, this is
    the corpus-scan equivalent).

    Two streaming passes over ONE materialized read:

    1. document frequency — per-batch (term, df-partial) rows over each
       doc's DISTINCT terms through a narrow combine level to a
       driver-side finalize (natural language vocabulary grows
       ~O(corpus^0.5) — Heaps' law — and Zipfian hot terms collapse
       ~batch-fold in the combine, so the finalize input stays far
       below corpus size; a genuinely huge vocabulary falls back to
       the exact distributed groupby, count-gated like
       lm_cross_entropy's model reduce);
    2. scoring — the idf table broadcasts via ``ray.put``
       (worker-process cached — the stateless-task discipline from
       the r5 dsir rewrite); each doc computes tf via one
       ``np.unique`` and keeps its local top-k (score desc, term asc)
       — only k rows per doc leave the batch.

    Spec (mirrored in SQL): tf = term count in doc over the unified
    ASCII token runs; idf = ln((N+1)/(df+1)); score = round(tf*idf, 6)
    BEFORE ranking, ties broken by term ascending.
    """
    import re as _re

    import numpy as np
    import pyarrow as pa
    import ray

    from .curation import _cached_broadcast

    word_re = _re.compile(_TOKEN_RUN)
    docs = _docs(sf_dir).materialize()

    df_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])

    def df_partial(batch: pd.DataFrame) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"]:
            for w in set(word_re.findall(text)):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"term": list(counts.keys()),
             "df": pa.array(list(counts.values()), type=pa.int64())},
            schema=df_schema,
        )

    def df_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("term", as_index=False, sort=False).agg(df=("df", "sum"))
        return pa.table(
            {"term": g["term"].astype(str).to_numpy(),
             "df": g["df"].to_numpy().astype("int64")},
            schema=df_schema,
        )

    partials = (
        docs.map_batches(df_partial, batch_format="pandas")
        .map_batches(df_combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )
    if partials.count() <= 2_000_000:
        df_tbl = (partials.to_pandas()
                  .groupby("term", as_index=False).agg(df=("df", "sum")))
    else:
        from ray.data.aggregate import Sum

        df_tbl = (
            partials.groupby("term")
            .aggregate(Sum("df", alias_name="df"))
            .to_pandas()
        )
    # corpus row count from parquet footer metadata — no second pass
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    idf = {
        t: float(np.log((n_docs + 1.0) / (d + 1.0)))
        for t, d in zip(df_tbl["term"], df_tbl["df"])
    }
    iref = ray.put(idf)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("rank", pa.int64()),
         ("term", pa.string()), ("tfidf_r6", pa.float64())]
    )

    def score(batch: pd.DataFrame) -> pa.Table:
        idf = _cached_broadcast(iref)
        ids, ranks, terms, scores = [], [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            words, tf = np.unique(word_re.findall(text), return_counts=True)
            scored = sorted(
                ((round(int(c) * idf[w], 6), w)
                 for w, c in zip(words, tf)),
                key=lambda sw: (-sw[0], sw[1]),
            )[:k]
            for rank, (s, w) in enumerate(scored, 1):
                ids.append(int(doc_id))
                ranks.append(rank)
                terms.append(w)
                scores.append(s)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "rank": pa.array(ranks, type=pa.int64()),
             "term": pa.array(terms, type=pa.string()),
             "tfidf_r6": pa.array(scores, type=pa.float64())},
            schema=out_schema,
        )

    out = (
        docs.map_batches(score, batch_format="pandas", batch_size=256)
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    for c in ("doc_id", "rank"):
        out[c] = out[c].astype("int64")
    return out


# ---- hybrid token+vector retrieval fusion --------------------------------

HYBRID_TK_WEIGHT = 0.3
HYBRID_VT_WEIGHT = 0.7


def hybrid_topk(sf_dir: str, k: int = 20, concurrency=None,
                broadcast_limit: int = 2_000_000):
    """Hybrid retrieval scoring: weighted fusion of the BM25-lite
    token score and cosine vector similarity — the reference's rerank
    fusion (``hybrid_similarity`` with tkweight=0.3 / vtweight=0.7,
    /root/reference/rag/nlp/query.py:219; the search path fuses the
    same two channels via a ``weighted_sum`` FusionExpr,
    /root/reference/rag/nlp/search.py:114).

    Three streaming stages, none corpus-collecting:

    1. token side — the shared :func:`_bm25_idf` document-frequency
       pass, then one scoring scan kept as a narrow
       ``(doc_id, tk_score)`` Dataset (materialized once: it has two
       consumers).  The normalizer ``tk_max`` is one tiny ``max()``
       aggregate.
    2. vector side — one embeddings pass against the broadcast
       id-minimal query vector: ``(doc_id, vt_r9)`` with the cosine
       rounded to 9 dp (the ann.py jitter convention) BEFORE fusion.
    3. fusion, count-gated on the parquet-footer row count: under
       ``broadcast_limit`` docs the narrow (doc_id, tk_score) table
       broadcasts (``ray.put`` sorted int64 arrays, zero-copy per
       task) into the vector pass, which fuses by ``searchsorted``
       lookup and emits a local top-k partial — no exchange at all.
       Past the budget (the tk table is corpus-sized at 100 TB) the
       two score tables co-partition on a coarse ``doc_id // 65536``
       bucket (common-schema union + ONE groupby; only ids + scalars
       move — the events_order_asof co-partition pattern, measured
       ~4 s cheaper than Ray's hash-join operator at this scale) and
       each bucket vector-merges on doc_id.  Both branches compute
       ``hybrid_r6 = round(0.3·tk/max(tk_max,1) + 0.7·vt_r9, 6)``
       and the driver merge sees ≤ k × n_partials rows — no
       all-to-all sort.

    Ranking is on the ROUNDED score, ties doc_id-ascending; the whole
    chain is mirrored in SQL (integer tk, list_cosine_similarity vt).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.readers import read_docs_split, read_parquet_clean

    # split-on-read: the one-row-group testdata table would otherwise
    # run the 2 s regex token-scoring scan as a single task.
    # Materialized once for its two consumers (idf pass, tk scan)
    docs = read_docs_split(
        sf_dir, columns=["doc_id", "text"], rows_per_block=512
    ).materialize()
    idf = _bm25_idf(docs)
    idf_ref = ray.put(idf)

    # common side-tagged schema so the two channels union into ONE
    # groupby; tk rows carry vt_r9 = NaN, vt rows carry tk_score = -1
    side_schema = pa.schema(
        [("bucket", pa.int64()), ("doc_id", pa.int64()),
         ("tk_score", pa.int64()), ("vt_r9", pa.float64())]
    )
    _BUCKET = 65536

    def tk_score(batch: pd.DataFrame):
        weights = ray.get(idf_ref)
        lengths = batch["text"].str.count(" ").to_numpy() + 1
        total = np.zeros(len(batch), dtype=np.int64)
        for term, w in weights.items():
            total += batch["text"].str.count(rf"\b{term}\b").to_numpy() * w
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {"bucket": ids // _BUCKET, "doc_id": ids,
             "tk_score": total // (lengths + BM25_LEN_NORM),
             "vt_r9": np.full(len(ids), np.nan)},
            schema=side_schema,
        )

    # narrow derived table; materialized because it has two consumers
    # (the normalizer and the fusion) — never the raw corpus
    tk_ds = docs.map_batches(tk_score, batch_format="pandas").materialize()

    # count-gate (parquet-footer row count, no extra pass): when the
    # narrow (doc_id, tk_score) table fits the driver budget, fuse by
    # broadcast lookup inside the vector pass and skip BOTH the
    # ``max`` aggregate and the union+groupby exchange (~2 s fixed at
    # this scale); past the budget the co-partitioned exchange below
    # is the honest 100-TB path (the tk table is corpus-sized).
    import pyarrow.dataset as pads

    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    tk_ref = None
    if n_docs <= broadcast_limit:
        tkdf = tk_ds.select_columns(["doc_id", "tk_score"]).to_pandas()
        t_ids = tkdf["doc_id"].to_numpy().astype(np.int64)
        t_sc = tkdf["tk_score"].to_numpy().astype(np.int64)
        o = np.argsort(t_ids)
        t_ids, t_sc = np.ascontiguousarray(t_ids[o]), np.ascontiguousarray(t_sc[o])
        denom = float(max(int(t_sc.max(initial=0)), 1))
        tk_ref = ray.put((t_ids, t_sc))
    else:
        tk_max = tk_ds.max("tk_score")
        denom = float(max(int(tk_max or 0), 1))

    # id-minimal embedding = the deterministic query vector (head-only
    # read; the corpus writer emits vec_id-sorted files)
    from .ann import _head_rows

    qdf = (
        _head_rows(f"{sf_dir}/embeddings.parquet", 1, ["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id").head(1)
    )
    q = np.asarray(qdf["embedding"].iloc[0], dtype=np.float64)
    qref = ray.put(q)

    def vt_score(batch: pd.DataFrame):
        qv = ray.get(qref)
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        # dot/(|a||b|) association mirrors list_cosine_similarity
        dots = mat @ qv
        denoms = np.linalg.norm(mat, axis=1) * np.linalg.norm(qv)
        vt = np.round(dots / np.maximum(denoms, 1e-300), 9)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        return pa.table(
            {"bucket": ids // _BUCKET, "doc_id": ids,
             "tk_score": np.full(len(ids), -1, dtype=np.int64),
             "vt_r9": vt},
            schema=side_schema,
        )

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    fused_schema = pa.schema(
        [("doc_id", pa.int64()), ("tk_score", pa.int64()),
         ("vt_r9", pa.float64()), ("hybrid_r6", pa.float64())]
    )

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["hybrid_r6", "doc_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        out["rank"] = range(1, len(out) + 1)
        for c in ("doc_id", "tk_score", "rank"):
            out[c] = out[c].astype("int64")
        return out[["doc_id", "tk_score", "vt_r9", "hybrid_r6", "rank"]]

    if tk_ref is not None:
        def fuse_broadcast(batch: pd.DataFrame):
            """vt scoring + broadcast tk lookup + local top-k in one
            pass: every global top-k row is in its own batch's local
            top-k, so the driver merge sees ≤ k × n_blocks rows."""
            bt_ids, bt_sc = ray.get(tk_ref)
            qv = ray.get(qref)
            mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            dots = mat @ qv
            denoms = np.linalg.norm(mat, axis=1) * np.linalg.norm(qv)
            vt = np.round(dots / np.maximum(denoms, 1e-300), 9)
            ids = batch["vec_id"].to_numpy().astype(np.int64)
            pos = np.searchsorted(bt_ids, ids)
            pos_c = np.minimum(pos, max(len(bt_ids) - 1, 0))
            ok = (pos < len(bt_ids)) & (bt_ids[pos_c] == ids)
            if not ok.any():
                return fused_schema.empty_table()
            ids, vt = ids[ok], vt[ok]
            tk = bt_sc[pos_c[ok]]
            hybrid = np.round(
                HYBRID_TK_WEIGHT * (tk / denom) + HYBRID_VT_WEIGHT * vt, 6
            )
            order = np.lexsort((ids, -hybrid))[:k]
            return pa.table(
                {"doc_id": ids[order], "tk_score": tk[order],
                 "vt_r9": vt[order], "hybrid_r6": hybrid[order]},
                schema=fused_schema,
            )

        return _finalize(
            emb.map_batches(fuse_broadcast, batch_format="pandas").to_pandas()
        )

    vt_ds = emb.map_batches(vt_score, batch_format="pandas")

    def fuse_topk(group: pd.DataFrame):
        is_tk = group["tk_score"].to_numpy() >= 0
        tk_side = group[is_tk]
        vt_side = group[~is_tk]
        both = pd.merge(
            tk_side[["doc_id", "tk_score"]],
            vt_side[["doc_id", "vt_r9"]],
            on="doc_id", how="inner",
        )
        if both.empty:
            return fused_schema.empty_table()
        ids = both["doc_id"].to_numpy().astype(np.int64)
        tk = both["tk_score"].to_numpy().astype(np.int64)
        vt = both["vt_r9"].to_numpy()
        hybrid = np.round(
            HYBRID_TK_WEIGHT * (tk / denom) + HYBRID_VT_WEIGHT * vt, 6
        )
        order = np.lexsort((ids, -hybrid))[:k]
        return pa.table(
            {"doc_id": ids[order], "tk_score": tk[order],
             "vt_r9": vt[order], "hybrid_r6": hybrid[order]},
            schema=fused_schema,
        )

    return _finalize(
        tk_ds.union(vt_ds)
        .groupby("bucket")
        .map_groups(fuse_topk, batch_format="pandas")
        .to_pandas()
    )


# ---- HyperLogLog distinct-token sketch -----------------------------------

HLL_P = 12                      # 2^12 = 4096 registers, ~1.6% rel. error
HLL_M = 1 << HLL_P


def _hll_partial(texts, word_re) -> "np.ndarray":
    """Register vector for one batch of texts — the HLL pinned spec:
    h = first 64 bits of md5(token); register = top HLL_P bits; rho =
    leading-zero count + 1 within the remaining 52 bits (53 when they
    are all zero)."""
    import numpy as np

    regs = np.zeros(HLL_M, dtype=np.int64)
    rest_bits = 64 - HLL_P
    mask = (1 << rest_bits) - 1
    seen: set[str] = set()
    for text in texts:
        for w in word_re.findall(text):
            # a repeated token can never raise a register again —
            # hash each DISTINCT token once per batch
            if w in seen:
                continue
            seen.add(w)
            h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            reg = h >> rest_bits
            rest = h & mask
            rho = rest_bits - rest.bit_length() + 1
            if rho > regs[reg]:
                regs[reg] = rho
    return regs


def hll_estimate(regs) -> int:
    """Flajolet et al. 2007 estimator with the small-range linear
    counting correction; registers iterate in index order so the float
    sum is reproducible bit-for-bit."""
    import math

    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0.0
    zeros = 0
    for r in regs:
        s += 2.0 ** (-int(r))
        if r == 0:
            zeros += 1
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


def hll_distinct_tokens(sf_dir: str):
    """Approximate per-source distinct-token counts via a mergeable
    HyperLogLog sketch — the cardinality primitive a 100 TB pipeline
    uses where exact COUNT(DISTINCT) would shuffle every token: each
    batch folds its tokens into a 4096-register vector, only nonzero
    (source, register, rho) rows leave the task (≤ 4096 per source per
    batch, CONSTANT in corpus size), and a register-wise max merges
    partials — max is associative/commutative, so the estimate is
    independent of batch boundaries and parallelism, and the reduce
    needs no all-to-all: a narrow ``map_batches`` combine level
    (~batch-fold fan-in on the bounded register space) feeds a
    driver-side final max (the r5 reduce discipline).

    Oracled via an independent pure-Python re-derivation
    (tools/make_hll_fixture.py) — approximate vs the TRUE count, exact
    vs the pinned sketch spec.  Output: ``source, nonzero_regs,
    est_distinct`` sorted by source.
    """
    import numpy as np
    import pyarrow as pa

    word_re = re.compile(_TOKEN_RUN)

    partial_schema = pa.schema(
        [("source", pa.string()), ("reg", pa.int64()), ("rho", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        srcs, regs_out, rhos = [], [], []
        for source, grp in batch.groupby("source"):
            regs = _hll_partial(grp["text"], word_re)
            nz = np.nonzero(regs)[0]
            srcs.extend([source] * len(nz))
            regs_out.append(nz)
            rhos.append(regs[nz])
        return pa.table(
            {"source": pa.array(srcs, type=pa.string()),
             "reg": pa.array(
                 np.concatenate(regs_out) if regs_out
                 else np.array([], dtype=np.int64)),
             "rho": pa.array(
                 np.concatenate(rhos) if rhos
                 else np.array([], dtype=np.int64))},
            schema=partial_schema,
        )

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["source", "reg"], as_index=False).agg(
            rho=("rho", "max"))
        return pa.table(
            {"source": g["source"].astype(str).to_numpy(),
             "reg": g["reg"].to_numpy().astype("int64"),
             "rho": g["rho"].to_numpy().astype("int64")},
            schema=partial_schema,
        )

    from ..sources.readers import read_docs_split

    docs = read_docs_split(sf_dir, columns=["text", "source"])
    merged = (
        docs.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source", "reg"], as_index=False)
        .agg(rho=("rho", "max"))
    )

    rows = []
    for source, grp in merged.groupby("source"):
        regs = np.zeros(HLL_M, dtype=np.int64)
        regs[grp["reg"].to_numpy()] = grp["rho"].to_numpy()
        rows.append(
            {"source": source,
             "nonzero_regs": int((regs > 0).sum()),
             "est_distinct": hll_estimate(regs)}
        )
    df = pd.DataFrame(rows, columns=["source", "nonzero_regs", "est_distinct"])
    df = df.sort_values("source").reset_index(drop=True)
    for c in ("nonzero_regs", "est_distinct"):
        df[c] = df[c].astype("int64")
    return df


# ---- exact heavy hitters via Misra-Gries candidates -----------------------

HH_PHI_X1000 = 10  # heavy = count > floor(0.01 * total_tokens)


def heavy_hitters(sf_dir: str, phi_x1000: int = HH_PHI_X1000):
    """EXACT φ-heavy-hitter tokens (corpus count > floor(φ·N)) with
    bounded state: a per-batch Misra-Gries summary with ⌈1/φ⌉ counters
    nominates candidates, then one exact counting pass over the
    candidate set verifies.

    Why this is exact: a token with global count > φ·N must have
    batch-local count > φ·n_b in at least one batch (averaging), and
    Misra-Gries with ⌈1/φ⌉ counters never evicts an item with
    batch-frequency above φ — so the union of per-batch candidate sets
    is a SUPERSET of the true heavy hitters, and the exact second pass
    (broadcast candidate set, per-batch ``value_counts`` partials into
    a candidate-sized groupby) trims it to the precise answer.  State
    per task is O(1/φ); only candidate tokens and their partial counts
    ever shuffle.  The plain-SQL ``HAVING COUNT(*) > floor(φ·N)``
    oracle checks the completeness guarantee end-to-end.

    Output: ``token, cnt`` for every heavy token, sorted by
    (cnt desc, token).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from .curation import _cached_broadcast

    word_re = re.compile(_TOKEN_RUN)
    k = (1000 + phi_x1000 - 1) // phi_x1000  # ceil(1/phi) counters

    # one materialized read for the candidate pass + the exact pass
    docs = _docs(sf_dir).materialize()

    cand_schema = pa.schema([("token", pa.string())])
    cnt_schema = pa.schema([("token", pa.string()), ("cnt", pa.int64()),
                            ("n_tokens", pa.int64())])

    def mg_candidates(batch: pd.DataFrame) -> pa.Table:
        counters: dict[str, int] = {}
        for text in batch["text"]:
            for w in word_re.findall(text):
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        return pa.table(
            {"token": pa.array(sorted(counters), type=pa.string())},
            schema=cand_schema,
        )

    candidates = (
        docs.map_batches(mg_candidates, batch_format="pandas")
        .to_pandas()["token"]
    )
    cand_ref = ray.put(frozenset(candidates))

    def exact_partial(batch: pd.DataFrame) -> pa.Table:
        cand = _cached_broadcast(cand_ref)
        counts: dict[str, int] = {}
        total = 0
        for text in batch["text"]:
            ws = word_re.findall(text)
            total += len(ws)
            for w in ws:
                if w in cand:
                    counts[w] = counts.get(w, 0) + 1
        toks = sorted(counts)
        # the sentinel contains a space, which a token (a maximal
        # non-whitespace run) can never contain — no collision possible
        return pa.table(
            {"token": pa.array(toks + [" total "], type=pa.string()),
             "cnt": pa.array([counts[t] for t in toks] + [0],
                              type=pa.int64()),
             "n_tokens": pa.array([0] * len(toks) + [total],
                                   type=pa.int64())},
            schema=cnt_schema,
        )

    def cnt_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("token", as_index=False).agg(
            cnt=("cnt", "sum"), n_tokens=("n_tokens", "sum"))
        return pa.table(
            {"token": g["token"].astype(str).to_numpy(),
             "cnt": g["cnt"].to_numpy().astype("int64"),
             "n_tokens": g["n_tokens"].to_numpy().astype("int64")},
            schema=cnt_schema,
        )

    # candidate-set-sized integer partials (≤ ⌈1/φ⌉ × n_batches rows):
    # combine level + driver finalize, no all-to-all
    reduced = (
        docs.map_batches(exact_partial, batch_format="pandas")
        .map_batches(cnt_combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("token", as_index=False)
        .agg(cnt=("cnt", "sum"), n_tokens=("n_tokens", "sum"))
    )
    total = int(reduced["n_tokens"].sum())
    thresh = (phi_x1000 * total) // 1000
    out = reduced[(reduced["token"] != " total ")
                  & (reduced["cnt"] > thresh)][["token", "cnt"]]
    out = out.sort_values(["cnt", "token"], ascending=[False, True])
    out = out.reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out


def zipf_fit(sf_dir: str, top_n: int = 1000, driver_limit: int = 2_000_000):
    """Zipf rank-frequency fit — a one-row corpus-health statistic
    (Zipf 1949; a natural-language corpus fits ln(freq) ≈ a·ln(rank)+b
    with a ≈ −1, while templated/synthetic text flattens the slope):
    least-squares regression of ln(count) on ln(rank) over the
    ``top_n`` most frequent ``[a-z]+`` words → (zipf_slope,
    zipf_intercept, r2, n_points), floats rounded to 6 decimals (the
    established idiom absorbing summation-association/libm-ulp
    differences vs the DuckDB ``regr_*`` oracle).

    Distributed plan (the :func:`vocab_topk` shape): per-batch word
    count partials → one narrow combine level → under ``driver_limit``
    the vocabulary-sized table finalizes on the driver; above it an
    exact distributed ``groupby(word)`` recount feeds per-batch
    top-``top_n`` partials (exact after full per-key sums — a
    semilattice reduce), so the driver never sees more than
    ``top_n × n_blocks`` rows.  The regression itself runs over at
    most ``top_n`` points."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .curation import _docs

    word_re = re.compile(r"[a-z]+")
    schema = pa.schema([("word", pa.string()), ("n", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        words = b["text"].str.findall(word_re).explode().dropna()
        g = words.groupby(words).size()
        return pa.table({"word": g.index.astype(str).to_numpy(),
                         "n": g.to_numpy().astype("int64")}, schema=schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("word", as_index=False, sort=False).agg(n=("n", "sum"))
        return pa.table({"word": g["word"].astype(str).to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=schema)

    partials = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )
    if partials.count() <= driver_limit:
        counts = (partials.to_pandas()
                  .groupby("word", as_index=False).agg(n=("n", "sum")))
    else:
        def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
            g = b.sort_values(["n", "word"],
                              ascending=[False, True]).head(top_n)
            g["n"] = g["n"].astype("int64")
            return g

        counts = (partials.groupby("word")
                  .aggregate(Sum("n", alias_name="n"))
                  .map_batches(partial_topk, batch_format="pandas")
                  .to_pandas())

    counts = (counts.sort_values(["n", "word"], ascending=[False, True])
              .head(top_n).reset_index(drop=True))
    k = len(counts)
    if k < 2:
        return pd.DataFrame({"zipf_slope": pd.Series([], dtype="float64"),
                             "zipf_intercept": pd.Series([], dtype="float64"),
                             "r2": pd.Series([], dtype="float64"),
                             "n_points": pd.Series([], dtype="int64")})
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(counts["n"].to_numpy().astype(np.float64))
    mx, my = x.mean(), y.mean()
    sxy = ((x - mx) * (y - my)).sum()
    sxx = ((x - mx) ** 2).sum()
    syy = ((y - my) ** 2).sum()
    slope = sxy / sxx
    out = pd.DataFrame({
        "zipf_slope": [round(slope, 6)],
        "zipf_intercept": [round(my - slope * mx, 6)],
        "r2": [round((sxy * sxy) / (sxx * syy), 6)],
        "n_points": pd.Series([k], dtype="int64"),
    })
    return out[["zipf_slope", "zipf_intercept", "r2", "n_points"]]


def ttr_by_source(sf_dir: str, driver_limit: int = 2_000_000):
    """Lexical-diversity profile per source — token count, type count,
    hapax-legomenon count, type-token ratio and hapax ratio over
    lowercase ``[a-z]+`` words (the corpus-quality scan run before
    tokenizer training; low TTR flags templated/duplicated sources).

    Distributed plan: per-batch (source, word) count partials → one
    narrow combine level → under ``driver_limit`` the driver finalizes
    the sources × vocabulary table; above it an exact distributed
    ``groupby(source, word)`` recount feeds per-batch (source, tokens,
    types, hapax) partial sums — every post-recount row is a unique
    (source, word) pair, so types/hapax are additive across batches —
    and a sources-sized driver merge."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .curation import _docs

    word_re = re.compile(r"[a-z]+")
    schema = pa.schema([("source", pa.string()), ("word", pa.string()),
                        ("n", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        words = b["text"].str.lower().str.findall(word_re).explode().dropna()
        src = b["source"].reindex(words.index)
        g = (pd.DataFrame({"source": src.to_numpy(),
                           "word": words.to_numpy()})
             .groupby(["source", "word"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "word": g["word"].astype(str).to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["source", "word"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "word": g["word"].astype(str).to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=schema)

    def _ratios(g: pd.DataFrame) -> pd.DataFrame:
        for c in ("tokens", "types", "hapax"):
            g[c] = g[c].astype("int64")
        g["ttr"] = (g["types"] / g["tokens"]).round(6)
        g["hapax_ratio"] = (g["hapax"] / g["types"]).round(6)
        return g[["source", "tokens", "types", "hapax", "ttr",
                  "hapax_ratio"]]

    partials = (
        _docs(sf_dir, columns=("source", "text"))
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )
    if partials.count() <= driver_limit:
        counts = (partials.to_pandas()
                  .groupby(["source", "word"], as_index=False)
                  .agg(n=("n", "sum")))
        g = counts.groupby("source").agg(
            tokens=("n", "sum"), types=("n", "size"),
            hapax=("n", lambda s: int((s == 1).sum())))
        return _ratios(g.reset_index().sort_values("source")
                       .reset_index(drop=True))

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(is_hapax=(b["n"] == 1).astype("int64")).groupby(
            "source", as_index=False).agg(
            tokens=("n", "sum"), types=("n", "size"),
            hapax=("is_hapax", "sum"))
        for c in ("tokens", "types", "hapax"):
            g[c] = g[c].astype("int64")
        return g

    df = (partials.groupby(["source", "word"])
          .aggregate(Sum("n", alias_name="n"))
          .map_batches(stats_partial, batch_format="pandas")
          .to_pandas()
          .groupby("source", as_index=False).agg(
              tokens=("tokens", "sum"), types=("types", "sum"),
              hapax=("hapax", "sum"))
          .sort_values("source").reset_index(drop=True))
    return _ratios(df)


def ngram_novelty(sf_dir: str, n: int = 8, n_buckets: int = 1024,
                  driver_limit: int = 5_000_000):
    """Per-document novelty score: the fraction of a doc's DISTINCT
    8-grams (over lowercase ``[a-z0-9]+`` words, the
    :func:`~.curation.decontaminate` gram convention) that occur in no
    other document — corpus document frequency 1 counted
    WITH-multiplicity, so a gram repeated only inside one doc still
    counts as novel.  The inverse of the Lee et al. 2022 duplication
    measure: low novelty flags boilerplate-heavy docs that survive
    whole-doc dedup.

    Distributed plan (the passage/substring-dedup shape): docs explode
    to per-doc-distinct gram digests ONLY (md5 as two int64 columns —
    text never shuffles) under a 1024-way coarse digest bucket; one
    ``groupby(bucket).map_groups`` walk sorts each bucket's runs —
    every copy of a digest lands in the same bucket, so df is exact
    in-bucket — and emits per-doc (n_novel, n_grams) partials; a
    final doc-keyed sum is count-gated onto the driver with an exact
    distributed ``groupby(doc_id)`` fallback."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from .curation import _docs

    word_re = re.compile(r"[a-z0-9]+")
    exp_schema = pa.schema([("doc_id", pa.int64()), ("h1", pa.int64()),
                            ("h2", pa.int64()), ("bucket", pa.int64())])

    def explode(b: pd.DataFrame) -> pa.Table:
        doc_ids, h1s, h2s = [], [], []
        for did, text in zip(b["doc_id"].to_numpy(), b["text"].to_numpy()):
            ws = word_re.findall(str(text).lower())
            if len(ws) < n:
                continue
            seen = set()
            for i in range(len(ws) - n + 1):
                gram = " ".join(ws[i:i + n])
                if gram in seen:
                    continue
                seen.add(gram)
                d = hashlib.md5(gram.encode()).digest()
                h1s.append(int.from_bytes(d[:8], "big", signed=True))
                h2s.append(int.from_bytes(d[8:], "big", signed=True))
                doc_ids.append(int(did))
        h1 = np.asarray(h1s, dtype=np.int64)
        return pa.table({"doc_id": np.asarray(doc_ids, dtype=np.int64),
                         "h1": h1,
                         "h2": np.asarray(h2s, dtype=np.int64),
                         "bucket": (h1 % n_buckets)},
                        schema=exp_schema)

    nov_schema = pa.schema([("doc_id", pa.int64()), ("n_novel", pa.int64()),
                            ("n_grams", pa.int64())])

    from ..state.skewmon import warn_rows as _skew_warn
    _warn = _skew_warn()

    def bucket_novel(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("ngram_novelty.bucket", len(group), _warn)
        if not len(group):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_novel": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64())},
                            schema=nov_schema)
        # every copy of a digest lands in this bucket: df is exact here
        g = group.sort_values(["h1", "h2"], kind="mergesort")
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        run_id = np.cumsum(new) - 1
        run_size = np.bincount(run_id)
        novel = run_size[run_id] == 1
        p = (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                           "novel": novel.astype(np.int64)})
             .groupby("doc_id", as_index=False)
             .agg(n_novel=("novel", "sum"), n_grams=("novel", "size")))
        return pa.table({"doc_id": p["doc_id"].to_numpy().astype("int64"),
                         "n_novel": p["n_novel"].to_numpy().astype("int64"),
                         "n_grams": p["n_grams"].to_numpy().astype("int64")},
                        schema=nov_schema)

    exploded = (_docs(sf_dir, columns=("doc_id", "text"), rows_per_block=256)
                .map_batches(explode, batch_format="pandas"))
    parts = (exploded.groupby("bucket")
             .map_groups(bucket_novel, batch_format="pandas")
             .materialize())
    if parts.count() <= driver_limit:
        df = (parts.to_pandas()
              .groupby("doc_id", as_index=False)
              .agg(n_novel=("n_novel", "sum"), n_grams=("n_grams", "sum")))
    else:
        from ray.data.aggregate import Sum
        df = (parts.groupby("doc_id")
              .aggregate(Sum("n_novel", alias_name="n_novel"),
                         Sum("n_grams", alias_name="n_grams"))
              .to_pandas())
    df = df.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_novel", "n_grams"):
        df[c] = df[c].astype("int64")
    df["novelty"] = (df["n_novel"] / df["n_grams"]).round(6)
    return df[["doc_id", "n_grams", "n_novel", "novelty"]]


def length_rank_cdf(sf_dir: str):
    """Per-doc exact global length rank: for every document,
    ``n_smaller`` = how many corpus docs have STRICTLY smaller
    ``n_chars`` — ``RANK() − 1``, the integer numerator of the exact
    empirical CDF (the length-percentile feature curation recipes
    normalize against), computed WITHOUT a global sort.

    Distributed plan, two passes over one materialized two-column
    read: pass 1 emits per-batch ``(n_chars → count)`` histogram
    partials (distinct lengths are bounded by the MAX doc length, not
    the corpus size) → one narrow combine level → the driver cumsums
    the sorted histogram into a strictly-less table and broadcasts it
    as two sorted int64 numpy arrays (``ray.put``, zero-copy per
    worker); pass 2 maps each doc through ``np.searchsorted``.  No
    all-to-all; the only exchanged rows are histogram partials."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).materialize()

    hist_schema = pa.schema([("n_chars", pa.int64()), ("n", pa.int64())])

    def hist_partial(b: pd.DataFrame) -> pa.Table:
        vals, cnts = np.unique(
            b["n_chars"].to_numpy().astype(np.int64), return_counts=True)
        return pa.table(
            {"n_chars": vals, "n": cnts.astype(np.int64)},
            schema=hist_schema)

    def hist_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("n_chars", as_index=False, sort=False).agg(
            n=("n", "sum"))
        return pa.table(
            {"n_chars": g["n_chars"].to_numpy().astype(np.int64),
             "n": g["n"].to_numpy().astype(np.int64)},
            schema=hist_schema)

    hist = (
        ds.map_batches(hist_partial, batch_format="pandas",
                       batch_size=4096)
        .map_batches(hist_combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("n_chars", as_index=False).agg(n=("n", "sum"))
        .sort_values("n_chars").reset_index(drop=True)
    )
    values = hist["n_chars"].to_numpy().astype(np.int64)
    below = np.concatenate(
        [[0], np.cumsum(hist["n"].to_numpy().astype(np.int64))[:-1]])
    values_ref = ray.put(values)
    below_ref = ray.put(below)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_chars", pa.int64()),
                            ("n_smaller", pa.int64())])

    def rank_map(b: pd.DataFrame) -> pa.Table:
        vals = ray.get(values_ref)
        cum = ray.get(below_ref)
        x = b["n_chars"].to_numpy().astype(np.int64)
        pos = np.searchsorted(vals, x)  # exact: every x is in vals
        return pa.table(
            {"doc_id": b["doc_id"].to_numpy().astype(np.int64),
             "n_chars": x,
             "n_smaller": cum[pos]},
            schema=out_schema)

    return ds.map_batches(rank_map, batch_format="pandas",
                          batch_size=4096)


def source_vocab_jaccard(sf_dir: str, n_buckets: int = 1024,
                         max_sources: int = 63):
    """Pairwise vocabulary Jaccard between sources — for every source
    pair, the exact |Va ∩ Vb| / |Va ∪ Vb| over each source's DISTINCT
    lowercase ``[a-z]+`` word set (the :func:`vocab_topk` token
    convention): the domain-overlap diagnostic run before choosing
    mixture weights (two sources with near-identical vocabularies are
    one domain, not two).

    Distributed plan (the :func:`ngram_novelty` digest-bucket shape,
    reduced one level further): docs explode to per-batch-distinct
    (token-digest, source-bit) rows — md5 as two int64 columns, text
    never shuffles — under a 1024-way coarse digest bucket; the bucket
    walk ORs each token run's bits into a per-token source BITMASK and
    emits only a (mask → token count) histogram per bucket (bounded by
    distinct masks, never vocab size); the driver sums histograms and
    reads every pairwise intersection / union off the mask histogram
    with numpy.  ONE exchange; the pair matrix never touches data.

    Envelope (documented, not silent): bitmasks hold ≤ ``max_sources``
    (63) sources in an int64 — beyond that the mask column would need
    widening to fixed-size binary; this op asserts the bound rather
    than silently truncating."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from .curation import _docs

    word_re = re.compile(r"[a-z]+")

    src_partial = (_docs(sf_dir, columns=("source",), rows_per_block=4096)
                   .map_batches(
                       lambda b: pd.DataFrame(
                           {"source": pd.unique(b["source"])}),
                       batch_format="pandas")
                   .to_pandas())
    sources = sorted(src_partial["source"].unique())
    if len(sources) > max_sources:
        raise ValueError(
            f"{len(sources)} sources exceed the {max_sources}-bit int64 "
            "mask envelope; widen the mask column to fixed-size binary")
    bit = {s: i for i, s in enumerate(sources)}

    exp_schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                            ("mask", pa.int64()), ("bucket", pa.int64())])

    def explode(b: pd.DataFrame) -> pa.Table:
        seen: dict[tuple, int] = {}
        for src, text in zip(b["source"].to_numpy(), b["text"].to_numpy()):
            sbit = 1 << bit[src]
            for w in set(word_re.findall(str(text).lower())):
                d = hashlib.md5(w.encode()).digest()
                key = (d[:8], d[8:])
                seen[key] = seen.get(key, 0) | sbit
        h1 = np.asarray(
            [int.from_bytes(k[0], "big", signed=True) for k in seen],
            dtype=np.int64)
        return pa.table(
            {"h1": h1,
             "h2": np.asarray(
                 [int.from_bytes(k[1], "big", signed=True) for k in seen],
                 dtype=np.int64),
             "mask": np.asarray(list(seen.values()), dtype=np.int64),
             "bucket": h1 % n_buckets},
            schema=exp_schema)

    hist_schema = pa.schema([("mask", pa.int64()), ("n", pa.int64())])

    from ..state.skewmon import warn_rows as _skew_warn
    _warn = _skew_warn()

    def bucket_hist(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("source_vocab_jaccard.bucket", len(group), _warn)
        if not len(group):
            return pa.table({"mask": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())},
                            schema=hist_schema)
        g = group.sort_values(["h1", "h2"], kind="mergesort")
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        # every copy of a digest lands here: the run OR is the token's
        # full source mask (reduceat: one C pass, no per-run Python)
        starts = np.flatnonzero(new)
        masks = np.bitwise_or.reduceat(g["mask"].to_numpy(), starts)
        vals, cnts = np.unique(masks, return_counts=True)
        return pa.table({"mask": vals.astype(np.int64),
                         "n": cnts.astype(np.int64)},
                        schema=hist_schema)

    hist = (_docs(sf_dir, columns=("source", "text"), rows_per_block=256)
            .map_batches(explode, batch_format="pandas")
            .groupby("bucket")
            .map_groups(bucket_hist, batch_format="pandas")
            .to_pandas()
            .groupby("mask", as_index=False).agg(n=("n", "sum")))
    masks = hist["mask"].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    has = np.stack([(masks >> i) & 1 for i in range(len(sources))])
    nv = (has * counts).sum(axis=1)  # per-source vocab sizes
    rows = []
    for a in range(len(sources)):
        for bdx in range(a + 1, len(sources)):
            inter = int(counts[(has[a] & has[bdx]) == 1].sum())
            union = int(nv[a] + nv[bdx] - inter)
            rows.append((sources[a], sources[bdx], inter, union,
                         round(inter / union, 6) if union else 0.0))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "n_inter",
                                      "n_union", "jaccard"])
    for c in ("n_inter", "n_union"):
        out[c] = out[c].astype("int64")
    return out


def source_js_divergence(sf_dir: str, driver_limit: int = 2_000_000,
                         n_buckets: int = 256):
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the mixture-design read a curator takes before
    weighting sources (near-zero JSD flags redundant sources, high
    JSD flags distribution shift), over lowercase ``[a-z]+`` words
    (the :func:`ttr_by_source` convention).

    ``JSD(a,b) = Σ_w [ −m·ln m + (p_a·ln p_a + p_b·ln p_b)/2 ]`` with
    ``m = (p_a + p_b)/2`` and ``x·ln x := 0`` at zero — per-WORD
    additive, which is what makes the distributed path exact.  The
    one float per pair rounds to 6 (absorbs summation association
    and libm ulp vs DuckDB, the char_entropy idiom).

    Distributed plan: per-batch (source, word) count partials → one
    narrow combine level → per-source totals (sources-sized,
    broadcast).  Under ``driver_limit`` the driver finalizes the
    dense sources × vocabulary matrix; above it the counts
    co-partition ONCE by word-hash bucket and each bucket emits its
    pairs-sized partial contribution rows (pairs × buckets, never
    vocabulary) for a driver-side sum."""
    import numpy as np
    import pyarrow as pa
    import ray

    from .curation import _docs

    word_re = re.compile(r"[a-z]+")
    schema = pa.schema([("source", pa.string()), ("word", pa.string()),
                        ("n", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        words = b["text"].str.lower().str.findall(word_re).explode().dropna()
        src = b["source"].reindex(words.index)
        g = (pd.DataFrame({"source": src.to_numpy(),
                           "word": words.to_numpy()})
             .groupby(["source", "word"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "word": g["word"].astype(str).to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["source", "word"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        return pa.table({"source": g["source"].astype(str).to_numpy(),
                         "word": g["word"].astype(str).to_numpy(),
                         "n": g["n"].to_numpy().astype("int64")},
                        schema=schema)

    counts = (
        _docs(sf_dir, columns=("source", "text"))
        .map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize()
    )

    # per-source token totals: sources-sized, one narrow pass
    tot = (counts.map_batches(
               lambda b: b.groupby("source", as_index=False)
               .agg(N=("n", "sum")), batch_format="pandas")
           .to_pandas()
           .groupby("source", as_index=False).agg(N=("N", "sum")))
    sources = sorted(tot["source"])
    totals = dict(zip(tot["source"], tot["N"].astype(float)))

    def _pair_frame(mat: "np.ndarray") -> pd.DataFrame:
        """dense sources × vocab count matrix → pairwise JSD"""
        sa, sb, jsd = [], [], []
        for i in range(len(sources)):
            pa_ = mat[i] / totals[sources[i]]
            for j in range(i + 1, len(sources)):
                pb_ = mat[j] / totals[sources[j]]
                m = (pa_ + pb_) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (-np.where(m > 0, m * np.log(m), 0.0)
                         + (np.where(pa_ > 0, pa_ * np.log(pa_), 0.0)
                            + np.where(pb_ > 0, pb_ * np.log(pb_), 0.0))
                         / 2.0)
                sa.append(sources[i])
                sb.append(sources[j])
                jsd.append(round(float(t.sum()), 6))
        return pd.DataFrame({"source_a": sa, "source_b": sb,
                             "jsd": np.asarray(jsd, dtype=np.float64)})

    if counts.count() <= driver_limit:
        c = (counts.to_pandas()
             .groupby(["source", "word"], as_index=False).agg(n=("n", "sum")))
        piv = (c.pivot_table(index="source", columns="word", values="n",
                             fill_value=0, aggfunc="sum")
               .reindex(sources).to_numpy(dtype=np.float64))
        return _pair_frame(piv)

    # distributed fallback: co-partition the counts ONCE by word-hash
    # bucket; each bucket's pivot is union-vocab-local and emits only
    # pairs-sized partial sums
    tot_ref = ray.put(totals)
    src_ref = ray.put(sources)

    def with_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["word"].to_pylist(), dtype=object))
        return t.append_column(
            "wbkt", pa.array((h % n_buckets).astype(np.int64)))

    part_schema = pa.schema([("source_a", pa.string()),
                             ("source_b", pa.string()),
                             ("part", pa.float64())])

    def bucket_contrib(g: pd.DataFrame) -> pa.Table:
        srcs = ray.get(src_ref)
        tots = ray.get(tot_ref)
        g = g.groupby(["source", "word"], as_index=False).agg(n=("n", "sum"))
        piv = (g.pivot_table(index="source", columns="word", values="n",
                             fill_value=0, aggfunc="sum")
               .reindex(srcs, fill_value=0).to_numpy(dtype=np.float64))
        sa, sb, parts = [], [], []
        for i in range(len(srcs)):
            pa_ = piv[i] / tots[srcs[i]]
            for j in range(i + 1, len(srcs)):
                pb_ = piv[j] / tots[srcs[j]]
                m = (pa_ + pb_) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (-np.where(m > 0, m * np.log(m), 0.0)
                         + (np.where(pa_ > 0, pa_ * np.log(pa_), 0.0)
                            + np.where(pb_ > 0, pb_ * np.log(pb_), 0.0))
                         / 2.0)
                sa.append(srcs[i])
                sb.append(srcs[j])
                parts.append(float(t.sum()))
        return pa.table({"source_a": sa, "source_b": sb,
                         "part": np.asarray(parts, dtype=np.float64)},
                        schema=part_schema)

    df = (counts.map_batches(with_bucket, batch_format="pyarrow")
          .groupby("wbkt").map_groups(bucket_contrib, batch_format="pandas")
          .to_pandas()
          .groupby(["source_a", "source_b"], as_index=False)
          .agg(jsd=("part", "sum")))
    df["jsd"] = df["jsd"].round(6)
    return df.sort_values(["source_a", "source_b"]).reset_index(drop=True)
