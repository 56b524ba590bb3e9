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
_CJK = re.compile(r"[一-鿿]")
_PUNCT = re.compile(r"[.,!?;:]")
_STOPWORDS = ("the", "a", "of", "to", "and")


def _docs(sf_dir: str):
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])


def token_stats(sf_dir: str):
    """Per-language doc/token/char totals (partial-aggregated inside
    batches before the small groupby)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split(_WS).str.len()
        chars = batch["text"].str.len()
        g = pd.DataFrame({"lang": batch["lang"], "toks": toks, "chars": chars})
        agg = g.groupby("lang", as_index=False).agg(
            n_docs=("toks", "size"), n_tokens=("toks", "sum"), n_chars=("chars", "sum")
        )
        return agg

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir).map_batches(partial, batch_format="pandas")
    out = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_chars", alias_name="n_chars"),
    )
    df = out.sort("lang").to_pandas()
    for c in ("n_docs", "n_tokens", "n_chars"):
        df[c] = df[c].astype("int64")
    return df


def quality_scores(sf_dir: str):
    """Per-doc quality features: whitespace tokens, punctuation count,
    stopword count, mean word length (×100, integer)."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        stripped = text.str.strip()
        toks = stripped.str.split(_WS)
        n_tokens = toks.str.len()
        n_punct = text.str.count(_PUNCT)
        stop_pat = r"\b(?:%s)\b" % "|".join(_STOPWORDS)
        n_stop = text.str.count(stop_pat)
        mean_wordlen_x100 = (
            (stripped.str.replace(_WS, "", regex=True).str.len() * 100) // n_tokens
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens.astype("int64"),
                "n_punct": n_punct.astype("int64"),
                "n_stopwords": n_stop.astype("int64"),
                "mean_wordlen_x100": mean_wordlen_x100.astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pandas").sort("doc_id")


def lang_id(sf_dir: str):
    """Deterministic script-based language bucket per doc (CJK-ratio
    heuristic à la rag/nlp/__init__.py:248-257); aggregated counts."""

    def ident(batch: pd.DataFrame) -> pd.DataFrame:
        cjk = batch["text"].str.count(_CJK)
        total = batch["text"].str.len()
        pred = (cjk * 5 > total).map({True: "zh", False: "latin"})
        g = pd.DataFrame({"pred_lang": pred})
        return g.groupby("pred_lang", as_index=False).size().rename(columns={"size": "n_docs"})

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir).map_batches(ident, batch_format="pandas")
    df = (
        partials.groupby("pred_lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort("pred_lang")
        .to_pandas()
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

    return _docs(sf_dir).map_batches(fp, batch_format="pandas").sort("doc_id")
