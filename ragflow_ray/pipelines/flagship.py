"""Flagship end-to-end pipeline + adapters for the driver testdata.

``flagship_pipeline`` — generate/load the interleaved corpus, run every
template chunker through the actor-pool extraction stage, return the
output-span Dataset.

``corpus_from_documents_table`` — adapt the driver's TPC-H-ish
``documents.parquet`` (doc_id:int64, text, lang, source, n_chars) into
interleaved corpus rows deterministically, so extraction operators can
run (and be oracled) over the shared testdata.
"""

from __future__ import annotations

import pyarrow as pa

from ..chunkers import ChunkConfig
from ..stages.extract import extract_dataset


def corpus_from_documents_table(batch: pa.Table) -> pa.Table:
    """documents.parquet rows → interleaved span rows (txt family).

    Each document's text becomes one text span; deterministic, no
    randomness — the oracle can reconstruct the same input from SQL.
    """
    from ..sources.corpus import INPUT_SCHEMA

    rows = []
    for r in batch.to_pylist():
        rows.append(
            {
                "doc_id": str(r["doc_id"]),
                "fmt": "txt",
                "template": "naive",
                "spans": [
                    {"kind": "text", "text": r["text"], "media_ref": "", "offset": 0}
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def flagship_pipeline(
    n_docs: int = 500,
    seed: int = 42,
    concurrency=None,
    batch_size: int = 64,
    heavy_tail: float = 0.0,
    cfg: ChunkConfig | None = None,
):
    """Synthesize the interleaved corpus and extract it.

    Returns the lazy output Dataset (doc_id, template, n_spans,
    n_chars, spans).
    """
    import ray.data as rd

    from ..sources.corpus import FAMILIES, corpus_table, generate_corpus

    docs = generate_corpus(n_docs, seed=seed, heavy_tail=heavy_tail)
    ds = rd.from_arrow(corpus_table(docs))
    return extract_dataset(
        ds,
        template=None,
        cfg=cfg,
        concurrency=concurrency,
        batch_size=batch_size,
        split_heavy=heavy_tail > 0,
    )
