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
                "n_media": 0,
                "spans": [
                    {"kind": "text", "text": r["text"], "media_ref": "", "offset": 0}
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def corpus_dataset(
    n_docs: int,
    seed: int = 42,
    heavy_tail: float = 0.0,
    blocks: int | None = None,
):
    """Distributed corpus synthesis: ``range(n)`` fanned out over
    blocks, each worker generating its own (deterministically seeded)
    documents — no driver-side materialization."""
    import zlib

    import ray.data as rd

    from ..sources.corpus import FAMILIES, corpus_table, generate_document

    n_blocks = blocks or max(8, n_docs // 64)
    ds = rd.range(n_docs, override_num_blocks=n_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        docs = []
        for i in batch["id"].to_pylist():
            i = int(i)
            heavy = heavy_tail > 0 and (
                zlib.crc32(f"heavy:{seed}:{i}".encode()) % 10_000
            ) < heavy_tail * 10_000
            docs.append(
                generate_document(FAMILIES[i % len(FAMILIES)], i, seed, heavy=heavy)
            )
        return corpus_table(docs)

    return ds.map_batches(gen, batch_format="pyarrow")


def flagship_pipeline(
    n_docs: int = 500,
    seed: int = 42,
    concurrency=None,
    batch_size: int = 64,
    heavy_tail: float = 0.0,
    cfg: ChunkConfig | None = None,
):
    """Synthesize the interleaved corpus (distributed) and extract it.

    Returns the lazy output Dataset (doc_id, template, n_spans,
    n_chars, error, spans).
    """
    ds = corpus_dataset(n_docs, seed=seed, heavy_tail=heavy_tail)
    return extract_dataset(
        ds,
        template=None,
        cfg=cfg,
        concurrency=concurrency,
        batch_size=batch_size,
        split_heavy=heavy_tail > 0,
    )
