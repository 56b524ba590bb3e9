"""Extraction operators exposed as sf_dir queries.

Two kinds:

* **roundtrip queries** — build a deterministic document (HTML page /
  txt stream) from each ``documents.text`` row inside the pipeline,
  extract it back, and return text that DuckDB can recompute exactly:
  the boilerplate-strip and chunker logic is verified end-to-end by
  the value-hash compare.
* **corpus queries** — run each template chunker over the synthetic
  interleaved corpus (sized to the sf documents table); non-SQL
  semantics → rows-only driver check, exactness covered by pytest
  goldens.
"""

from __future__ import annotations

import pandas as pd

from ..chunkers import ChunkConfig, chunk_document
from ..parsers.html import extract_main_text
from ..stages.extract import ExtractStage


def _docs(sf_dir: str):
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


TXT_DELIMS = "\n!?;。；！？"


def txt_chunk_roundtrip(sf_dir: str):
    """naive/txt chunking; concatenated chunks == text minus the
    delimiter characters (SQL-recomputable)."""

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        cfg = ChunkConfig(chunk_token_num=64, delimiter=TXT_DELIMS)
        outs = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            doc = {
                "doc_id": str(doc_id),
                "fmt": "txt",
                "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            }
            spans = chunk_document(doc, "naive", cfg)
            outs.append("".join(s["text"] for s in spans))
        return pd.DataFrame({"doc_id": batch["doc_id"], "extracted": outs})

    return _docs(sf_dir).map_batches(run, batch_format="pandas").sort("doc_id")


def _wrap_html(doc_id, text: str) -> str:
    """Deterministic boilerplate-laden page around the document text
    (12-word paragraphs inside <article>, link-dense nav/footer)."""
    words = text.split(" ")
    paras = [" ".join(words[i : i + 12]) for i in range(0, len(words), 12)]
    nav = "".join(f'<a href="/l{i}">nav link {i}</a> ' for i in range(8))
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f'<nav class="menu">{nav}</nav>'
        f"<article>{body}</article>"
        f'<footer class="footer">{nav}</footer></body></html>'
    )


def html_extract_roundtrip(sf_dir: str):
    """Wrap each doc's text in boilerplate HTML → readability-style
    extraction must return exactly the original text (nav/footer
    stripped, paragraphs re-joined)."""

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            html = _wrap_html(doc_id, text)
            _title, content = extract_main_text(html)
            outs.append(" ".join(content.split("\n")))
        return pd.DataFrame({"doc_id": batch["doc_id"], "extracted": outs})

    return _docs(sf_dir).map_batches(run, batch_format="pandas").sort("doc_id")


def pdf_text_blocks(sf_dir: str):
    """The generic ``RAGFlowPdfParser.__call__`` path
    (pdf_parser.py:1131-1140): layout → tables → horizontal merge →
    Y-sort → TOC drop → table extraction → reading-order DFS block
    assembly.  Returns per-doc block text stats (rows-only check;
    exactness covered by pytest)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    from ..chunkers.common import build_doc_boxes
    from ..sources.corpus import corpus_table, generate_corpus

    n = max(36, _sf_doc_count(sf_dir) // 10)
    docs = [d for d in generate_corpus(n) if d["fmt"] == "pdf"]
    ds = rd.from_arrow(corpus_table(docs))

    def run(batch):
        import pyarrow as pa

        rows = []
        for doc in batch.to_pylist():
            boxes = build_doc_boxes(doc, drop=True)
            boxes.run_table_structure()
            boxes.merge_horizontal()
            boxes.sort_reading_order()
            boxes.drop_toc_pages()
            boxes.extract_tables_figures(need_figures=True, return_html=True)
            text = boxes.assemble_text_blocks()
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "n_blocks": len([b for b in text.split("\n\n") if b]),
                    "n_chars": len(text),
                }
            )
        return pa.Table.from_pylist(rows)

    df = ds.map_batches(run, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def _sf_doc_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def corpus_extract(sf_dir: str, template: str | None = None):
    """Template chunkers over the synthetic interleaved corpus (sized
    to the sf), per-doc span stats (rows-only driver check)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    from ..sources.corpus import corpus_table, generate_corpus

    n = max(36, _sf_doc_count(sf_dir) // 5)
    docs = generate_corpus(n)
    if template:
        docs = [d for d in docs if d["template"] == template] or docs
    ds = rd.from_arrow(corpus_table(docs))
    out = ds.map_batches(
        ExtractStage(template, ChunkConfig(), on_error="raise"),
        batch_format="pyarrow",
        batch_size=32,
    )
    df = out.to_pandas()[["doc_id", "template", "n_spans", "n_chars"]]
    df["n_spans"] = df["n_spans"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)
