"""Raw-file ingestion: bytes on disk → interleaved corpus rows.

The reference reads raw uploaded files and sniffs their charset before
parsing (``get_text`` → ``find_codec``, /root/reference/rag/nlp/
__init__.py:53-71, deepdoc/parser/utils.py); this module is the Ray
Data analogue: ``read_binary_files`` → per-batch codec sniff + decode →
INPUT_SCHEMA rows the extraction pipeline consumes directly.

Text-family formats (txt/html/markdown/json/csv/eml) ingest for real;
.pdf ingests through the from-scratch text-layer extractor
(``parsers/pdfbytes.py``) into the ``layout_mode="plain"`` path;
.docx/.xlsx ingest through the stdlib OOXML extractor
(``parsers/officebytes.py``) into the docx/excel payload forms.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..text.normalize import get_text
from .corpus import INPUT_SCHEMA

_EXT_FMT = {
    ".txt": "txt",
    ".text": "txt",
    ".log": "txt",
    ".csv": "txt",
    ".tsv": "txt",
    ".html": "html",
    ".htm": "html",
    ".md": "markdown",
    ".markdown": "markdown",
    ".json": "json",
    ".py": "txt",
    ".c": "txt",
    ".java": "txt",
    ".eml": "email",
}


def fmt_of(path: str) -> str:
    return _EXT_FMT.get(os.path.splitext(path)[1].lower(), "txt")


def rows_from_files(batch: pa.Table) -> pa.Table:
    """``read_binary_files(include_paths=True)`` batch → corpus rows."""
    from ..parsers.pdfbytes import pdf_to_page_payloads

    rows = []
    for path, blob in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        doc_id = os.path.basename(path)
        low = path.lower()
        if low.endswith(".pdf"):
            spans = pdf_to_page_payloads(doc_id, bytes(blob))
            rows.append(
                {
                    "doc_id": doc_id,
                    "fmt": "pdf",
                    "template": "naive",
                    "n_media": len(spans),
                    "spans": spans,
                }
            )
            continue
        if low.endswith(".docx") or low.endswith(".xlsx"):
            from ..parsers.officebytes import docx_to_spans, xlsx_to_sheets_span

            if low.endswith(".docx"):
                spans, fmt = docx_to_spans(bytes(blob)), "docx"
            else:
                spans, fmt = xlsx_to_sheets_span(bytes(blob)), "excel"
            rows.append(
                {
                    "doc_id": doc_id,
                    "fmt": fmt,
                    "template": "naive",
                    "n_media": 0,
                    "spans": spans,
                }
            )
            continue
        fmt = fmt_of(path)
        if fmt == "email":
            # raw bytes must survive losslessly for the eml parser:
            # latin-1 decode is a byte-identity round-trip
            text = bytes(blob).decode("latin-1")
            template = "email"
        else:
            text = get_text(bytes(blob))
            template = "naive"
        rows.append(
            {
                "doc_id": doc_id,
                "fmt": fmt,
                "template": template,
                "n_media": 0,
                "spans": [
                    {"kind": "text", "text": text, "media_ref": "", "offset": 0}
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def read_text_files(paths: str | list[str]):
    """→ Dataset[INPUT_SCHEMA] over raw text-family files (codec
    sniffed per file, streamed — no driver-side reads)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(rows_from_files, batch_format="pyarrow")
