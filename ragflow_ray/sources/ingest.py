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
(``parsers/officebytes.py``) into the docx/excel payload forms;
legacy binary .doc ingests through the from-scratch OLE2 + piece-table
extractor (``parsers/olebytes.py``) as newline-sectioned plain text
(reference semantics: Tika text split on "\\n", rag/app/naive.py:534-545).
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


def _row_of_file(path: str, blob: bytes) -> dict:
    from ..parsers.pdfbytes import pdf_to_page_payloads

    doc_id = os.path.basename(path)
    low = path.lower()
    if low.endswith(".pdf"):
        spans = pdf_to_page_payloads(doc_id, blob)
        return {
            "doc_id": doc_id,
            "fmt": "pdf",
            "template": "naive",
            "n_media": len(spans),
            "spans": spans,
        }
    if low.endswith((".docx", ".xlsx", ".pptx")):
        from ..parsers.officebytes import (
            docx_to_spans,
            pptx_to_slide_spans,
            xlsx_to_sheets_span,
        )

        if low.endswith(".docx"):
            spans, fmt, template = docx_to_spans(blob, doc_id), "docx", "naive"
        elif low.endswith(".xlsx"):
            spans, fmt, template = xlsx_to_sheets_span(blob), "excel", "naive"
        else:
            spans, fmt, template = (
                pptx_to_slide_spans(blob, doc_id), "ppt", "presentation"
            )
        return {
            "doc_id": doc_id,
            "fmt": fmt,
            "template": template,
            # corpus convention (corpus.py): n_media counts the
            # text-bearing media spans — pptx slides are media spans,
            # so a big deck routes through the heavy page-split path
            "n_media": sum(
                1 for s in spans if s["kind"] == "media" and s["text"]
            ),
            "spans": spans,
        }
    if low.endswith(".xls"):
        from ..parsers.olebytes import xls_to_sheets_span

        return {
            "doc_id": doc_id,
            "fmt": "excel",
            "template": "naive",
            "n_media": 0,
            "spans": xls_to_sheets_span(blob),
        }
    if low.endswith(".doc"):
        from ..parsers.olebytes import doc_to_text

        return {
            "doc_id": doc_id,
            "fmt": "doc",
            "template": "naive",
            "n_media": 0,
            "spans": [
                {
                    "kind": "text",
                    "text": doc_to_text(blob),
                    "media_ref": "",
                    "offset": 0,
                }
            ],
        }
    fmt = fmt_of(path)
    if fmt == "email":
        # raw bytes must survive losslessly for the eml parser:
        # latin-1 decode is a byte-identity round-trip
        text = blob.decode("latin-1")
        template = "email"
    else:
        text = get_text(blob)
        template = "naive"
    return {
        "doc_id": doc_id,
        "fmt": fmt,
        "template": template,
        "n_media": 0,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


def rows_from_files(batch: pa.Table) -> pa.Table:
    """``read_binary_files(include_paths=True)`` batch → corpus rows.

    Per-file error containment: one corrupt .docx/.xlsx/.pdf must not
    abort the job (the reference skips unparseable files,
    rag/svr/task_executor.py) — a file whose parse raises degrades to
    an empty-span row with ``fmt="error"`` and the failure is logged.
    """
    import logging

    rows = []
    for path, blob in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        try:
            rows.append(_row_of_file(path, bytes(blob)))
        except Exception as exc:  # noqa: BLE001 — containment boundary
            logging.getLogger("ragflow_ray.ingest").warning(
                "skipping unparseable file %s: %s: %s",
                path, type(exc).__name__, exc,
            )
            rows.append(
                {
                    "doc_id": os.path.basename(path),
                    "fmt": "error",
                    "template": "naive",
                    "n_media": 0,
                    "spans": [],
                }
            )
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def read_text_files(paths: str | list[str]):
    """→ Dataset[INPUT_SCHEMA] over raw text-family files (codec
    sniffed per file, streamed — no driver-side reads)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(rows_from_files, batch_format="pyarrow")
