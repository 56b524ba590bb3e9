"""Template-chunker registry.

The engine analogue of the reference's ``FACTORY`` dispatch table
(/root/reference/rag/svr/task_executor.py:70-87): template name →
chunker callable ``(doc, ChunkConfig) -> list[span dict]``.
"""

from __future__ import annotations

from .book import chunk_book
from .common import ChunkConfig
from .email import chunk_email
from .laws import chunk_laws
from .manual import chunk_manual
from .naive import chunk_naive
from .one import chunk_one
from .paper import chunk_paper
from .presentation import chunk_presentation
from .qa import chunk_qa
from .table import chunk_table
from .tag import chunk_tag

CHUNKERS = {
    "naive": chunk_naive,
    "book": chunk_book,
    "laws": chunk_laws,
    "paper": chunk_paper,
    "one": chunk_one,
    "qa": chunk_qa,
    "table": chunk_table,
    "manual": chunk_manual,
    "presentation": chunk_presentation,
    "email": chunk_email,
    "tag": chunk_tag,
    # reference FACTORY aliases (task_executor.py:70-87): "general" and
    # the knowledge-graph template both dispatch to the naive chunker
    "general": chunk_naive,
    "knowledge_graph": chunk_naive,
}


def chunk_document(doc: dict, template: str = "naive", cfg: ChunkConfig | None = None) -> list[dict]:
    """Run one template chunker over one document dict
    ``{doc_id, fmt, spans}`` → ordered output span dicts."""
    if template not in CHUNKERS:
        raise KeyError(f"unknown chunker template: {template!r}")
    return CHUNKERS[template](doc, cfg or ChunkConfig())
