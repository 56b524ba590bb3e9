"""Retrieval-field enrichment: spans → doc-store chunk rows.

The reference wraps every chunk into a doc-store record with trie
tokenized retrieval fields (``tokenize``, rag/nlp/__init__.py:260-264:
``content_with_weight`` = raw text, ``content_ltks`` =
``rag_tokenizer.tokenize`` of the text with table markup stripped,
``content_sm_ltks`` = ``fine_grained_tokenize`` of that) and a
deterministic id ``xxhash64(content + doc_id)``
(rag/svr/task_executor.py:287) that makes the bulk upsert idempotent.

Here that wrap is a Ray Data stage over the extraction output:

* the tokenizer dictionary is user data, broadcast ONCE (``ray.put``)
  and materialized into a trie per ACTOR (not per batch) — the same
  per-process singleton contract as the reference's module-level
  tokenizer;
* each document row's span list flattens into one chunk row per text
  span (media spans keep their ref, no tokenization — the reference
  routes images through MinIO, not the text fields);
* the id hash is md5 (xxhash package absent offline; same role —
  deterministic content+doc addressing, collision-irrelevant width).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# rag/nlp/__init__.py:262 — strip table markup before tokenizing
_TABLE_TAG = re.compile(r"</?(table|td|caption|tr|th)( [^<>]{0,12})?>")

CHUNK_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("order", pa.int32()),
        ("kind", pa.string()),
        ("content_with_weight", pa.string()),
        ("content_ltks", pa.string()),
        ("content_sm_ltks", pa.string()),
        ("media_ref", pa.string()),
    ]
)


def chunk_id(text: str, doc_id: str) -> str:
    """Deterministic chunk id: hash(content + doc_id), the reference's
    idempotent-upsert key (task_executor.py:287)."""
    return hashlib.md5((text + doc_id).encode("utf-8", "surrogatepass")).hexdigest()


class TokenizeChunksStage:
    """Actor-pool stage: extraction rows (doc_id, spans) → chunk rows.

    ``dict_ref``: a ``ray.put`` handle to dictionary lines (broadcast
    once, fetched zero-copy per actor); ``dict_lines``: inline lines
    for task-pool / test use.  With neither, the trie is empty — CJK
    falls back to per-character tokens and latin is stemmed, exactly
    the reference with an unloaded dictionary.
    """

    def __init__(self, dict_ref=None, dict_lines=None):
        from ..text.ragtok import RagTok

        if dict_ref is not None:
            import ray

            dict_lines = ray.get(dict_ref)
        self._tok = RagTok(dict_lines)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.to_pylist():
            doc_id = doc["doc_id"]
            for span in doc["spans"]:
                text = span["text"] or ""
                # every text-bearing span kind (text/qa/table/tag/title/
                # abstract/row/slide/...) tokenizes; a media span carries
                # its ref untokenized (the reference routes images
                # through storage, not the text fields)
                if span["kind"] == "media":
                    rows.append(
                        {
                            "chunk_id": chunk_id(span["media_ref"] or "", doc_id),
                            "doc_id": doc_id,
                            "order": span["order"],
                            "kind": span["kind"],
                            "content_with_weight": text,
                            "content_ltks": "",
                            "content_sm_ltks": "",
                            "media_ref": span["media_ref"] or "",
                        }
                    )
                    continue
                if not text.strip():
                    # reference skips empty chunks (tokenize_chunks :271)
                    continue
                stripped = _TABLE_TAG.sub(" ", text)
                ltks = self._tok.tokenize(stripped)
                rows.append(
                    {
                        "chunk_id": chunk_id(text, doc_id),
                        "doc_id": doc_id,
                        "order": span["order"],
                        "kind": span["kind"],
                        "content_with_weight": text,
                        "content_ltks": ltks,
                        "content_sm_ltks": self._tok.fine_grained_tokenize(ltks),
                        "media_ref": span["media_ref"] or "",
                    }
                )
        return pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)


def enrich_chunks(
    ds,
    dict_lines: list[str] | None = None,
    concurrency=(1, 8),
    batch_size: int = 32,
):
    """Wire the enrichment actor pool onto an extraction-output Dataset.

    The dictionary ships to the cluster exactly once (``ray.put``);
    every actor builds its trie from the shared object — never
    re-serialized per batch.
    """
    import ray

    dict_ref = ray.put(dict_lines or [])
    return ds.map_batches(
        TokenizeChunksStage,
        fn_constructor_kwargs={"dict_ref": dict_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
