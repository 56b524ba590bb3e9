"""Ray Data extraction stages.

The engine's physical plan (SURVEY.md §7):

    read_parquet(corpus)                      # pruned to needed columns
      → [split_heavy_docs]                    # explode big PDFs into page-range parts (skew salting)
      → map_batches(ExtractStage, ...)        # actor pool: template chunkers over Arrow batches
      → [reassemble_parts]                    # groupby(doc_id) — only needed when docs were split
      → write_parquet(out)                    # partitioned output

``ExtractStage`` is a callable class (actor pool) because chunkers
amortize compiled regexes / config across batches, and it is the slot
where real OCR/layout ONNX sessions would be loaded once per actor
(reference: per-process model cache, deepdoc/vision/ocr.py:35,70-127).

Batches are Arrow (``batch_format="pyarrow"``); the per-document inner
logic is sequential by the reference's semantics, so parallelism comes
from documents-per-batch × actor pool width.

On the Arrow→``to_pylist``→Arrow roundtrip in ``ExtractStage``: measured
on a 512-doc corpus batch, ``to_pylist`` + ``from_pylist`` together are
~3 % of ``__call__`` wall time — ``chunk_document`` (the reference's
sequential per-doc chunking semantics) is the other ~97 %, itself
dominated by the layout-assignment geometry and token counting.  An
Arrow-native span fast path would therefore be inside measurement noise
on the headline bench; keeping the uniform pylist path keeps every
chunker on one code shape.
"""

from __future__ import annotations

import pyarrow as pa

from ..chunkers import ChunkConfig, chunk_document
from ..sources.corpus import OUTPUT_SCHEMA, OUT_SPAN_TYPE

# page-range shard size for heavy documents; mirrors the reference's
# 12-pages-per-task planning (api/db/services/task_service.py:343-349)
HEAVY_PAGE_THRESHOLD = 24
PAGES_PER_PART = 12

PART_OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("template", pa.string()),
        ("part_id", pa.int32()),
        ("n_parts", pa.int32()),
        ("n_spans", pa.int32()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
        ("spans", pa.list_(OUT_SPAN_TYPE)),
    ]
)


class ExtractStage:
    """Actor-pool stage: input doc rows → output span rows.

    Per-document fault isolation: a document that fails to parse
    (malformed payload, unknown template, pathological content) emits
    an error row (``error`` set, zero spans) instead of aborting the
    dataset — one bad record must not poison a corpus-scale run.
    Set ``on_error="raise"`` to surface failures in tests.
    """

    def __init__(self, template: str | None = None, cfg: ChunkConfig | None = None,
                 with_parts: bool = False, on_error: str = "record"):
        self.template = template
        self.cfg = cfg or ChunkConfig()
        self.with_parts = with_parts
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.to_pylist():
            template = self.template or doc.get("template") or "naive"
            try:
                spans = chunk_document(doc, template, self.cfg)
                error = ""
            except Exception as exc:  # noqa: BLE001 — per-doc isolation
                if self.on_error == "raise":
                    raise
                spans = []
                error = f"{type(exc).__name__}: {exc}"[:500]
            row = {
                "doc_id": doc["doc_id"],
                "template": template,
                "n_spans": len(spans),
                "n_chars": sum(len(s["text"]) for s in spans),
                "error": error,
                "spans": spans,
            }
            if self.with_parts:
                row["part_id"] = doc.get("part_id", 0)
                row["n_parts"] = doc.get("n_parts", 1)
            rows.append(row)
        schema = PART_OUTPUT_SCHEMA if self.with_parts else OUTPUT_SCHEMA
        return pa.Table.from_pylist(rows, schema=schema)


def split_heavy_docs(batch: pa.Table) -> pa.Table:
    """Explode documents with many pages into page-range part rows.

    Adds ``part_id``/``n_parts``; light docs pass through as a single
    part.  This is the skew-salting step: a 1000-page PDF becomes ~84
    independent rows spread across blocks instead of one straggler.
    Page-range boundaries match the reference's task sharding
    (task_service.py:343-358), where cross-shard merges don't happen
    either.
    """
    rows = []
    for doc in batch.to_pylist():
        spans = doc["spans"]
        media = [s for s in spans if s["kind"] == "media" and s["text"]]
        if len(media) <= HEAVY_PAGE_THRESHOLD:
            doc["part_id"] = 0
            doc["n_parts"] = 1
            rows.append(doc)
            continue
        n_parts = (len(media) + PAGES_PER_PART - 1) // PAGES_PER_PART
        for p in range(n_parts):
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "fmt": doc["fmt"],
                    "template": doc["template"],
                    "spans": media[p * PAGES_PER_PART : (p + 1) * PAGES_PER_PART],
                    "part_id": p,
                    "n_parts": n_parts,
                }
            )
    return pa.Table.from_pylist(rows)


def reassemble_parts(group: pa.Table) -> pa.Table:
    """``groupby(doc_id).map_groups`` body: concatenate a split
    document's per-part span sequences in part order and renumber
    ``order`` (Arrow in / Arrow out)."""
    if group.num_rows == 1:
        return group.select(["doc_id", "template", "n_spans", "n_chars", "error", "spans"])
    group = group.sort_by("part_id")
    rows = group.to_pylist()
    spans: list[dict] = []
    for row in rows:
        for s in row["spans"]:
            s = dict(s)
            s["order"] = len(spans)
            spans.append(s)
    return pa.Table.from_pylist(
        [
            {
                "doc_id": rows[0]["doc_id"],
                "template": rows[0]["template"],
                "n_spans": len(spans),
                "n_chars": sum(len(s["text"]) for s in spans),
                "error": "; ".join(sorted({r["error"] for r in rows if r["error"]})),
                "spans": spans,
            }
        ],
        schema=OUTPUT_SCHEMA,
    )


def extract_dataset(
    ds,
    template: str | None = None,
    cfg: ChunkConfig | None = None,
    concurrency=None,
    batch_size: int = 64,
    split_heavy: bool = False,
):
    """Wire the extraction stages onto a Dataset of corpus rows.

    ``concurrency``: None → stateless task pool; an int or (min, max)
    tuple → actor pool (the class is instantiated once per actor).
    """

    def _stage(with_parts: bool) -> dict:
        kwargs = {"template": template, "cfg": cfg, "with_parts": with_parts}
        if concurrency is None:
            return {"fn": ExtractStage(**kwargs)}
        return {
            "fn": ExtractStage,
            "fn_constructor_kwargs": kwargs,
            "concurrency": concurrency,
        }

    if not split_heavy:
        s = _stage(False)
        return ds.map_batches(
            s.pop("fn"), batch_format="pyarrow", batch_size=batch_size, **s
        )
    ds = ds.map_batches(split_heavy_docs, batch_format="pyarrow", batch_size=batch_size)
    s = _stage(True)
    out = ds.map_batches(
        s.pop("fn"), batch_format="pyarrow", batch_size=batch_size, **s
    )
    return out.groupby("doc_id").map_groups(reassemble_parts, batch_format="pyarrow")


def extract_parquet(
    corpus_dir: str,
    template: str | None = None,
    cfg: ChunkConfig | None = None,
    concurrency=None,
    batch_size: int = 16,
):
    """Dual-path extraction from an on-disk corpus.

    The reassembly ``groupby(doc_id)`` is an all-to-all exchange; at
    corpus scale it must only touch the ~1% of documents that are big
    enough to split:

    * light docs  (n_media <= threshold) → extract, NO shuffle;
    * heavy docs  (n_media  > threshold) → page-range split → extract
      → per-doc reassembly groupby over that small subset only;
    * the two branches union (no barrier).

    Routing prefers a corpus partitioned by cost class at ingest
    (``{corpus}/light/``, ``{corpus}/heavy/`` — each branch reads only
    its own files, real IO pruning).  An unpartitioned corpus falls
    back to ``n_media`` read filters, which keep the semantics but
    decode every row group that mixes cost classes — at 100 TB,
    partition at ingest.
    """
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    light_dir = os.path.join(corpus_dir, "light")
    heavy_dir = os.path.join(corpus_dir, "heavy")
    if os.path.isdir(light_dir):
        light = rd.read_parquet(light_dir)
        has_heavy = os.path.isdir(heavy_dir) and any(
            f.endswith(".parquet") for f in os.listdir(heavy_dir)
        )
        heavy = rd.read_parquet(heavy_dir) if has_heavy else None
    else:
        light = rd.read_parquet(
            corpus_dir, filter=(pc.field("n_media") <= HEAVY_PAGE_THRESHOLD)
        )
        heavy = rd.read_parquet(
            corpus_dir, filter=(pc.field("n_media") > HEAVY_PAGE_THRESHOLD)
        )

    light_out = extract_dataset(
        light, template, cfg, concurrency=concurrency,
        batch_size=batch_size, split_heavy=False,
    )
    if heavy is None:
        return light_out
    heavy_out = extract_dataset(
        heavy, template, cfg, concurrency=concurrency,
        batch_size=max(2, batch_size // 4), split_heavy=True,
    )
    return light_out.union(heavy_out)
