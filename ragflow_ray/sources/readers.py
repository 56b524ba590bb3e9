"""Shared parquet readers.

The shared testdata parquet files carry pandas schema metadata, and a
``pyarrow.Schema`` with metadata is unhashable (the metadata dict),
which defeats Ray Data's block-schema deduplication at every shuffle
(``transform_pyarrow.unify_schemas`` logs ``Failed to hash the
schemas`` per reduce task and re-unifies from scratch).  Stripping the
metadata right after the read is metadata-only (zero-copy) and makes
every downstream block schema identical and hashable.
"""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with schema metadata stripped.

    The clean schema is also passed INTO the read so the fragment
    schemas the read task unifies internally are already
    metadata-free (otherwise the read op itself logs the hash
    failure before any downstream stage can strip)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    if "schema" not in kwargs:
        try:
            schema = pads.dataset(path).schema.remove_metadata()
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            kwargs["schema"] = schema
        except Exception:  # noqa: BLE001 — schema probe is best-effort
            pass
    ds = rd.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")


def read_docs_split(sf_dir: str, columns: list[str] | None = None,
                    rows_per_block: int = 256):
    """documents.parquet reader for Python-heavy per-doc passes.

    The shared testdata writes the documents table as ONE row group,
    so a plain read yields one block and every downstream map_batches
    runs as a single task regardless of cluster size.  A streaming
    (no-shuffle) repartition to small row blocks restores task
    parallelism; on a real sharded corpus the reader already produces
    many blocks and the split is a near-no-op."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=columns or ["doc_id", "text"],
    )
    return ds.repartition(target_num_rows_per_block=rows_per_block)
