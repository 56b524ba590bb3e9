"""Checkpoint manifest: resumable, idempotent partitioned extraction.

Ray Data has no native resume; the engine keys completed work on
``(partition_id, config_digest)`` exactly like the reference's task
digest + chunk reuse (api/db/services/task_service.py:373-386,
412-457):

* one input Parquet file (shard) = one partition;
* each partition's output is written atomically (temp dir → rename)
  under ``out_dir/part-{id:05d}/``;
* a JSONL manifest records per-partition lineage + metrics
  (input file, digest, row/span counts, wall time);
* on rerun, partitions whose manifest row matches the current digest
  are skipped; a changed config (different digest) recomputes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


def config_digest(template: str | None, cfg) -> str:
    payload = {"template": template, "cfg": sorted(vars(cfg).items()) if cfg else None}
    return hashlib.sha256(json.dumps(payload, default=str).encode()).hexdigest()[:16]


@dataclass
class PartitionRecord:
    partition_id: int
    input_file: str
    digest: str
    status: str = "pending"
    n_docs: int = 0
    n_spans: int = 0
    n_errors: int = 0
    wall_sec: float = 0.0
    finished_at: float = 0.0


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if not os.path.exists(self.path):
            return done
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done[rec["partition_id"]] = rec
        return done

    def append(self, rec: PartitionRecord) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")


def run_partitioned_extract(
    corpus_dir: str,
    out_dir: str,
    template: str | None = None,
    cfg=None,
    concurrency=None,
    batch_size: int = 64,
    split_heavy: bool = True,
    max_partitions: int = 64,
) -> dict:
    """Extract every input shard, skipping partitions already completed
    with the same config digest.  Returns summary metrics.

    Input files bundle into at most ``max_partitions`` partitions —
    the resume/checkpoint granularity.  Each partition is one
    streaming Dataset execution; per-execution fixed costs make
    thousands of single-file partitions pathological (measured: 889
    file-partitions ran 35× slower than the same corpus in bundles).
    """
    import ray.data as rd

    from ..chunkers import ChunkConfig
    from ..stages.extract import extract_dataset

    cfg = cfg or ChunkConfig()
    digest = config_digest(template, cfg)
    manifest = Manifest(out_dir)
    done = manifest.completed()

    def _list(d: str) -> list[str]:
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )

    def _bundle(paths: list[str], flag: bool, budget: int) -> list[tuple[list[str], bool]]:
        if not paths:
            return []
        n_bundles = max(1, min(budget, len(paths)))
        size = (len(paths) + n_bundles - 1) // n_bundles
        return [(paths[i : i + size], flag) for i in range(0, len(paths), size)]

    # cost-partitioned corpus (light/ + heavy/) or flat directory
    light_files = _list(os.path.join(corpus_dir, "light"))
    if light_files:
        heavy_files = _list(os.path.join(corpus_dir, "heavy"))
        heavy_budget = max(1, max_partitions // 8) if heavy_files else 0
        partitions = _bundle(light_files, False, max_partitions - heavy_budget)
        partitions += _bundle(heavy_files, True, heavy_budget)
    else:
        partitions = _bundle(_list(corpus_dir), split_heavy, max_partitions)

    total_docs = total_spans = total_errors = 0
    skipped = 0
    for pid, (paths, part_split_heavy) in enumerate(partitions):
        prior = done.get(pid)
        if prior and prior["digest"] == digest:
            skipped += 1
            total_docs += prior["n_docs"]
            total_spans += prior["n_spans"]
            total_errors += prior.get("n_errors", 0)
            continue
        start = time.time()
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)

        ds = rd.read_parquet(paths)
        out = extract_dataset(
            ds, template, cfg, concurrency=concurrency,
            batch_size=batch_size, split_heavy=part_split_heavy,
        )
        out.write_parquet(tmp_dir)
        os.replace(tmp_dir, part_dir)

        import pyarrow.dataset as pads
        import pyarrow.compute as pc

        stats = pads.dataset(part_dir).to_table(columns=["n_spans", "error"])
        n_docs = stats.num_rows
        n_spans = int(sum(x.as_py() or 0 for x in stats.column("n_spans")))
        n_errors = int(
            pc.sum(pc.cast(pc.not_equal(stats.column("error"), ""), "int64")).as_py()
            or 0
        )
        total_docs += n_docs
        total_spans += n_spans
        total_errors += n_errors
        manifest.append(
            PartitionRecord(
                partition_id=pid,
                input_file=f"{paths[0]}(+{len(paths) - 1})" if len(paths) > 1 else paths[0],
                digest=digest,
                status="done",
                n_docs=n_docs,
                n_spans=n_spans,
                n_errors=n_errors,
                wall_sec=time.time() - start,
                finished_at=time.time(),
            )
        )
    return {
        "partitions": len(partitions),
        "skipped": skipped,
        "docs": total_docs,
        "spans": total_spans,
        "errors": total_errors,
        "digest": digest,
    }
