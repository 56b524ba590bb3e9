"""Job entrypoints: ``python -m ragflow_ray <command>``.

Designed as the ``ray job submit`` driver script
(``ray job submit --working-dir . -- python -m ragflow_ray extract ...``).
On a cluster, drop ``--address local``; in this sandbox everything
runs against a local session.

Commands:

    synth    write a deterministic interleaved corpus (cost-partitioned)
    extract  resumable partitioned extraction corpus → span parquet
    show     print a few extracted documents from an output partition
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """→ True when this call owned the ray.init (callers embedding the
    CLI in an existing session keep their session alive)."""
    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        owned = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def cmd_synth(args: argparse.Namespace) -> None:
    import os

    args._owned_ray = _init_ray(args.num_cpus)
    from .pipelines.flagship import corpus_dataset
    from .stages.extract import HEAVY_PAGE_THRESHOLD

    ds = corpus_dataset(args.n_docs, seed=args.seed, heavy_tail=args.heavy_tail)
    ds = ds.materialize()
    # coalesce output files (~2000 docs each): a corpus of thousands of
    # tiny files turns every downstream read into fixed-cost soup
    ds.filter(expr=f"n_media <= {HEAVY_PAGE_THRESHOLD}").write_parquet(
        os.path.join(args.out, "light"), min_rows_per_file=2000
    )
    ds.filter(expr=f"n_media > {HEAVY_PAGE_THRESHOLD}").write_parquet(
        os.path.join(args.out, "heavy"), min_rows_per_file=2000
    )
    print(json.dumps({"written": args.n_docs, "out": args.out}))


def cmd_ingest(args: argparse.Namespace) -> None:
    import os

    args._owned_ray = _init_ray(args.num_cpus)
    from .sources.ingest import read_text_files

    ds = read_text_files(args.src)
    # text-family files are all "light" (no media spans): one corpus
    # partition, resumable downstream like the synth output
    ds.write_parquet(os.path.join(args.out, "light"), min_rows_per_file=2000)
    print(json.dumps({"out": args.out}))


def cmd_extract(args: argparse.Namespace) -> None:
    args._owned_ray = _init_ray(args.num_cpus)
    from .chunkers import ChunkConfig
    from .state import run_partitioned_extract

    cfg = ChunkConfig(
        chunk_token_num=args.chunk_token_num,
        delimiter=args.delimiter,
        overlapped_percent=args.overlap,
        lang=args.lang,
        layout_mode=args.layout_mode,
    )
    summary = run_partitioned_extract(
        args.corpus,
        args.out,
        template=args.template,
        cfg=cfg,
        batch_size=args.batch_size,
        split_heavy=not args.no_split,
    )
    print(json.dumps(summary))


def cmd_enrich(args: argparse.Namespace) -> None:
    """Extracted span output → doc-store chunk rows
    (content_ltks / content_sm_ltks + deterministic chunk ids)."""
    args._owned_ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .stages.enrich import enrich_chunks

    dict_lines = None
    if args.dict:
        with open(args.dict, encoding="utf-8") as f:
            dict_lines = [ln.strip() for ln in f if ln.strip()]
    import os

    # a run_partitioned_extract dir holds part-*/ parquet plus a
    # manifest.jsonl sidecar — read only the parquet partitions
    parts = sorted(
        os.path.join(args.src, d)
        for d in os.listdir(args.src)
        if d.startswith("part-")
    ) if os.path.isdir(args.src) else []
    out = enrich_chunks(
        rd.read_parquet(parts or args.src),
        dict_lines=dict_lines,
        batch_size=args.batch_size,
    )
    out.write_parquet(args.out, min_rows_per_file=2000)
    print(json.dumps({"out": args.out, "dict_entries": len(dict_lines or [])}))


def cmd_show(args: argparse.Namespace) -> None:
    args._owned_ray = _init_ray(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.path)
    for row in ds.take(args.n):
        spans = row["spans"]
        print(f"== {row['doc_id']} [{row['template']}] {row['n_spans']} spans")
        for s in list(spans)[: args.spans]:
            text = s["text"][:100].replace("\n", "\\n")
            print(f"   {s['order']:>3} {s['kind']:<8} {s['media_ref'] or '-':<28} {text}")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="ragflow_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("synth", help="write a synthetic interleaved corpus")
    p.add_argument("out")
    p.add_argument("--n-docs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--heavy-tail", type=float, default=0.01)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("ingest", help="raw files → corpus parquet")
    p.add_argument("src", help="file or directory of txt/html/md/json/csv/"
                               "eml/pdf/docx/xlsx files")
    p.add_argument("out")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("extract", help="resumable partitioned extraction")
    p.add_argument("corpus")
    p.add_argument("out")
    p.add_argument("--template", default=None,
                   help="force one template (default: per-doc template column)")
    p.add_argument("--chunk-token-num", type=int, default=128)
    p.add_argument("--delimiter", default="\n!?。；！？")
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--lang", default="English")
    p.add_argument("--layout-mode", default="deepdoc", choices=["deepdoc", "plain"])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--no-split", action="store_true",
                   help="disable heavy-doc page-range splitting")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser(
        "enrich", help="extracted spans → doc-store chunk rows (content_ltks)"
    )
    p.add_argument("src", help="extracted output dir (spans parquet)")
    p.add_argument("out")
    p.add_argument("--dict", default=None,
                   help="tokenizer dictionary file ('word freq tag' lines)")
    p.add_argument("--batch-size", type=int, default=32)
    p.set_defaults(fn=cmd_enrich)

    p = sub.add_parser("show", help="inspect extracted output")
    p.add_argument("path")
    p.add_argument("-n", type=int, default=3)
    p.add_argument("--spans", type=int, default=8)
    p.set_defaults(fn=cmd_show)

    args = parser.parse_args(argv)
    args._owned_ray = False
    args.fn(args)

    if args._owned_ray:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
