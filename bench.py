#!/usr/bin/env python
"""Benchmark harness for the ragflow_ray engine.

Prints ONE JSON line:
    {"metric": "extract_sec", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ...}

Headline = flagship extraction (synthetic interleaved corpus sized to
the sf, every template, heavy-tail skew handled by page-range
splitting).  ``--scaling`` reruns the headline in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at
both plus the scaling efficiency.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# synthetic corpus size scales with the sf documents table
_SF_TO_DOCS = {"sf0.001": 250, "sf0.01": 1200, "sf0.1": 4000}


def _corpus_docs() -> int:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return _SF_TO_DOCS.get(tag, 1200)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ragflow_ray.pipelines import flagship_pipeline

    n_docs = _corpus_docs()
    # warm-up: small untimed run so module imports / page cache are warm
    flagship_pipeline(n_docs=min(90, n_docs), batch_size=32,
                      concurrency=max(2, NUM_CPUS // 4)).count()

    start = time.time()
    out = flagship_pipeline(
        n_docs=n_docs,
        batch_size=32,
        heavy_tail=0.01,
        concurrency=max(2, NUM_CPUS - 2),
    )
    total = out.count()
    extract_sec = time.time() - start
    log(f"extract: {n_docs} docs -> {total} rows in {extract_sec:.2f}s "
        f"({n_docs / extract_sec:.1f} docs/s)")

    queries = {}
    from ragflow_ray.ops import ann, dedup, relational, textstats
    from ragflow_ray.ops.extract_queries import html_extract_roundtrip

    bench_queries = {
        "token_stats": textstats.token_stats,
        "fingerprints": lambda d: textstats.fingerprints(d).to_pandas(),
        "exact_dedup": dedup.exact_dedup,
        "minhash_near_dups": lambda d: dedup.minhash_near_dups(
            d, concurrency=max(2, NUM_CPUS - 2)).count(),
        "simhash_near_dups": lambda d: dedup.simhash_near_dups(
            d, concurrency=max(2, NUM_CPUS - 2)).count(),
        "ann_topk": lambda d: ann.brute_force_topk(
            d, concurrency=max(2, NUM_CPUS - 2)),
        "pricing_summary": relational.pricing_summary,
        "user_sessions": relational.user_sessions,
        "html_extract_roundtrip": lambda d: html_extract_roundtrip(d).count(),
    }
    for name, fn in bench_queries.items():
        t0 = time.time()
        try:
            fn(SF_DIR)
            queries[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            log(f"query {name} failed: {exc}")
            queries[name] = -1.0
        log(f"query {name}: {queries[name]}s")

    ray.shutdown()
    return {
        "metric": "extract_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "corpus_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 2),
    }


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    tput_lo = r_lo["docs_per_sec"]
    tput_hi = r_hi["docs_per_sec"]
    eff = tput_hi / (tput_lo * (hi / lo))
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": tput_lo,
        "docs_per_sec_hi": tput_hi,
        "sf": r_lo["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
