"""Parallelism-invariance sweep (SURVEY §5.4, r3 verdict task 8).

Every driver query must produce an identical value digest regardless of
``num_cpus`` — the bug class behind the r3 ``dedup_incremental`` flake
(a partition-count-sensitive hash join) is exactly what this catches.

Fresh Ray sessions at different CPU counts can't share the test
suite's session-scoped cluster, so the sweep runs
``tools/parallelism_sweep.py`` in subprocesses, one CPU level after
the other (concurrent local clusters contend and run slower than
sequential ones on a single node).

The in-CI subset is the shuffle-heavy queries — everything with a
groupby/sort/union co-partition whose block layout changes with
parallelism.  The tool itself sweeps ALL queries when run by hand:
``python tools/parallelism_sweep.py 2`` vs ``... 32``.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "parallelism_sweep.py")

# the partition-layout-sensitive set: unions, coarse-bucket groupbys,
# hash aggregates, distributed top-k reduces.  dedup_clusters /
# ann_pq_topk / simhash are omitted for CI-time budget (each is a
# multi-round pipeline ~10-20 s even at sf0.001) — the hand-run full
# sweep covers them.
SWEEP = ",".join([
    "dedup_incremental",
    "exact_dedup",
    "token_set_dedup",
    "minhash_near_dups",
    "passage_dedup",
    "ann_topk",
    "hybrid_topk",
    "events_order_asof",
    "token_stats",
    "pack_sequences",
    "source_overlap_matrix",
    "user_funnel",
    "cohort_retention",
    "rolling_active_users",
    "event_spike_days",
    "top_docs_per_source",
    "ann_range_search",
    "shipping_priority",
    "length_rank_cdf",
    "source_vocab_jaccard",
    "split_leakage",
    "market_share",
    "volume_shipping",
    "customer_order_distribution",
])


def _run(num_cpus: int, only: str | None = SWEEP) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # each subprocess owns a private local Ray cluster
    env.pop("RAY_ADDRESS", None)
    cmd = [sys.executable, TOOL, str(num_cpus), "/root/testdata/sf0.001"]
    if only:
        cmd.append(f"--only={only}")
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        cwd=REPO, text=True,
    )


def test_digests_identical_across_num_cpus():
    # (pytest-timeout is not on this image; the communicate() timeout
    # below is the real guard)
    # sequential, not concurrent: two local Ray clusters contending for
    # the same node more than doubles wall time
    outs = {}
    for n in (4, 16):
        p = _run(n)
        stdout, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"sweep at num_cpus={n} died"
        outs[n] = json.loads(stdout.strip().splitlines()[-1])
    errors = {n: {q: d for q, d in o.items() if d.startswith("ERROR")}
              for n, o in outs.items()}
    assert not any(errors.values()), f"query errors: {errors}"
    assert outs[4] == outs[16], (
        "digest mismatch across num_cpus: "
        + str({q: (outs[4][q], outs[16][q]) for q in outs[4]
               if outs[4][q] != outs[16].get(q)})
    )


@pytest.mark.nightly
def test_all_queries_digests_identical_across_num_cpus():
    """The nightly tier (r4 verdict task 5): EVERY ``queries()`` entry
    — including the CI-omitted multi-round pipelines (dedup_clusters,
    ann_pq_topk, simhash, …) — swept at two CPU levels on sf0.001.
    Excluded from the default run by the ``-m "not nightly"`` addopts;
    run with ``pytest -m nightly tests/test_parallelism.py``.  The
    latest hand-run log is recorded in BASELINE.md §nightly-sweep."""
    outs = {}
    for n in (4, 16):
        p = _run(n, only=None)  # no --only: the tool sweeps ALL queries
        stdout, _ = p.communicate(timeout=3000)
        assert p.returncode == 0, f"full sweep at num_cpus={n} died"
        outs[n] = json.loads(stdout.strip().splitlines()[-1])
    assert len(outs[4]) >= 90, f"sweep covered only {len(outs[4])} queries"
    errors = {n: {q: d for q, d in o.items() if d.startswith("ERROR")}
              for n, o in outs.items()}
    assert not any(errors.values()), f"query errors: {errors}"
    assert outs[4] == outs[16], (
        "digest mismatch across num_cpus: "
        + str({q: (outs[4][q], outs[16][q]) for q in outs[4]
               if outs[4][q] != outs[16].get(q)})
    )
