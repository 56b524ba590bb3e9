#!/usr/bin/env python
"""Parallelism-invariance harness (SURVEY §5.4).

Runs every ``__ray_entry__.queries()`` entry over a small sf dir in a
FRESH Ray session at the given ``num_cpus`` and prints one JSON object
``{query_name: value_digest}``.  Running it twice at different
``num_cpus`` and diffing the outputs is the cheapest way to catch the
whole determinism-under-parallelism bug class (the r3
``dedup_incremental`` flake) before the external driver does.

Usage: python tools/parallelism_sweep.py NUM_CPUS [SF_DIR] [--only a,b]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def _as_pandas(res):
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_digest(res) -> str:
    """Order/column-order-insensitive content digest: columns sorted by
    name, rows sorted by every column, ints widened to int64, floats
    printed at 12 significant digits (every op rounds well below that,
    so representation jitter cannot flip the digest)."""
    import pandas as pd

    df = _as_pandas(res)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df.columns):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.12g")
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> None:
    num_cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.001"
    only = None
    for a in sys.argv[2:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    out: dict[str, str] = {}
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            out[name] = value_digest(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001 — report, don't die
            out[name] = f"ERROR: {type(exc).__name__}: {exc}"
    ray.shutdown()
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
