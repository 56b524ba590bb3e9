"""Straggler observability for bucketed exchanges.

Every coarse-bucket ``groupby(...).map_groups`` in this repo bounds
its per-task work by the bucket fanout, but a skewed key distribution
can still concentrate rows in one bucket.  At 100 TB that shows up as
one straggling task minutes after everything else finished — this
module surfaces it EARLY and CENTRALLY instead.

Design (zero cost on healthy data):

* each bucketed kernel calls :func:`observe_group` with its op-scoped
  tag, the group's row count, and the warn threshold its op captured
  on the driver at plan-build time (closures ship driver-side values
  to workers, so ``$RAGFLOW_RAY_GROUP_WARN_ROWS`` set before the query
  builds takes effect everywhere);
* below the threshold the call is a single integer compare;
* above it, the worker logs one warning line (visible in job logs /
  ``ray job logs``) and fire-and-forgets a ping to a small named
  detached actor, so a driver — or a test — can read the skew ledger
  for the whole run via :func:`snapshot`.

The monitor must never fail the job: every actor interaction is
wrapped, and a dead/unreachable monitor degrades to log-only.
"""

from __future__ import annotations

import logging
import os

_LOG = logging.getLogger("ragflow_ray.skew")

_MONITOR_NAME = "ragflow_ray_skew_monitor"
_DEFAULT_WARN_ROWS = 2_000_000


def warn_rows() -> int:
    """The group-size warn threshold — read ON THE DRIVER at
    plan-build time and captured into the kernel closure."""
    try:
        return int(os.environ.get("RAGFLOW_RAY_GROUP_WARN_ROWS",
                                  _DEFAULT_WARN_ROWS))
    except ValueError:
        return _DEFAULT_WARN_ROWS


def _monitor():
    import ray

    @ray.remote(num_cpus=0)
    class SkewMonitor:
        """Per-tag ledger of over-threshold bucket groups."""

        def __init__(self) -> None:
            self._stats: dict[str, dict[str, int]] = {}

        def report(self, tag: str, rows: int) -> None:
            s = self._stats.setdefault(
                tag, {"max_rows": 0, "groups_over": 0})
            s["max_rows"] = max(s["max_rows"], int(rows))
            s["groups_over"] += 1

        def snapshot(self) -> dict[str, dict[str, int]]:
            return {t: dict(s) for t, s in self._stats.items()}

        def reset(self) -> None:
            self._stats.clear()

    return SkewMonitor.options(
        name=_MONITOR_NAME, get_if_exists=True, lifetime="detached"
    ).remote()


def observe_group(tag: str, rows: int, warn: int) -> None:
    """Record one bucketed-exchange group's size.  No-op below
    ``warn``; above it, one log line + one fire-and-forget actor ping
    (per over-threshold group, so overhead is bounded by the number of
    stragglers being reported, not by corpus size)."""
    if rows < warn or warn <= 0:
        return
    _LOG.warning(
        "skewed bucket: %s group holds %d rows (warn threshold %d) — "
        "consider more buckets or a salted key", tag, rows, warn)
    try:
        _monitor().report.remote(tag, int(rows))
    except Exception:  # noqa: BLE001 — observability must never fail the job
        pass


def snapshot() -> dict[str, dict[str, int]]:
    """The run's skew ledger: {tag: {max_rows, groups_over}} for every
    exchange that exceeded its threshold (empty when healthy)."""
    import ray

    try:
        return ray.get(_monitor().snapshot.remote())
    except Exception:  # noqa: BLE001
        return {}


def reset() -> None:
    import ray

    try:
        ray.get(_monitor().reset.remote())
    except Exception:  # noqa: BLE001
        pass
