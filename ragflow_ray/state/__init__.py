from .manifest import Manifest, config_digest, run_partitioned_extract
from .skewmon import observe_group, snapshot as skew_snapshot, warn_rows

__all__ = ["Manifest", "config_digest", "run_partitioned_extract",
           "observe_group", "skew_snapshot", "warn_rows"]
