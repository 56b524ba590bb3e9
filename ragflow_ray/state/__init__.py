from .manifest import Manifest, config_digest, run_partitioned_extract

__all__ = ["Manifest", "config_digest", "run_partitioned_extract"]
