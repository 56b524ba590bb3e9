from . import ann, dedup, multimodal, relational, textstats

__all__ = ["ann", "dedup", "multimodal", "relational", "textstats"]
