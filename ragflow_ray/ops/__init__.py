from . import (
    ann,
    dedup,
    extract_queries,
    multimodal,
    relational,
    template_roundtrips,
    textstats,
)

__all__ = [
    "ann",
    "dedup",
    "extract_queries",
    "multimodal",
    "relational",
    "template_roundtrips",
    "textstats",
]
