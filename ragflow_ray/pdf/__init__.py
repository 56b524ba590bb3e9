from .geometry import (
    sort_y_first,
    sort_x_first,
    sort_by_column,
    sort_by_row,
    overlap_ratio,
    find_max_overlap,
    find_overlap_above,
    tightest_horizontal_fit,
    cleanup_layouts,
)
from .page_model import Page, page_from_payload
from .layout import assign_layouts
from .boxpipe import DocBoxes
from .tables import construct_table, tag_table_components, align_table_components

__all__ = [
    "sort_y_first",
    "sort_x_first",
    "sort_by_column",
    "sort_by_row",
    "overlap_ratio",
    "find_max_overlap",
    "find_overlap_above",
    "tightest_horizontal_fit",
    "cleanup_layouts",
    "Page",
    "page_from_payload",
    "assign_layouts",
    "DocBoxes",
    "construct_table",
    "tag_table_components",
    "align_table_components",
]
