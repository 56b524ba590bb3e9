"""The page payload model.

Real OCR / layout / table-structure ONNX models are out of scope in
this environment (SURVEY.md §7.1 M0/M4): PDF-family documents in the
interleaved corpus carry one media span per page whose ``text`` field
is a JSON page record representing the *post-model* state — OCR line
boxes, layout regions (11 classes, layout_recognizer.py:32-44), and
TSR components (6 labels, table_structure_recognizer.py:30-37):

.. code-block:: json

    {"page_no": 1, "width": 612, "height": 792,
     "boxes":   [{"x0":..,"x1":..,"top":..,"bottom":..,"text":..}],
     "layouts": [{"type":"text","score":0.9,"x0":..,"x1":..,"top":..,"bottom":..}],
     "tables":  [[{"label":"table row","x0":..,"x1":..,"top":..,"bottom":..,"score":0.9}]]}

The stage that decodes this payload (``stages.extract.PageModelStage``)
has the same interface a real model-hosting actor pool would have, so
ONNX weights can be dropped in later without pipeline changes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

LAYOUT_LABELS = [
    "_background_", "Text", "Title", "Figure", "Figure caption",
    "Table", "Table caption", "Header", "Footer", "Reference", "Equation",
]

TSR_LABELS = [
    "table", "table column", "table row", "table column header",
    "table projected row header", "table spanning cell",
]


@dataclass
class Page:
    page_no: int                 # 1-based
    width: float
    height: float
    boxes: list[dict] = field(default_factory=list)
    layouts: list[dict] = field(default_factory=list)
    tables: list[list[dict]] = field(default_factory=list)  # TSR components per table
    outlines: list[tuple[str, int]] = field(default_factory=list)  # (title, depth)


def page_from_payload(payload: str | dict) -> Page:
    """Decode a JSON page record into a :class:`Page`."""
    if isinstance(payload, str):
        payload = json.loads(payload)
    boxes = [
        {
            "x0": float(b["x0"]),
            "x1": float(b["x1"]),
            "top": float(b["top"]),
            "bottom": float(b["bottom"]),
            "text": b.get("text", ""),
            "page_number": int(payload["page_no"]),
        }
        for b in payload.get("boxes", [])
    ]
    layouts = [
        {
            "type": lt["type"].lower(),
            "score": float(lt.get("score", 1.0)),
            "x0": float(lt["x0"]),
            "x1": float(lt["x1"]),
            "top": float(lt["top"]),
            "bottom": float(lt["bottom"]),
            "page_number": int(payload["page_no"]),
        }
        for lt in payload.get("layouts", [])
    ]
    tables = [
        [
            {
                "label": c["label"],
                "score": float(c.get("score", 1.0)),
                "x0": float(c["x0"]),
                "x1": float(c["x1"]),
                "top": float(c["top"]),
                "bottom": float(c["bottom"]),
            }
            for c in tbl
        ]
        for tbl in payload.get("tables", [])
    ]
    outlines = [
        (str(o[0]), int(o[1])) for o in payload.get("outlines", [])
    ]
    return Page(
        page_no=int(payload["page_no"]),
        width=float(payload.get("width", 612)),
        height=float(payload.get("height", 792)),
        boxes=boxes,
        layouts=layouts,
        tables=tables,
        outlines=outlines,
    )
