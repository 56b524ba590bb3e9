"""Golden span-sequence regression tests.

``tests/goldens/span_goldens.json`` pins the exact output spans
(kind, text, media_ref, order) of 3 documents per fixture family
through their template chunkers.  Any change to a parser, the box
pipeline, a merge rule, or the token counter that shifts even one
chunk boundary fails here — the SURVEY.md §5 conformance bar.

Regenerate intentionally with::

    python -c "import tests.test_goldens as g; g.regenerate()"
"""

import json
import os

import pytest

from ragflow_ray.chunkers import chunk_document
from ragflow_ray.sources.corpus import FAMILIES, generate_document

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "span_goldens.json")


def _load():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def regenerate():
    goldens = {}
    for fam in FAMILIES:
        for idx in (0, 1, 7):
            doc = generate_document(fam, idx)
            goldens[f"{fam}:{idx}:{doc['template']}"] = chunk_document(
                doc, doc["template"]
            )
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f, ensure_ascii=False, indent=1, sort_keys=True)


@pytest.mark.parametrize("key", sorted(_load().keys()))
def test_span_sequence_matches_golden(key):
    goldens = _load()
    fam, idx, template = key.split(":")
    doc = generate_document(fam, int(idx))
    assert doc["template"] == template
    got = chunk_document(doc, template)
    expected = goldens[key]
    assert len(got) == len(expected), f"{key}: {len(got)} vs {len(expected)} spans"
    for g, e in zip(got, expected):
        assert (g["kind"], g["text"], g["media_ref"], g["order"]) == (
            e["kind"], e["text"], e["media_ref"], e["order"],
        ), key
