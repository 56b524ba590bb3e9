"""Retrieval-field enrichment stage tests (stages/enrich.py vs
rag/nlp/__init__.py:260-264 tokenize + task_executor.py:287 chunk id)."""

import hashlib

import pytest

from ragflow_ray.stages.enrich import (
    CHUNK_SCHEMA,
    TokenizeChunksStage,
    chunk_id,
    enrich_chunks,
)
from ragflow_ray.text.ragtok import RagTok


def _doc_batch(rows):
    import pyarrow as pa

    return pa.Table.from_pylist(rows)


def _row(doc_id, spans):
    return {
        "doc_id": doc_id,
        "template": "naive",
        "n_spans": len(spans),
        "n_chars": sum(len(s["text"]) for s in spans),
        "error": "",
        "spans": spans,
    }


def _span(order, text, kind="text", media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "order": order}


class TestStage:
    def test_fields_match_local_tokenizer(self):
        stage = TokenizeChunksStage()
        out = stage(
            _doc_batch([_row("d1", [_span(0, "The Mice Are Running 南京")])])
        ).to_pylist()
        assert len(out) == 1
        tok = RagTok()
        ltks = tok.tokenize("The Mice Are Running 南京")
        assert out[0]["content_ltks"] == ltks
        assert out[0]["content_sm_ltks"] == tok.fine_grained_tokenize(ltks)
        assert out[0]["content_with_weight"] == "The Mice Are Running 南京"
        assert out[0]["chunk_id"] == hashlib.md5(
            "The Mice Are Running 南京d1".encode()
        ).hexdigest()

    def test_table_markup_stripped_from_ltks_only(self):
        stage = TokenizeChunksStage()
        text = "<table><tr><td>alpha</td></tr></table>"
        out = stage(_doc_batch([_row("d1", [_span(0, text)])])).to_pylist()
        # raw text keeps the markup; the tokenized field does not
        assert out[0]["content_with_weight"] == text
        assert "table" not in out[0]["content_ltks"].split()
        assert "alpha" in out[0]["content_ltks"].split()

    def test_dictionary_changes_segmentation(self):
        spans = [_span(0, "南京市长江大桥")]
        no_dict = TokenizeChunksStage()(_doc_batch([_row("d", spans)])).to_pylist()
        with_dict = TokenizeChunksStage(
            dict_lines=[
                "南京市 1500000 ns", "长江 900000 ns", "大桥 700000 n",
                "南京 2000000 ns", "市长 800000 n", "江大桥 20000 nr",
            ]
        )(_doc_batch([_row("d", spans)])).to_pylist()
        assert no_dict[0]["content_ltks"] == "南 京 市 长 江 大 桥"
        assert with_dict[0]["content_ltks"] == "南京市 长江 大桥"

    def test_empty_text_spans_skipped_media_kept(self):
        spans = [
            _span(0, "real chunk"),
            _span(1, "   "),
            _span(2, "", kind="media", media_ref="media://x/1"),
        ]
        out = TokenizeChunksStage()(_doc_batch([_row("d", spans)])).to_pylist()
        assert [r["order"] for r in out] == [0, 2]
        media = out[1]
        assert media["kind"] == "media"
        assert media["media_ref"] == "media://x/1"
        assert media["content_ltks"] == ""
        assert media["chunk_id"] == chunk_id("media://x/1", "d")

    def test_non_text_kinds_tokenized(self):
        """qa/table/tag/... spans are text-bearing chunks — they get
        retrieval fields and content-derived ids, not the media path."""
        spans = [_span(0, "Question: what\tAnswer: that", kind="qa"),
                 _span(1, "\ncontent\tt_x", kind="tag")]
        out = TokenizeChunksStage()(_doc_batch([_row("d", spans)])).to_pylist()
        assert [r["kind"] for r in out] == ["qa", "tag"]
        assert all(r["content_ltks"] for r in out)
        assert out[0]["chunk_id"] == chunk_id("Question: what\tAnswer: that", "d")

    def test_schema_declared(self):
        out = TokenizeChunksStage()(_doc_batch([_row("d", [_span(0, "x y")])]))
        assert out.schema == CHUNK_SCHEMA


@pytest.mark.usefixtures("ray_session")
class TestDatasetWiring:
    def test_enrich_over_flagship_output(self):
        from ragflow_ray.pipelines import flagship_pipeline

        ds = flagship_pipeline(n_docs=12, batch_size=4)
        df = enrich_chunks(ds, concurrency=(1, 2)).to_pandas()
        assert len(df) > 0
        text_rows = df[df["kind"] == "text"]
        assert (text_rows["content_ltks"].str.len() > 0).all()
        # ids are unique per (content, doc) and deterministic
        df2 = enrich_chunks(
            flagship_pipeline(n_docs=12, batch_size=12), concurrency=(1, 2)
        ).to_pandas()
        a = sorted(df["chunk_id"])
        b = sorted(df2["chunk_id"])
        assert a == b
