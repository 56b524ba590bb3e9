"""End-to-end Ray Data pipeline tests: extraction, parallelism
invariance, heavy-doc splitting, manifest resume."""

import os

import pytest

from ragflow_ray.chunkers import ChunkConfig, chunk_document
from ragflow_ray.sources.corpus import generate_corpus, generate_document, write_corpus


def _spans_by_doc(df):
    out = {}
    for _, row in df.iterrows():
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
    return out


@pytest.mark.usefixtures("ray_session")
class TestPipeline:
    def test_flagship_matches_local_chunkers(self):
        """Distributed output == running the chunker locally per doc
        (span-sequence equality on (kind, text, media_ref, order))."""
        from ragflow_ray.pipelines import flagship_pipeline

        df = flagship_pipeline(n_docs=36, batch_size=8).to_pandas()
        got = _spans_by_doc(df)
        for doc in generate_corpus(36):
            expected = [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in chunk_document(doc, doc["template"])
            ]
            assert got[doc["doc_id"]] == expected, doc["doc_id"]

    def test_parallelism_invariance(self):
        """Same results regardless of batch size / block structure."""
        from ragflow_ray.pipelines import flagship_pipeline

        a = _spans_by_doc(flagship_pipeline(n_docs=27, batch_size=4).to_pandas())
        b = _spans_by_doc(flagship_pipeline(n_docs=27, batch_size=27).to_pandas())
        assert a == b

    def test_heavy_doc_split_preserves_sequence(self):
        """A 40-page doc split into page-range parts reassembles into
        the same span sequence as unsplit extraction."""
        import ray.data as rd

        from ragflow_ray.sources.corpus import corpus_table
        from ragflow_ray.stages.extract import extract_dataset

        doc = generate_document("book_pdf", 0, heavy=True)
        assert len(doc["spans"]) == 40
        ds = rd.from_arrow(corpus_table([doc]))
        split_df = extract_dataset(ds, split_heavy=True, batch_size=4).to_pandas()
        assert len(split_df) == 1
        got = _spans_by_doc(split_df)[doc["doc_id"]]
        # parts chunk independently (page ranges = reference task shards);
        # equality vs per-part local runs
        expected = []
        for p in range(0, 40, 12):
            part = dict(doc)
            part["spans"] = doc["spans"][p : p + 12]
            for s in chunk_document(part, doc["template"]):
                expected.append((s["kind"], s["text"], s["media_ref"], len(expected)))
        assert got == expected

    def test_manifest_resume(self, tmp_path):
        from ragflow_ray.state import run_partitioned_extract

        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "out")
        write_corpus(corpus, 40, rows_per_file=10)

        first = run_partitioned_extract(corpus, out, batch_size=8)
        assert first["partitions"] == 4 and first["skipped"] == 0
        # resume: all partitions skipped, same totals
        second = run_partitioned_extract(corpus, out, batch_size=8)
        assert second["skipped"] == 4
        assert second["docs"] == first["docs"]
        assert second["spans"] == first["spans"]

    def test_manifest_recomputes_on_config_change(self, tmp_path):
        from ragflow_ray.state import run_partitioned_extract

        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "out")
        write_corpus(corpus, 20, rows_per_file=10)
        run_partitioned_extract(corpus, out, batch_size=8)
        changed = run_partitioned_extract(
            corpus, out, cfg=ChunkConfig(chunk_token_num=64), batch_size=8
        )
        assert changed["skipped"] == 0

    def test_output_written_partitioned(self, tmp_path):
        from ragflow_ray.state import run_partitioned_extract

        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "out")
        write_corpus(corpus, 20, rows_per_file=10)
        run_partitioned_extract(corpus, out, batch_size=8)
        parts = [d for d in os.listdir(out) if d.startswith("part-")]
        assert len(parts) == 2
        assert os.path.exists(os.path.join(out, "manifest.jsonl"))


@pytest.mark.usefixtures("ray_session")
class TestParallelismIndependence:
    """Output must be identical regardless of batch size / concurrency
    (the determinism the unseeded-sampling replacements bought)."""

    def test_same_spans_any_batching(self, tmp_path):
        import hashlib
        import json

        from ragflow_ray.sources import write_corpus
        from ragflow_ray.stages.extract import extract_parquet

        write_corpus(str(tmp_path / "c"), 48, rows_per_file=12)

        def digest(batch_size, concurrency):
            out = extract_parquet(str(tmp_path / "c"), batch_size=batch_size,
                                  concurrency=concurrency)
            rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
            payload = json.dumps(
                [
                    [r["doc_id"], r["template"],
                     [[s["kind"], s["text"], s["media_ref"], s["order"]]
                      for s in r["spans"]]]
                    for r in rows
                ],
                ensure_ascii=False,
            )
            return hashlib.md5(payload.encode()).hexdigest()

        a = digest(4, None)
        b = digest(32, (1, 2))
        assert a == b
