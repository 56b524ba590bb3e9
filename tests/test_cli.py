"""CLI (python -m ragflow_ray) end-to-end tests."""

import json
import os

import pytest

from ragflow_ray.__main__ import main


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_synth_extract_resume(self, tmp_path, capsys):
        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "out")

        main(["synth", corpus, "--n-docs", "60"])
        synth = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert synth["written"] == 60
        assert os.path.isdir(os.path.join(corpus, "light"))

        main(["extract", corpus, out])
        first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert first["docs"] == 60 and first["errors"] == 0
        assert first["skipped"] == 0

        main(["extract", corpus, out])
        second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert second["skipped"] == second["partitions"]
        assert second["spans"] == first["spans"]

    def test_show(self, tmp_path, capsys):
        corpus = str(tmp_path / "c2")
        out = str(tmp_path / "o2")
        main(["synth", corpus, "--n-docs", "30"])
        capsys.readouterr()
        main(["extract", corpus, out])
        capsys.readouterr()
        part = sorted(
            d for d in os.listdir(out) if d.startswith("part-")
        )[0]
        main(["show", os.path.join(out, part), "-n", "1"])
        shown = capsys.readouterr().out
        assert shown.startswith("== doc-")

    def test_enrich(self, tmp_path, capsys):
        import pyarrow.parquet as pq

        corpus = str(tmp_path / "c3")
        out = str(tmp_path / "o3")
        chunks = str(tmp_path / "chunks")
        main(["synth", corpus, "--n-docs", "30"])
        capsys.readouterr()
        main(["extract", corpus, out])
        capsys.readouterr()
        dict_file = tmp_path / "user.dict"
        dict_file.write_text("南京市 1500000 ns\n")
        main(["enrich", out, chunks, "--dict", str(dict_file)])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["dict_entries"] == 1
        t = pq.read_table(chunks)
        assert t.num_rows > 0
        cols = set(t.schema.names)
        assert {"chunk_id", "content_ltks", "content_sm_ltks"} <= cols


class TestBenchContract:
    """The driver parses bench.py's stdout as ONE JSON line — pin that
    contract (logs must go to stderr).  Runs the headline only at
    sf0.001 with one sample in a subprocess so it stays cheap and
    never shares this session's Ray instance."""

    def test_stdout_is_one_json_line(self):
        import subprocess
        import sys

        env = dict(os.environ,
                   GRAFT_SF_DIR="/root/testdata/sf0.001",
                   GRAFT_BENCH_SAMPLES="1",
                   GRAFT_HEADLINE_ONLY="1",
                   RAY_GRAFT_CPUS="4",
                   RAY_ADDRESS="")
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "..", "bench.py")],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
        assert len(lines) == 1, proc.stdout
        res = json.loads(lines[0])
        assert res["metric"] == "extract_sec"
        assert res["value"] > 0
        assert res["sf"] == "sf0.001"
        assert res["num_cpus"] == 4
