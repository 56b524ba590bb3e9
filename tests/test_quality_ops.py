"""Edge-case tests for the Gopher / C4 quality operators: a planted
corpus with empty docs, whitespace-only docs, bullet/ellipsis-heavy
docs and a duplicate-line block, compared against the SAME DuckDB
oracle SQL the driver runs — pinning the greatest(n,1) guards and the
fixed-point floors on inputs the shared testdata never produces."""

import duckdb
import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _plant(tmp_path):
    docs = [
        "",                                     # empty text
        "   \t  ",                              # whitespace only
        "- a\n- b\n- c",                        # all bullet lines
        "trailing dots...\nmore dots…\nplain",  # ellipsis lines
        "dup line\ndup line\ndup line\nunique",  # duplicate lines
        "one two three four five. six!\nseven? eight \"",  # terminals
        "x " * 200,                             # long low-variance doc
        "### lots # of # symbols ... and ... more ...",
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": docs,
        "lang": ["en"] * len(docs),
        "source": ["srcA"] * len(docs),
    })
    df.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return str(tmp_path), con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "gopher_quality_flags", "gopher_repetition_flags", "c4_line_filter",
])
def test_edge_corpus_matches_oracle(tmp_path, name):
    import __ray_entry__ as entry

    sf_dir, con = _plant(tmp_path)
    got = entry.queries()[name](sf_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(entry.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_gopher_keep_thresholds(tmp_path):
    """The keep flag reacts to the planted pathologies: the all-bullet
    doc and the empty doc must fail, the long plain doc must fail only
    on its rules (short word length)."""
    import __ray_entry__ as entry

    sf_dir, _ = _plant(tmp_path)
    df = entry.queries()["gopher_quality_flags"](sf_dir)
    by_id = df.set_index("doc_id")
    assert by_id.loc[0, "gopher_keep"] == 0          # empty
    assert by_id.loc[2, "bullet_lines_x1000"] == 1000
    assert by_id.loc[2, "gopher_keep"] == 0          # all bullets
    assert by_id.loc[3, "ellipsis_lines_x1000"] == 666
    assert by_id.loc[6, "n_words"] == 200
    # "x " * 200 -> mean word length 100 (x100) < 300 floor
    assert by_id.loc[6, "mean_wordlen_x100"] == 100
    assert by_id.loc[6, "gopher_keep"] == 0


def test_repetition_dup_line_fractions(tmp_path):
    import __ray_entry__ as entry

    sf_dir, _ = _plant(tmp_path)
    df = entry.queries()["gopher_repetition_flags"](sf_dir)
    by_id = df.set_index("doc_id")
    # 4 lines, 3 copies of "dup line" -> 2 duplicates beyond first
    assert by_id.loc[4, "dup_line_x1000"] == 2 * 1000 // 4
    assert by_id.loc[4, "repetition_keep"] == 0
    # the long "x x x ..." doc: top 2-gram "x x" covers nearly all
    assert by_id.loc[6, "top2gram_char_x1000"] > 900
