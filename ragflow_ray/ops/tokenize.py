"""Dictionary-tokenizer queries over the documents table.

The reference tokenizes every chunk into retrieval fields with its
trie tokenizer (rag/nlp/rag_tokenizer.py; consumed at
rag/nlp/__init__.py ``tokenize`` → ``content_ltks``).  Its dictionary
is an external download, so the engine treats the dictionary as data:
here it is DERIVED from the corpus itself — a distributed vocabulary
scan (the same pattern a tokenizer trainer runs) builds the
dictionary, which is then broadcast once (``ray.put``) into an actor
pool that holds the built trie per actor.

To make trie behavior observable against a SQL oracle, the latin
corpus is deterministically lifted into a CJK alphabet (letter i →
U+4E00+i — verified stable under ``tradi2simp``/``str_q2b``) so the
dictionary-matching path actually runs (latin runs bypass the trie by
design, rag_tokenizer.py:330-335):

* ``rag_tokenize``: every word image is a dictionary entry, so
  forward and backward maximum matching agree and the output equals
  the word-wise translation — recomputable exactly in SQL via
  ``translate``.
* ``rag_tokenize_ambiguous``: appends a planted span whose dictionary
  entries make forward (AB|C) and backward (A|BC) matching DISAGREE,
  forcing the scored-DFS re-segmentation; frequencies are chosen so
  the winning tiling is provably ``A BC`` (score 25.5 vs 4.5, worked
  below), giving the oracle a constant resolved suffix.
"""

from __future__ import annotations

import re

import pandas as pd

from ..sources.readers import read_parquet_clean

# 26 CJK chars, one per latin letter; pinned stable under
# tradi2simp/str_q2b (tests assert this)
CJK_ALPHA = "一丁丂七丄丅丆万丈三上下丌不与丏丐丑丒专且丕世丗丘丙"
_LATIN = "abcdefghijklmnopqrstuvwxyz"
_TO_CJK = str.maketrans(_LATIN, CJK_ALPHA)
_WORD_RE = re.compile(r"[a-z]+")

# the planted ambiguity: chars outside CJK_ALPHA (still inside the
# is_chinese range), entries A, AB, BC — C alone is NOT a word, so
# forward matching yields AB|C and backward yields A|BC
_A, _B, _C = "乀", "乁", "乂"
AMBIG_SPAN = _A + _B + _C
AMBIG_DICT = [
    f"{_A} 163000000 n",        # F = int(ln(163)+0.5) = 5
    f"{_A}{_B} 2700000 n",      # F = 1
    f"{_B}{_C} 163000000 n",    # F = 5
]
# fw tiling (AB, C):  30/2 + 1/2 + (1 + -12)  -> DFS rescores span
# dfs best  (A, BC):  30/2 + 1/2 + (5 + 5) = 25.5
# dfs other (AB, C):  30/2 + 1/2 + (1 - 12) = 4.5
AMBIG_RESOLVED = f"{_A} {_B}{_C}"

# --- fine-grained plant ----------------------------------------------
# fine_grained_tokenize re-splits every CJK token of length >= 3 into
# its SECOND-best DFS tiling (rag_tokenizer.py:394-432).  To keep the
# corpus part SQL-recomputable, every word image gets a terminator
# char, so no image is a prefix of another and the DFS finds exactly
# one tiling (the full word) -> provably unchanged.  The planted token
# DEF carries entries {DEF, DE, F}, so its tilings score
#   best   [DEF]  : 30/1 + 1   + 5       = 36
#   second [DE,F] : 30/2 + 1/2 + (5 + 5) = 25.5
# and fine-grained resolves it to the constant 'DE F'.
FINE_TERM = "丨"                 # outside CJK_ALPHA; q2b/tradi2simp-stable
_D, _E, _F = "乄", "乆", "乊"    # ditto, disjoint from the ambiguity plant
FINE_SPAN = _D + _E + _F
FINE_DICT = [
    f"{_D}{_E}{_F} 163000000 n",
    f"{_D}{_E} 163000000 n",
    f"{_F} 163000000 n",
]
FINE_RESOLVED = f"{_D}{_E} {_F}"


def corpus_dict_lines(sf_dir: str, term: str = "") -> list[str]:
    """Distributed vocabulary scan → dictionary lines.

    Per-batch partial uniques collapse the long tail before the
    (vocabulary-bounded) global unique; the result is the dictionary,
    not the corpus, so driver materialization is safe by construction.
    """
    import pyarrow as pa

    uniq_schema = pa.schema([("word", pa.string())])

    def partial_unique(batch: pd.DataFrame) -> pa.Table:
        words = batch["text"].str.findall(_WORD_RE).explode().dropna()
        return pa.table(
            {"word": pa.array(sorted(set(words)), type=pa.string())},
            schema=uniq_schema,
        )

    # vocabulary-bounded partial uniques: a narrow dedup combine level
    # + driver drop_duplicates instead of the ~0.8 s fixed small-result
    # groupby-count exchange (which itself replaced .unique(): the
    # Unique aggregate trips over ndarray accumulators on Arrow blocks
    # in Ray 2.49)
    vocab = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial_unique, batch_format="pandas")
        .map_batches(lambda b: b.drop_duplicates(),
                     batch_format="pandas", batch_size=65536)
        .to_pandas()["word"].drop_duplicates()
    )
    return [
        f"{w.translate(_TO_CJK)}{term} 1000000 n"
        for w in sorted(vocab)
    ]


class RagTokStage:
    """Actor-pool stage: trie built once per actor from the broadcast
    dictionary, per-row tokenize in ``__call__`` (segmentation is
    inherently sequential per string — same contract as the chunker
    UDFs)."""

    def __init__(self, dict_ref, suffix: str = "", term: str = "", fine: bool = False):
        import ray

        from ..text.ragtok import RagTok

        self._tok = RagTok(ray.get(dict_ref))
        self._suffix = suffix
        self._term = term
        self._fine = fine

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = [
            " ".join(
                w.translate(_TO_CJK) + self._term for w in _WORD_RE.findall(t)
            )
            + self._suffix
            for t in batch["text"]
        ]
        tks = [self._tok.tokenize(t) for t in texts]
        if self._fine:
            tks = [self._tok.fine_grained_tokenize(t) for t in tks]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "tks": tks,
            }
        )


def _run(
    sf_dir: str,
    extra_dict: list[str],
    suffix: str,
    term: str = "",
    fine: bool = False,
) -> pd.DataFrame:
    import ray

    dict_ref = ray.put(corpus_dict_lines(sf_dir, term) + extra_dict)
    df = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            RagTokStage,
            fn_constructor_kwargs={
                "dict_ref": dict_ref,
                "suffix": suffix,
                "term": term,
                "fine": fine,
            },
            batch_format="pandas",
            concurrency=(1, 8),
        )
        .to_pandas()
    )
    return df.sort_values("doc_id").reset_index(drop=True)


def rag_tokenize(sf_dir: str) -> pd.DataFrame:
    """→ (doc_id, tks): trie tokenization of the CJK-lifted corpus."""
    return _run(sf_dir, [], "")


def rag_tokenize_ambiguous(sf_dir: str) -> pd.DataFrame:
    """→ (doc_id, tks): same, with the planted FW/BW-disagreeing span
    appended — every row ends with the DFS-resolved ``A BC``."""
    return _run(sf_dir, AMBIG_DICT, " " + AMBIG_SPAN)


def rag_tokenize_fine(sf_dir: str) -> pd.DataFrame:
    """→ (doc_id, tks): tokenize + fine_grained_tokenize with
    terminator-suffixed word images (unique-tiling ⇒ identity on
    corpus tokens) and the planted DEF span resolved to ``DE F``."""
    return _run(sf_dir, FINE_DICT, " " + FINE_SPAN, term=FINE_TERM, fine=True)


def oracle_sql() -> dict[str, str]:
    translate_words = (
        "array_to_string(list_transform("
        "regexp_extract_all(text, '[a-z]+'), "
        f"w -> translate(w, '{_LATIN}', '{CJK_ALPHA}')), ' ')"
    )
    return {
        "rag_tokenize": f"""
            SELECT doc_id, {translate_words} AS tks
            FROM documents ORDER BY doc_id
        """,
        "rag_tokenize_ambiguous": f"""
            SELECT doc_id,
                   {translate_words} || ' {AMBIG_RESOLVED}' AS tks
            FROM documents ORDER BY doc_id
        """,
        "rag_tokenize_fine": f"""
            SELECT doc_id,
                   array_to_string(list_transform(
                       regexp_extract_all(text, '[a-z]+'),
                       w -> translate(w, '{_LATIN}', '{CJK_ALPHA}')
                            || '{FINE_TERM}'), ' ')
                   || ' {FINE_RESOLVED}' AS tks
            FROM documents ORDER BY doc_id
        """,
    }
