"""Generate the oracle fixture for the ``bpe_train`` query.

The learned merge-rule sequence is a deterministic pure function of
the documents table, but the iterative merge loop is not expressible
in SQL.  Like tools/make_sketch_fixtures.py, this recomputes the
expected rules with an INDEPENDENT, deliberately-naive pure-Python
BPE (Sennrich et al. 2016, algorithm 1 — no imports from
ragflow_ray) and writes them keyed by corpus content
(``corpus_key`` = SUM(n_chars), recomputable in SQL).

Pinned spec (shared with ops/textstats.bpe_train):
  * word = `[a-z]+` run; trainer input = word-frequency dict
  * 8 merges; selection = max weighted pair count, ties broken by
    the lexicographically smallest (left, right)
  * n = the winning pair's weighted count at selection time

Run:  python tools/make_bpe_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"
N_MERGES = 8


def learn_merges(texts: list[str]) -> list[tuple[int, str, str, int]]:
    vocab: dict[str, int] = {}
    for text in texts:
        for w in re.findall(r"[a-z]+", text):
            vocab[w] = vocab.get(w, 0) + 1

    symbolized = {w: list(w) for w in vocab}
    rules = []
    for step in range(1, N_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in vocab.items():
            syms = symbolized[w]
            for k in range(len(syms) - 1):
                p = (syms[k], syms[k + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = None
        for p, n in counts.items():
            if best is None or n > best[1] or (n == best[1] and p < best[0]):
                best = (p, n)
        (left, right), n = best
        rules.append((step, left, right, n))
        for w in vocab:
            syms = symbolized[w]
            out = []
            k = 0
            while k < len(syms):
                if k + 1 < len(syms) and syms[k] == left and syms[k + 1] == right:
                    out.append(left + right)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            symbolized[w] = out
    return rules


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pinned apply spec: each rule in rank order, exhaustively
    left-to-right."""
    syms = list(word)
    for left, right in merges:
        out = []
        k = 0
        while k < len(syms):
            if k + 1 < len(syms) and syms[k] == left and syms[k + 1] == right:
                out.append(left + right)
                k += 2
            else:
                out.append(syms[k])
                k += 1
        syms = out
    return syms


def build(sf_dirs: list[str]) -> None:
    import hashlib
    import os

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows: dict[str, list] = {
        "corpus_key": [], "step": [], "left": [], "right": [], "n": []
    }
    enc_rows: dict[str, list] = {
        "corpus_key": [], "doc_id": [], "n_tokens_bpe": [], "sig": []
    }
    for sf in sf_dirs:
        t = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )
        key = int(sum(t.column("n_chars").to_pylist()))
        texts = t.column("text").to_pylist()
        rules = learn_merges(texts)
        for step, left, right, n in rules:
            rows["corpus_key"].append(key)
            rows["step"].append(step)
            rows["left"].append(left)
            rows["right"].append(right)
            rows["n"].append(n)
        merges = [(left, right) for _s, left, right, _n in rules]
        for doc_id, text in zip(t.column("doc_id").to_pylist(), texts):
            toks: list[str] = []
            for w in re.findall(r"[a-z]+", text):
                toks.extend(encode_word(w, merges))
            enc_rows["corpus_key"].append(key)
            enc_rows["doc_id"].append(int(doc_id))
            enc_rows["n_tokens_bpe"].append(len(toks))
            enc_rows["sig"].append(
                hashlib.md5(" ".join(toks).encode()).hexdigest()
            )
        print(f"{sf}: key={key} rules={rows['corpus_key'].count(key)} "
              f"encoded={enc_rows['corpus_key'].count(key)}")

    pq.write_table(
        pa.table(rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("step", pa.int64()),
            ("left", pa.string()), ("right", pa.string()),
            ("n", pa.int64()),
        ])),
        f"{FIXTURE_DIR}/bpe_merges.parquet",
    )
    pq.write_table(
        pa.table(enc_rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("doc_id", pa.int64()),
            ("n_tokens_bpe", pa.int64()), ("sig", pa.string()),
        ])),
        f"{FIXTURE_DIR}/bpe_encode.parquet",
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    build(dirs)
