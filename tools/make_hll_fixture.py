"""Generate the oracle fixture for the hll_distinct_tokens query.

Independent, deliberately-naive pure-Python re-derivation of the
pinned HyperLogLog spec (NO imports from ragflow_ray — agreement is a
real check, not an echo):

* token = maximal run of non-ASCII-whitespace (the shared _NTOK_RUN
  class);
* h = first 64 bits of md5(token); register = top 12 bits; rho =
  leading-zero count + 1 within the remaining 52 bits;
* register-wise max over ALL tokens of a source (single pass — no
  batching, so any batching/merge bug in the engine shows up);
* Flajolet et al. 2007 estimate with linear-counting small-range
  correction, registers iterated in index order, final
  floor(est + 0.5).

Also records the TRUE distinct-token count per source so the fixture
doubles as an accuracy pin (the estimate is asserted within 5% in
tests, and frozen exactly for the oracle).

Fixture rows carry corpus_key = SUM(n_chars) (the sketch-fixture
convention).  Run: python tools/make_hll_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import math
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"
P = 12
M = 1 << P
TOKEN = re.compile(r"[^ \t\n\r\f\v]+")


def hll_source(texts) -> tuple[int, int, int]:
    regs = [0] * M
    distinct = set()
    for text in texts:
        for w in TOKEN.findall(text):
            distinct.add(w)
            h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            reg = h >> (64 - P)
            rest = h & ((1 << (64 - P)) - 1)
            rho = (64 - P) - rest.bit_length() + 1
            if rho > regs[reg]:
                regs[reg] = rho
    alpha = 0.7213 / (1.0 + 1.079 / float(M))
    s = 0.0
    zeros = 0
    for r in regs:
        s += 2.0 ** (-r)
        if r == 0:
            zeros += 1
    est = alpha * M * M / s
    if est <= 2.5 * M and zeros > 0:
        est = M * math.log(M / zeros)
    nonzero = sum(1 for r in regs if r > 0)
    return nonzero, int(math.floor(est + 0.5)), len(distinct)


def main(sf_dirs):
    rows = {k: [] for k in ("corpus_key", "source", "nonzero_regs",
                            "est_distinct", "true_distinct")}
    for sf in sf_dirs:
        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text", "source", "n_chars"])
        key = int(sum(t.column("n_chars").to_pylist()))
        by_src: dict[str, list[str]] = {}
        for text, src in zip(t.column("text").to_pylist(),
                             t.column("source").to_pylist()):
            by_src.setdefault(src, []).append(text)
        for src in sorted(by_src):
            nz, est, true = hll_source(by_src[src])
            rows["corpus_key"].append(key)
            rows["source"].append(src)
            rows["nonzero_regs"].append(nz)
            rows["est_distinct"].append(est)
            rows["true_distinct"].append(true)
            err = abs(est - true) / max(true, 1)
            assert err < 0.05, f"{sf}/{src}: est {est} vs true {true}"
        print(f"{sf}: key={key} sources={len(by_src)}")

    pq.write_table(
        pa.table(rows, schema=pa.schema(
            [("corpus_key", pa.int64()), ("source", pa.string()),
             ("nonzero_regs", pa.int64()), ("est_distinct", pa.int64()),
             ("true_distinct", pa.int64())])),
        f"{FIXTURE_DIR}/hll_distinct.parquet",
    )
    print(f"wrote {FIXTURE_DIR}/hll_distinct.parquet "
          f"({len(rows['corpus_key'])} rows)")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    main(dirs)
