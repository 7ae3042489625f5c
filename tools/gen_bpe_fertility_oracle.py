"""Generate the golden-encode fixture for x_bpe_fertility.

x_bpe_fertility trains 8 merges and encodes the corpus with
ext/bpe.py's distributed Heaps-dict path; it was rows-only because the
iterative trainer has no SQL twin. But the ENCODE is deterministic
given a merge list — so this script re-derives the expected per-doc
token counts with an INDEPENDENT pure-Python encoder driven by the
first 8 merges of the independent golden trainer's fixture
(tools/gen_bpe_golden.py — the first 8 merges of a 12-merge greedy run
ARE the 8-merge run), and writes
``dvmax_spark/fixtures/bpe_fertility_sf0.01.json``. The oracle then
recomputes the per-source fertility aggregates IN SQL from the real
documents table joined to the fixture's (doc_id, n_tokens) — promoting
the query from rows-only to value-exact at the driver's correctness
scale (sf0.01; the oracle carries the _sfguard corpus pin).

Regenerate with ``python tools/gen_bpe_fertility_oracle.py`` whenever
the testdata, the golden merge fixture, or the query's num_merges=8
changes.
"""

from __future__ import annotations

import json
import os

import duckdb

EOW = "</w>"
NUM_MERGES = 8
SF_DIR = "/root/testdata/sf0.01"
FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dvmax_spark",
    "fixtures",
)
GOLDEN = os.path.join(FIXDIR, "bpe_merges_sf0.01.json")
OUT = os.path.join(FIXDIR, "bpe_fertility_sf0.01.json")


def encode_word(word: str, merges: list[tuple[str, str, str]]) -> int:
    """Leftmost-greedy merge application in rank order — the same
    semantics the reference trainer's merge step uses (and that
    tests/test_bpe.py pins for ext/bpe.py's Catalyst fold)."""
    syms = list(word) + [EOW]
    for left, right, merged in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = merged
            else:
                out.append(s)
        syms = out
    return len(syms)


def main() -> None:
    with open(GOLDEN) as fh:
        golden = json.load(fh)
    merges = [
        (m["left"], m["right"], m["merged"]) for m in golden["merges"][:NUM_MERGES]
    ]
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    cache: dict[str, int] = {}
    n_tokens: list[list[int]] = []
    for doc_id, text in rows:
        total = 0
        for w in (text or "").split(" "):
            if not w:
                continue
            if w not in cache:
                cache[w] = encode_word(w, merges)
            total += cache[w]
        n_tokens.append([int(doc_id), total])
    n_docs, n_chars = duckdb.sql(
        f"SELECT COUNT(*), COALESCE(SUM(LENGTH(text)), 0) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    with open(OUT, "w") as fh:
        json.dump(
            {
                "sf": "0.01",
                "num_merges": NUM_MERGES,
                "corpus_n_docs": int(n_docs),
                "corpus_n_chars": int(n_chars),
                "n_tokens": n_tokens,
            },
            fh,
            indent=1,
        )
    print(f"wrote {OUT}: {len(n_tokens)} docs, {sum(t for _, t in n_tokens)} tokens")


if __name__ == "__main__":
    main()
