"""Generate the BPE golden-oracle fixture for x_bpe_train.

Runs an INDEPENDENT pure-Python sequential BPE trainer (the textbook
Sennrich 2016 loop — no Spark, no ext/bpe.py import) over the sf0.01
documents corpus and writes the expected 12-merge table to
``dvmax_spark/fixtures/bpe_merges_sf0.01.json``. The fixture becomes
x_bpe_train's DuckDB oracle as a literal VALUES table: the driver's
hash compare then pins the distributed trainer against a second
implementation, upgrading the query from rows-only to value-exact.

The fixture is pinned to the driver's correctness scale (sf0.01, per
the driver contract); regenerate with
``python tools/gen_bpe_golden.py`` whenever the testdata or the
trainer's headline parameters (num_merges=12, min_count=2) change.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import duckdb

EOW = "</w>"
NUM_MERGES = 12
MIN_COUNT = 2
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dvmax_spark",
    "fixtures",
    "bpe_merges_sf0.01.json",
)


def ref_train(texts: list[str], num_merges: int, min_count: int) -> list[dict]:
    """Sequential reference trainer: overlap pair counting,
    (cnt desc, left asc, right asc) argmax, leftmost-greedy merge —
    the same semantics tests/test_bpe.py pins, reimplemented here so
    the fixture does not depend on the Spark module it checks."""
    wc = Counter(w for t in texts if t for w in t.split(" ") if w)
    dict_ = {w: (list(w) + [EOW], f) for w, f in wc.items()}
    merges: list[dict] = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for syms, f in dict_.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = left + right
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": merged, "cnt": cnt}
        )
        for w, (syms, f) in dict_.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            dict_[w] = (out, f)
    return merges


def main() -> None:
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    merges = ref_train(texts, NUM_MERGES, MIN_COUNT)
    assert len(merges) == NUM_MERGES, f"corpus too small: {len(merges)} merges"
    # corpus pin for the oracle's _sfguard CTE: the fixture is only
    # valid against the exact corpus it was trained on
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
                "merges": merges,
            },
            fh,
            indent=1,
        )
    print(f"wrote {OUT}: {len(merges)} merges, top={merges[0]}")


if __name__ == "__main__":
    main()
