"""Deterministic second-decade SUBSET dir for the quadratic-oracle
family (VERDICT r9 #5): the edit/gram self-join queries
(x_edit_distance_join, x_edit_dedup_clusters, x_jaccard_prefix_join,
x_ngram_jaccard over documents; j_fuzzy_edit1_join over customer)
have DuckDB oracles whose PAIR GENERATION is a quadratic self-join —
unaffordable at the 50k-doc / 150k-customer sf1 corpus, and on this
constant-vocab testdata the true doc pair set itself is ~n². Their
second-decade check therefore runs on a deterministic subset of the
sf1 rows (key % 10 == 0 → 5,000 docs / 15,000 customers, sf0.1-sized
but drawn from the sf1 corpus: sf1's own near-dup process, lengths,
marginals) with every cap/threshold semantic preserved — the same
queries, the same oracles, one WHERE clause of provenance.

Writes filtered ``documents.parquet`` + ``customer.parquet`` into the
target dir and hardlinks every other table from the source. ONLY the
quadratic-oracle family is meant to run here (the filtered customer
table breaks orders→customer FK joins by design — don't point the
full sweep at this dir). The dir name deliberately does NOT parse as
sf >= 1 (`sf1sub10`), so check_parity's one-ulp rule stays off there.

Usage: python tools/gen_sf_subset.py [src_dir] [dst_dir] [modulus]
       # defaults: .localdata/sf1  .localdata/sf1sub10  10
"""

from __future__ import annotations

import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
FILTERED = {"documents": "doc_id", "customer": "c_custkey"}


def main() -> None:
    src = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1")
    dst = os.path.abspath(
        sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf1sub10"
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    for t, key in FILTERED.items():
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        keep = pc.equal(
            pc.subtract(
                tab[key], pc.multiply(pc.divide(tab[key], k), k)
            ),
            0,
        )
        sub = tab.filter(keep)
        pq.write_table(
            sub, os.path.join(dst, f"{t}.parquet"), compression="zstd"
        )
        print(f"{t}: {tab.num_rows:,} -> {sub.num_rows:,} ({key} % {k} == 0)")

    for t in TABLES:
        if t in FILTERED:
            continue
        s, d = os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        if os.path.exists(d):
            os.remove(d)
        os.link(s, d)
    print(f"other tables hardlinked from {src}")


if __name__ == "__main__":
    main()
