"""Generate the SPFHP slot-table fixture for x_pack_spfhp's oracle.

Runs an INDEPENDENT per-pack SPFHP simulation (individual open packs
in a FIFO-per-remaining-class structure — not ext/traindata.py's
group-compressed solver) over the sf0.01 length histogram, compresses
the per-doc assignment into (n_tok, rank_base, cnt, pack_base) slot
rows, and writes ``dvmax_spark/fixtures/spfhp_slots_sf0.01.json``.

x_pack_spfhp's DuckDB oracle then re-derives every doc's n_tok and
within-length rank IN SQL and joins this literal slot table — so the
distributed assignment window, the broadcast join arithmetic, and the
per-pack aggregation (where Spark-side bugs would live) are all
value-checked by DuckDB. The packing STRATEGY itself is necessarily
replayed here from the same documented group-batch rule (the rule is
group-level, so an "independent" sim converges to the same
bookkeeping); its guarantees rest on the property tests in
tests/test_traindata.py (capacity, coverage, beats-next-fit,
determinism), not on this fixture.

Pinned to the driver's correctness scale (sf0.01) and ctx_len=128;
regenerate with ``python tools/gen_spfhp_oracle.py`` if either
changes.
"""

from __future__ import annotations

import json
import os

import duckdb

CTX_LEN = 128
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dvmax_spark",
    "fixtures",
    "spfhp_slots_sf0.01.json",
)


def spfhp_per_pack(hist: list[tuple[int, int]], ctx_len: int) -> list[list[int]]:
    """The documented group-batch SPFHP rule simulated over INDIVIDUAL
    packs (ext/traindata.py:_spfhp_strategy tracks them as compressed
    group ranges — this re-derivation is the independent check on that
    bookkeeping).

    Longest length class first; while docs of the class remain: pick
    the tightest remaining-capacity class that fits, take its OLDEST
    group, give ONE doc to each of the group's packs (FIFO, pack-id
    order, up to the docs remaining), and re-queue the used packs as
    one group in their new remaining class. Emits compressed slot rows
    (n_tok, rank_base, cnt, pack_base) mapping within-class rank
    rb+i -> pack pb+i."""
    # remaining -> FIFO of [pack_base, count] groups (consecutive ids)
    open_groups: dict[int, list[list[int]]] = {}
    next_pack = 0
    slots: list[list[int]] = []
    next_rank: dict[int, int] = {}
    for length, cnt in sorted(hist, key=lambda t: (-t[0], t[1])):
        assigned: list[int] = []
        remaining = cnt
        while remaining > 0:
            fits = sorted(r for r in open_groups if r >= length)
            if fits:
                r = fits[0]
                grp = open_groups[r][0]
                take = min(remaining, grp[1])
                base = grp[0]
                grp[0] += take
                grp[1] -= take
                if grp[1] == 0:
                    open_groups[r].pop(0)
                    if not open_groups[r]:
                        del open_groups[r]
            else:
                r = ctx_len
                take = remaining
                base = next_pack
                next_pack += take
            nr = r - length
            if nr > 0:
                open_groups.setdefault(nr, []).append([base, take])
            assigned.extend(range(base, base + take))
            remaining -= take
        # compress ranks 0..cnt-1 -> pack ids into consecutive runs
        rb = next_rank.get(length, 0)
        i = 0
        while i < len(assigned):
            j = i
            while j + 1 < len(assigned) and assigned[j + 1] == assigned[j] + 1:
                j += 1
            slots.append([length, rb + i, j - i + 1, assigned[i]])
            i = j + 1
        next_rank[length] = rb + cnt
    return slots


def main() -> None:
    hist = duckdb.sql(
        f"""
        SELECT least(coalesce(len(string_split(text, ' ')), 1), {CTX_LEN}) AS n_tok,
               count(*) AS cnt
        FROM '{SF_DIR}/documents.parquet' GROUP BY 1
        """
    ).fetchall()
    hist = [(int(a), int(b)) for a, b in hist]
    slots = spfhp_per_pack(hist, CTX_LEN)

    # cross-validate against the group-compressed solver the Spark
    # path uses: per-doc (length, rank) -> pack maps must be identical
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dvmax_spark.ext.traindata import _spfhp_strategy

    def expand(rows):
        m = {}
        for length, rb, cnt, pb in rows:
            for i in range(cnt):
                m[(length, rb + i)] = pb + i
        return m

    group_slots, n_packs = _spfhp_strategy(hist, CTX_LEN)
    a, b = expand(slots), expand([list(r) for r in group_slots])
    assert a == b, "independent per-pack sim diverges from group solver"
    # corpus pin for the oracle's _sfguard CTE: the slot table is only
    # valid against the exact corpus it was solved on
    n_docs, n_chars = duckdb.sql(
        f"SELECT COUNT(*), COALESCE(SUM(LENGTH(text)), 0) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    with open(OUT, "w") as fh:
        json.dump(
            {
                "sf": "0.01",
                "ctx_len": CTX_LEN,
                "corpus_n_docs": int(n_docs),
                "corpus_n_chars": int(n_chars),
                "slots": slots,
            },
            fh,
            indent=1,
        )
    print(f"wrote {OUT}: {len(slots)} slot rows, {n_packs} packs, {len(a)} docs")


if __name__ == "__main__":
    main()
