"""Second-decade (sf1) value-parity for the component-family oracles
(VERDICT r9 #5): the queries whose DuckDB oracles were prohibitive at
sf1 because recursive reachability ``reach(src, node)`` enumerates
Σ(component-size²) rows — on the sf1 corpus the constant-vocab
near-dup graph is one ~49k-doc giant component, so the stock oracle
form is quadratic in exactly the place the data is biggest.

This tool computes the SAME ``comp`` relation (component id = min
member id) by iterated min-label propagation WITH pointer doubling —
a Python loop over DuckDB temp tables, each round one linear join
over the symmetrized edge list, O(log diameter) rounds — and then
runs each family oracle with its single ``comp AS (SELECT node AS …,
min(src) AS … FROM reach GROUP BY node)`` definition swapped to read
the materialized labels. Everything else in the oracle (the LSH /
near-dup CTE chain, the final windows and rollups) is evaluated by
DuckDB unchanged, and the labels themselves are derived purely
DuckDB-side from the oracle's own pair CTEs — Spark output never
feeds the oracle, so the check stays engine-independent.

Soundness of the label substitute, asserted at runtime:
  * fixpoint: a full extra round changes nothing (checked);
  * at the fixpoint every edge's endpoints share a label and each
    label is a component member id that cannot be below the
    component minimum (labels only ever take existing ids; min is
    monotone), hence label == min reachable id == the oracle's comp;
  * self-check: at sf0.01 the swapped oracle is compared against the
    STOCK recursive oracle for x_dedup_clusters before anything at
    sf1 is trusted (--selfcheck, default on).

Usage:
  python tools/sf1_graph_parity.py [--sf-dir DIR] [--no-selfcheck] [name ...]

Default sf-dir: .localdata/sf1 (tools/gen_sf1_corpus.py). Default
query set: every registered query whose oracle matches the comp
pattern and whose pair CTEs are linear-affordable (doc-minhash,
embedding near-dup, blocked customer edit-1) — the edit/gram
SELF-JOIN family is excluded (their PAIR GENERATION is the quadratic
part; see tools/gen_sf_subset.py for their second-decade check).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from tests.conftest import SF_DIR_CORRECT, TABLES, canonicalize

# query name -> which materialized comp it consumes
DOC_FAMILY = (
    "x_dedup_clusters",
    "x_dedup_clusters_twophase",
    "x_incremental_components",
    "x_incremental_components_maintained",
    "t_stream_components",
    "x_soft_dedup_mass",
    "x_group_split",
    "x_canonical_by_degree",
)
VEC_FAMILY = ("x_semantic_dedup",)
ER_FAMILY = ("x_er_golden_record",)

COMP_RE = re.compile(
    r"comp AS \(\s*SELECT node AS (\w+), min\(src\) AS (\w+) "
    r"FROM reach GROUP BY node\s*\)"
)


def swap_comp(sql: str, comp_table: str) -> str:
    """Replace the oracle's single recursive-comp definition with a
    read of the materialized label table; the now-unreferenced
    ``reach`` CTE is never evaluated (CTEs are lazy)."""
    m = COMP_RE.findall(sql)
    assert len(m) == 1, f"expected exactly one comp definition, found {len(m)}"
    id_alias, label_alias = m[0]
    return COMP_RE.sub(
        f"comp AS (SELECT id AS {id_alias}, label AS {label_alias} "
        f"FROM {comp_table})",
        sql,
    )


def propagate_labels(
    con, pairs_sql: str, nodes_sql: str, name: str, max_rounds: int = 64
) -> int:
    """Materialize ``{name}`` = (id, label) component labels for the
    graph given by ``pairs_sql`` → (id_a, id_b), node universe
    ``nodes_sql`` → (id). Min-label propagation + pointer doubling;
    returns the round count. Fixpoint asserted."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE _pairs AS {pairs_sql}")
    n_pairs = con.execute("SELECT count(*) FROM _pairs").fetchone()[0]
    con.execute(
        "CREATE OR REPLACE TEMP TABLE _edges AS "
        "SELECT id_a AS s, id_b AS d FROM _pairs "
        "UNION SELECT id_b, id_a FROM _pairs"
    )
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE {name} AS "
        f"SELECT id, id AS label FROM ({nodes_sql})"
    )
    rounds = 0
    while True:
        rounds += 1
        assert rounds <= max_rounds, f"no fixpoint after {max_rounds} rounds"
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE _lab2 AS
            SELECT id, min(label) AS label FROM (
              SELECT id, label FROM {name}
              UNION ALL
              SELECT e.d AS id, l.label
              FROM {name} l JOIN _edges e ON e.s = l.id
              UNION ALL
              SELECT l.id, l2.label
              FROM {name} l JOIN {name} l2 ON l2.id = l.label
            ) GROUP BY id"""
        )
        changed = con.execute(
            f"SELECT count(*) FROM _lab2 JOIN {name} USING (id) "
            f"WHERE _lab2.label <> {name}.label"
        ).fetchone()[0]
        con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS SELECT * FROM _lab2")
        if changed == 0:
            break
    print(f"  [{name}] {n_pairs:,} pairs, fixpoint in {rounds} rounds", flush=True)
    return rounds


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    got, exp = canonicalize(got), canonicalize(exp)
    assert list(got.columns) == list(exp.columns), (
        f"columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_exact=False, rtol=0, atol=0
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from dvmax_spark.ext.dedup import _minhash_lsh_ctes
    from dvmax_spark.ext.similarity import _near_dup_ctes
    from dvmax_spark.registry import all_queries
    from dvmax_spark.session import get_spark

    argv = sys.argv[1:]
    sf_dir = os.path.abspath(".localdata/sf1")
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = os.path.abspath(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    only = {a for a in argv if not a.startswith("--")}

    specs = all_queries()
    todo = [
        n
        for n in (*DOC_FAMILY, *VEC_FAMILY, *ER_FAMILY)
        if (not only or n in only) and n in specs
    ]

    spark = get_spark("sf1_graph_parity", shuffle_partitions=16)
    con = duckdb.connect()

    if "--no-selfcheck" not in argv:
        # prove the swap + propagation against the stock recursive
        # oracle at sf0.01 before trusting anything at sf1
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{SF_DIR_CORRECT}/{t}.parquet'"
            )
        propagate_labels(
            con,
            f"WITH {_minhash_lsh_ctes()} SELECT id_a, id_b FROM lsh_pairs",
            "SELECT doc_id AS id FROM documents",
            "comp_doc",
        )
        stock = con.execute(specs["x_dedup_clusters"].sql).fetchdf()
        swapped = con.execute(
            swap_comp(specs["x_dedup_clusters"].sql, "comp_doc")
        ).fetchdf()
        compare(swapped, stock)
        print("selfcheck OK: swapped oracle == stock recursive oracle at sf0.01")

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    t0 = time.perf_counter()
    if any(n in DOC_FAMILY for n in todo):
        propagate_labels(
            con,
            f"WITH {_minhash_lsh_ctes()} SELECT id_a, id_b FROM lsh_pairs",
            "SELECT doc_id AS id FROM documents",
            "comp_doc",
        )
    if any(n in VEC_FAMILY for n in todo):
        # x_semantic_dedup registers semantic_dedup_sql(threshold=0.45,
        # n_planes=4) — the pair CTEs here must use those SAME params
        # (queries_ml.py:395)
        propagate_labels(
            con,
            f"WITH {_near_dup_ctes(0.45, 64, 4, 4)} SELECT id_a, id_b FROM nd_pairs",
            "SELECT vec_id AS id FROM embeddings",
            "comp_vec",
        )
    if any(n in ER_FAMILY for n in todo):
        propagate_labels(
            con,
            """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
               FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
                AND a.c_nationkey = b.c_nationkey
                AND a.c_mktsegment = b.c_mktsegment
               WHERE levenshtein(a.c_name, b.c_name) <= 1""",
            "SELECT c_custkey AS id FROM customer",
            "comp_cust",
        )
    print(f"label materialization: {time.perf_counter() - t0:.1f}s", flush=True)

    failures = []
    for n in todo:
        comp = (
            "comp_doc"
            if n in DOC_FAMILY
            else "comp_vec" if n in VEC_FAMILY else "comp_cust"
        )
        t0 = time.perf_counter()
        try:
            got = specs[n].fn(spark, sf_dir).toPandas()
            exp = con.execute(swap_comp(specs[n].sql, comp)).fetchdf()
            compare(got, exp)
            print(f"OK   {n} ({time.perf_counter() - t0:.1f}s, {len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(n)
            print(f"FAIL {n}: {str(e).strip().splitlines()[:6]}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
