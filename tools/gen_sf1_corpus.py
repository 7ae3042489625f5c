"""Deterministic sf1-equivalent testdata generator — the SECOND scale
decade, FULL ROSTER: documents + embeddings for the heavy
text/graph/LSH families plus the TPC-H-ish star schema (customer /
supplier / part / orders / lineitem), events, and the scale-constant
dims (region / nation, copied from sf0.1), all at 10x the sf0.1 row
counts with distributions measured from the real sf0.1 parquet
(key ranges, category marginals, lines-per-order ~ Poisson(4.0)
including the observed ~1.8% zero-line orders, value ~ Exp(50) with
the handful of exact zeros that exercise the ANSI divide guards,
timestamps microsecond-NTZ like the driver's files).

The driver-generated testdata stops at sf0.1 (5,000 documents / 2,000
embeddings), so the sf-scaling table's decade ratios were measured on
one decade only (0.01 -> 0.1). This script extends the family one more
decade with the SAME corpus shape, measured from the real sf0.1 tables:

  * 10x documents (50,000), same 31-word vocab (vocab is constant
    across the testdata sfs — read from the sf0.1 parquet, not
    hard-coded), token counts uniform 10..100;
  * same near-dup process: ~4.7% of docs are a copy of an earlier doc
    with the TAIL extended/truncated by 1-2 tokens (that is exactly the
    observed testdata edit pattern — zero internal substitutions), plus
    a small exact-copy tail (sf0.1 has 8/5000);
  * same lang marginals (en ~41%, de/es/fr/zh ~15% each), same 20
    sources round-robin;
  * embeddings: 10x rows (20,000), 64-dim unit-norm, 10 label
    clusters (centroid + gaussian noise, normalized), matching the
    sf0.1 profile (unit norms, balanced labels, no exact-dup vectors).

Output: .localdata/sf1/*.parquet (gitignored — regenerate with this
script; seed fixed, output byte-stable for a given numpy version).
main() writes the FULL roster — documents, embeddings, customer,
supplier, part, orders, lineitem, events, region, nation — so any
bench/parity query can run against the sf1 dir via
tools/sf_scaling.py --sfs or tools/check_parity.py --sf-dir.

Usage: python tools/gen_sf1_corpus.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_DOCS = 50_000
N_EMB = 20_000
EMB_DIM = 64
N_LABELS = 10
N_SOURCES = 20
LANGS = ("en", "de", "es", "fr", "zh")
LANG_P = (0.41, 0.1475, 0.1475, 0.1475, 0.1475)
P_NEAR_DUP = 0.047  # sf0.1: 233/5000 prefix-share groups
P_EXACT_DUP = 0.0016  # sf0.1: 8/5000 exact-dup rows
SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"


def real_vocab() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM '{SF01_DOCS}' ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows]


def gen_documents(rng: np.random.Generator, vocab: list[str]):
    varr = np.array(vocab)
    lens = rng.integers(10, 101, size=N_DOCS)
    texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 0 and r < P_EXACT_DUP:
            texts.append(texts[rng.integers(0, i)])
        elif i > 0 and r < P_EXACT_DUP + P_NEAR_DUP:
            # testdata near-dup pattern: copy + tail edit of 1-2 tokens
            base = texts[rng.integers(0, i)].split(" ")
            delta = int(rng.integers(1, 3)) * (1 if rng.random() < 0.5 else -1)
            if delta > 0:
                base = base + list(rng.choice(varr, size=delta))
            else:
                base = base[: max(3, len(base) + delta)]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(varr, size=lens[i])))
    langs = rng.choice(np.array(LANGS), size=N_DOCS, p=np.array(LANG_P))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % N_SOURCES}" for i in range(N_DOCS)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator):
    cents = rng.normal(size=(N_LABELS, EMB_DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=N_EMB)
    vecs = cents[labels] * 2.0 + rng.normal(size=(N_EMB, EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                # match the driver tables' arrow type exactly, down to
                # the list element field name ("element", parquet-style)
                pa.list_(pa.field("element", pa.float32(), nullable=True)),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


# --- TPC-H-ish star schema + events, 10x the sf0.1 row counts -------------
N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_USERS = 15_000  # events user cardinality scales with sf (sf0.1: 1500)
_US = "us"


def _ts_us(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("datetime64[us]"), pa.timestamp(_US))


def _money(rng: np.random.Generator, lo: float, hi: float, n: int) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, size=n), 2)


def gen_customer(rng: np.random.Generator):
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(N_CUSTOMER), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUSTOMER)]),
            "c_nationkey": pa.array(rng.integers(0, 25, N_CUSTOMER).astype(np.int32), pa.int32()),
            "c_acctbal": pa.array(_money(rng, -1000, 10000, N_CUSTOMER)),
            "c_mktsegment": pa.array(rng.choice(segs, N_CUSTOMER)),
        }
    )


def gen_supplier(rng: np.random.Generator):
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(N_SUPPLIER), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPPLIER)]),
            "s_nationkey": pa.array(rng.integers(0, 25, N_SUPPLIER).astype(np.int32), pa.int32()),
            "s_acctbal": pa.array(_money(rng, 0, 10000, N_SUPPLIER)),
        }
    )


def gen_part(rng: np.random.Generator):
    import duckdb

    adjs, nouns = [], []
    for (name,) in duckdb.sql(
        "SELECT DISTINCT p_name FROM '/root/testdata/sf0.1/part.parquet'"
    ).fetchall():
        a, b = name.split(" ", 1)
        adjs.append(a)
        nouns.append(b)
    adjs, nouns = sorted(set(adjs)), sorted(set(nouns))
    types = [
        t
        for (t,) in duckdb.sql(
            "SELECT DISTINCT p_type FROM '/root/testdata/sf0.1/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    names = [
        f"{adjs[i]} {nouns[j]}"
        for i, j in zip(
            rng.integers(0, len(adjs), N_PART), rng.integers(0, len(nouns), N_PART)
        )
    ]
    keys = np.arange(N_PART)
    return pa.table(
        {
            "p_partkey": pa.array(keys, pa.int64()),
            "p_name": pa.array(names),
            "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]),
            "p_type": pa.array(rng.choice(np.array(types), N_PART)),
            "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32), pa.int32()),
            # observed sf0.1 pattern: 900 + (partkey % 1000) * 0.1
            "p_retailprice": pa.array(np.round(900.0 + (keys % 1000) * 0.1, 1)),
        }
    )


def gen_orders_lineitem(rng: np.random.Generator):
    d0 = np.datetime64("1995-01-01", "us").astype("int64")
    d1 = np.datetime64("2001-08-01", "us").astype("int64")
    statuses = np.array(["F", "O", "P"])
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    DAY = 86_400_000_000
    odate = (rng.integers(0, (d1 - d0) // DAY + 1, N_ORDERS) * DAY) + d0
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, N_CUSTOMER, N_ORDERS), pa.int64()),
            "o_orderstatus": pa.array(rng.choice(statuses, N_ORDERS)),
            "o_totalprice": pa.array(_money(rng, 1000, 500000, N_ORDERS)),
            "o_orderdate": _ts_us(odate),
            "o_orderpriority": pa.array(rng.choice(prios, N_ORDERS)),
        }
    )
    # lines per order ~ Poisson(4.0): matches sf0.1's mean 4.075 AND its
    # ~1.8% zero-lineitem orders (e^-4); total ≈ 6M rows at sf1
    nlines = rng.poisson(4.0, N_ORDERS)
    okeys = np.repeat(np.arange(N_ORDERS), nlines)
    oship = np.repeat(odate, nlines) + rng.integers(1, 96, okeys.size) * DAY
    linenum = np.concatenate([np.arange(1, k + 1) for k in nlines if k > 0])
    flags = np.array(["A", "N", "R"])
    stats = np.array(["F", "O"])
    n = okeys.size
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, N_PART, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, N_SUPPLIER, n), pa.int64()),
            "l_linenumber": pa.array(linenum.astype(np.int32), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(_money(rng, 900, 105000, n)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n) * 0.01, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n) * 0.01, 2)),
            "l_returnflag": pa.array(rng.choice(flags, n)),
            "l_linestatus": pa.array(rng.choice(stats, n)),
            "l_shipdate": _ts_us(oship),
        }
    )
    return orders, lineitem


def gen_events(rng: np.random.Generator):
    t0 = np.datetime64("2024-01-01", "us").astype("int64")
    t1 = np.datetime64("2024-01-31", "us").astype("int64")
    ts = np.sort(rng.integers(t0, t1, N_EVENTS))  # file ordered by ts, like sf0.1
    types = np.array(["click", "error", "purchase", "signup", "view"])
    value = np.round(np.minimum(rng.exponential(50.0, N_EVENTS), 560.0), 2)
    value[rng.integers(0, N_EVENTS, 60)] = 0.0  # the div-guard class sf0.1 has
    return pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
            "ts": _ts_us(ts),
            "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
            "event_type": pa.array(rng.choice(types, N_EVENTS)),
            "value": pa.array(value),
            "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)]),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    docs = gen_documents(rng, real_vocab())
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    emb = gen_embeddings(rng)
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    pq.write_table(gen_customer(rng), os.path.join(out, "customer.parquet"))
    pq.write_table(gen_supplier(rng), os.path.join(out, "supplier.parquet"))
    pq.write_table(gen_part(rng), os.path.join(out, "part.parquet"))
    orders, lineitem = gen_orders_lineitem(rng)
    pq.write_table(orders, os.path.join(out, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(out, "lineitem.parquet"))
    pq.write_table(gen_events(rng), os.path.join(out, "events.parquet"))
    # region/nation are scale-constant dims: carry the sf0.1 values over
    for dim in ("region", "nation"):
        pq.write_table(
            pq.read_table(f"/root/testdata/sf0.1/{dim}.parquet"),
            os.path.join(out, f"{dim}.parquet"),
        )
    import duckdb

    n, dup, nd = duckdb.sql(
        f"""SELECT COUNT(*), COUNT(*) - COUNT(DISTINCT text),
            (SELECT COUNT(*) FROM (SELECT substr(text,1,40) p FROM '{out}/documents.parquet'
             GROUP BY 1 HAVING COUNT(*)>1))
            FROM '{out}/documents.parquet'"""
    ).fetchone()
    print(
        f"wrote {out}: {n} docs ({dup} exact-dup rows, {nd} prefix-share groups), "
        f"{emb.num_rows} embeddings, {orders.num_rows} orders, "
        f"{lineitem.num_rows} lineitem, {N_EVENTS} events"
    )


if __name__ == "__main__":
    main()
