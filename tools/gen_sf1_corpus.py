"""Deterministic sf1-equivalent documents + embeddings generator —
the SECOND scale decade for the heavy text/graph/LSH families.

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

Output: .localdata/sf1/{documents,embeddings}.parquet (gitignored —
regenerate with this script; seed fixed, output byte-stable for a given
numpy version). Only these two tables exist at sf1: the heavy families
measured by tools/sf_scaling.py --sfs read nothing else.

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
    import duckdb

    n, dup, nd = duckdb.sql(
        f"""SELECT COUNT(*), COUNT(*) - COUNT(DISTINCT text),
            (SELECT COUNT(*) FROM (SELECT substr(text,1,40) p FROM '{out}/documents.parquet'
             GROUP BY 1 HAVING COUNT(*)>1))
            FROM '{out}/documents.parquet'"""
    ).fetchone()
    print(f"wrote {out}: {n} docs ({dup} exact-dup rows, {nd} prefix-share groups), {emb.num_rows} embeddings")


if __name__ == "__main__":
    main()
