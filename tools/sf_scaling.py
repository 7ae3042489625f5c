"""sf-scaling measurement: every bench-headline query at sf0.01 AND
sf0.1, min-of-3 interleaved passes (same protocol as bench.py), with
the 10x-data cost ratio — the cheap local proxy for "would this plan
survive a 100x scale-up" (SCALING.md's headline table is produced from
this output).

Usage: python tools/sf_scaling.py [--sfs dirA,dirB] [name ...]
       # default queries: all bench=True; default sfs: sf0.01,sf0.1

``--sfs`` measures a different decade — e.g. the generated sf1 corpus
(tools/gen_sf1_corpus.py) for the documents/embeddings families:
  python tools/gen_sf1_corpus.py
  python tools/sf_scaling.py --sfs /root/testdata/sf0.1,.localdata/sf1 \
      x_minhash_oph x_dedup_clusters ...
gen_sf1_corpus.py writes the FULL roster at sf1 (star schema + events +
documents + embeddings), so any bench query can be measured there.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from dvmax_spark.registry import all_queries
    from dvmax_spark.session import get_spark

    spark = get_spark("sf_scaling", shuffle_partitions=16)
    global SFS
    argv = sys.argv[1:]
    if "--sfs" in argv:
        i = argv.index("--sfs")
        SFS = tuple(os.path.abspath(p) for p in argv[i + 1].split(","))
        assert len(SFS) == 2, "--sfs takes exactly two comma-separated dirs"
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    specs = {
        n: s
        for n, s in all_queries().items()
        if (s.bench if not only else n in only)
    }
    print(f"{len(specs)} queries x {len(SFS)} SFs x 3 passes", file=sys.stderr)

    def run(spec, sf_dir) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup at both sfs
    first = next(iter(specs.values()))
    for sf in SFS:
        run(first, sf)

    best: dict[tuple[str, str], float] = {}
    for p in range(3):
        for name, spec in specs.items():
            for sf in SFS:
                dt = run(spec, sf)
                k = (name, sf)
                if k not in best or dt < best[k]:
                    best[k] = dt
        print(f"pass {p + 1}/3 done", file=sys.stderr)

    labels = [os.path.basename(p.rstrip("/")) for p in SFS]
    print(f"| query | {labels[0]} | {labels[1]} | 10x |")
    print("|---|---|---|---|")
    for name in specs:
        a, b = best[(name, SFS[0])], best[(name, SFS[1])]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
