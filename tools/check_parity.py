"""Dev loop: run every oracle-backed query against DuckDB at sf0.01 and
report ALL mismatches in one pass (pytest -x equivalent but batch).

Usage: python tools/check_parity.py [--sf-dir DIR] [name ...]

``--sf-dir`` points both engines at a different table directory — e.g.
the generated second-decade corpus (tools/gen_sf1_corpus.py), turning
the sweep into a scale-parity check: the same 210 oracle pairs,
value-exact at 6M-row lineitem instead of 60k. Fixture-backed oracles
(bpe_train / bpe_fertility / pack_spfhp) are sf-pinned and raise their
_sfguard error at any other sf — skipped automatically there.

ONE-ULP RULE (r10, VERDICT r9 #6): at sf >= 1 (parsed from the
--sf-dir basename; force with --ulp, disable with --no-ulp), a float
mismatch is ACCEPTED — reported as ``OK~ ... one-ulp-explained`` and
itemized at the end — iff EVERY differing cell is a float differing by
exactly one unit of its last rounded decimal AND the affected rows are
<= 0.1% of the result. This is the documented float-parity limit
(decimal HALF_UP on an exact .5; distributed-sum associativity at
11-digit magnitudes flipping the final rounding), invisible at the
driver's sf0.01 contract; anything else — bigger gaps, >1 ulp, NaN vs
value, integer/string diffs, too many rows — still fails. The driver
contract at sf0.01 stays bit-exact (the rule never applies there).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from tests.conftest import SF_DIR_CORRECT, TABLES, canonicalize


def _decimal_scale(x: float) -> int | None:
    """Decimal places of ``x``'s shortest repr — the scale the query's
    final ``round()`` produced. None for exponent-form / inf / nan
    (those can never be one-ulp-explained)."""
    s = repr(float(x))
    if any(c in s for c in ("e", "E")) or "inf" in s or "nan" in s:
        return None
    return len(s.split(".")[1]) if "." in s else 0


def one_ulp_report(got, exp, max_row_ppm: int = 2500):
    """(explained, detail) for two canonicalized frames that failed the
    exact compare. explained=True iff every differing cell is a FLOAT
    pair differing by exactly one unit of its last rounded decimal and
    the affected rows are <= ``max_row_ppm`` of the result; detail is
    then the itemized [(col, row, got, exp), ...] acceptance list.
    Anything else (non-float diff, NaN-vs-value, >1 ulp, too many
    rows) returns (False, reason) — an unexplained failure.

    Cap rationale: a plan/logic regression moves most rows; the
    rounding-edge class is sparse (measured sf1 worst case:
    x_quality_score, 82 of 50,000 rows = 1,640 ppm, every cell one
    ulp of the round-4 score). 2,500 ppm bounds acceptance at ~15x
    below any plausible regression while covering the observed class.
    Small AGGREGATE outputs get an absolute floor of 8 rows instead —
    one 11-digit revenue sum flipping its last rounded digit on a
    5-row group-by (j1_inner_join_agg at sf1) is the documented class,
    and a fraction cap is meaningless at that cardinality; the
    per-cell exactly-one-ulp requirement remains the primary guard."""
    import numpy as np

    cells: list[tuple] = []
    bad_rows: set[int] = set()
    for col in got.columns:
        if got[col].equals(exp[col]):
            continue
        if not (
            np.issubdtype(got[col].dtype, np.floating)
            and np.issubdtype(exp[col].dtype, np.floating)
        ):
            return False, f"non-float diff in {col!r}"
        g = got[col].to_numpy()
        e = exp[col].to_numpy()
        neq = ~(np.isnan(g) & np.isnan(e)) & ~(g == e)
        for i in np.nonzero(neq)[0]:
            gv, ev = float(g[i]), float(e[i])
            if np.isnan(gv) or np.isnan(ev):
                return False, f"NaN-vs-value in {col!r} row {i}"
            sg, se = _decimal_scale(gv), _decimal_scale(ev)
            if sg is None or se is None:
                return False, f"exponent-form float in {col!r} row {i}"
            ulp = 10.0 ** -max(sg, se)
            # each stored double carries up to spacing/2 of binary
            # representation error around its decimal value (the
            # 11-digit revenue case: spacing ~1.5e-5 at 6e10), so the
            # measured gap is one decimal ulp +- spacing; if spacing
            # rivals the ulp itself the scale is not representable and
            # the diff can't be adjudicated — reject.
            spacing = np.spacing(max(abs(gv), abs(ev)))
            if spacing * 8 >= ulp:
                return False, (
                    f"{col!r} row {i}: {gv} vs {ev} — binary spacing "
                    f"{spacing:.3g} too coarse for decimal ulp {ulp:g}"
                )
            if abs(abs(gv - ev) - ulp) > 2 * spacing + ulp * 1e-9:
                return False, (
                    f"{col!r} row {i}: {gv} vs {ev} "
                    f"(diff {abs(gv - ev):.3g} != one ulp {ulp:g})"
                )
            cells.append((col, int(i), gv, ev))
            bad_rows.add(int(i))
    if not cells:
        return False, "frames differ but no cell-level float diff found"
    allowed = max(8, len(got) * max_row_ppm // 1_000_000)
    if len(bad_rows) > allowed:
        ppm = len(bad_rows) * 1_000_000 // max(len(got), 1)
        return False, (
            f"{len(bad_rows)} rows ({ppm} ppm) exceed the cap "
            f"(max {allowed} rows = {max_row_ppm} ppm, floor 8)"
        )
    return True, cells


def _sf_at_least_one(sf_dir: str) -> bool:
    """True iff the directory basename parses as sf >= 1 (sf1, sf10...)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    if not base.startswith("sf"):
        return False
    try:
        return float(base[2:]) >= 1.0
    except ValueError:
        return False


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from dvmax_spark.registry import all_queries
    from dvmax_spark.session import get_spark

    argv = sys.argv[1:]
    sf_dir = SF_DIR_CORRECT
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = os.path.abspath(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # sf-pinned fixture oracles guard themselves (loud _sfguard error);
    # at a non-default sf they are skipped rather than reported red
    SF_PINNED = {"x_bpe_train", "x_bpe_fertility", "x_pack_spfhp"}

    spark = get_spark("parity", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    ulp_enabled = (
        "--ulp" in argv or (_sf_at_least_one(sf_dir) and "--no-ulp" not in argv)
    )
    only = {a for a in argv if not a.startswith("--")}
    failures, skipped = [], []
    ulp_accepted: dict[str, list] = {}
    for name, spec in all_queries().items():
        if spec.sql is None or (only and name not in only):
            continue
        if sf_dir != SF_DIR_CORRECT and name in SF_PINNED:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            got = canonicalize(spec.fn(spark, sf_dir).toPandas())
            exp = canonicalize(con.execute(spec.sql).fetchdf())
            if list(got.columns) != list(exp.columns):
                raise AssertionError(f"columns {list(got.columns)} vs {list(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rows {len(got)} vs {len(exp)}")
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False, rtol=0, atol=0
                )
            except AssertionError:
                if not ulp_enabled:
                    raise
                explained, detail = one_ulp_report(got, exp)
                if not explained:
                    raise AssertionError(f"not one-ulp-explained: {detail}") from None
                ulp_accepted[name] = detail
                print(
                    f"OK~  {name} ({time.perf_counter() - t0:.1f}s, {len(got)} rows)"
                    f" one-ulp-explained: {len(detail)} cells"
                )
                continue
            print(f"OK   {name} ({time.perf_counter() - t0:.1f}s, {len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            msg = str(e).strip().split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:12])}")
            if "--trace" in sys.argv:
                traceback.print_exc()

    if skipped:
        print(f"{len(skipped)} sf-pinned skipped at {sf_dir}: {skipped}")
    if ulp_accepted:
        print(f"\n{len(ulp_accepted)} one-ulp-explained (every accepted cell itemized):")
        for name, cells in ulp_accepted.items():
            shown = ", ".join(
                f"{c}[{i}] {gv} vs {ev}" for c, i, gv, ev in cells[:5]
            )
            extra = f" (+{len(cells) - 5} more)" if len(cells) > 5 else ""
            print(f"  {name}: {len(cells)} cells — {shown}{extra}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
