"""bench.py stdout-budget regression guard (round 8).

BENCH_r07 came back ``parsed: null`` because bench.py's one-line
stdout JSON outgrew the external driver's ~2 KB tail-capture window —
the round's official headline wall was lost. These tests pin the
payload ladder (full dict -> subset dict -> scalars) AND prove the
CURRENT benched-query roster fits, so adding benched queries can
never silently push the artifact back into the unparseable state.

No SparkSession needed — the selection logic is pure.
"""

from __future__ import annotations

import json

from bench import select_stdout_line

SUBSET = ("q01", "q02", "q03")


def _summary() -> dict:
    return {
        "metric": "headline_queries_total_wall",
        "value": 123.456,
        "unit": "sec",
        "baseline_subset_wall": 11.851,
        "baseline_subset_n": 17,
        "ndg_build_wall": 1.234,
        "ndg_built": False,
        "sf": 0.1,
        "n": 3,
        "detail_path": "/root/repo/BENCH_DETAIL.json",
    }


def test_full_dict_when_it_fits():
    timings = {f"q{i:02d}": 1.234 for i in range(1, 6)}
    line = select_stdout_line(_summary(), timings, SUBSET, budget=4096)
    doc = json.loads(line)
    assert doc["queries"] == timings
    assert len(line) <= 4096


def test_falls_back_to_subset_then_scalars():
    timings = {f"q{i:02d}": 1.234 for i in range(1, 60)}
    base = len(json.dumps(_summary()))
    # budget fits the subset dict but not the full dict
    mid = base + len(json.dumps({q: 1.234 for q in SUBSET})) + 20
    line = select_stdout_line(_summary(), timings, SUBSET, budget=mid)
    doc = json.loads(line)
    assert set(doc["queries"]) == set(SUBSET)
    assert len(line) <= mid
    # budget below even the subset form -> scalars only, still valid JSON
    line = select_stdout_line(_summary(), timings, SUBSET, budget=base + 5)
    doc = json.loads(line)
    assert "queries" not in doc
    assert doc["baseline_subset_wall"] == 11.851


def test_current_roster_fits_driver_window():
    """The REAL benched roster, worst-case value widths, must fit the
    1800-byte default budget via the ladder (any rung), and the line
    must carry at least the headline scalars + detail_path."""
    from dvmax_spark.registry import all_queries

    import bench as bench_mod
    import inspect

    src = inspect.getsource(bench_mod)
    assert "baseline_subset = (" in src  # subset still defined

    names = [n for n, s in all_queries().items() if s.bench]
    assert names, "no benched queries?"
    timings = {n: 9999.999 for n in names}  # worst-case width
    subset = tuple(names[:17])
    line = select_stdout_line(_summary(), timings, subset, budget=1800)
    assert len(line) <= 1800
    doc = json.loads(line)
    for key in ("value", "baseline_subset_wall", "detail_path", "sf", "n"):
        assert key in doc
