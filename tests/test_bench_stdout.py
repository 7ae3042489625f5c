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
        "labels_build_wall": 0.987,
        "labels_built": False,
        "mhidx_build_wall": 0.654,
        "mhidx_built": False,
        "sf": 0.1,
        "n": 3,
        "noise_floor": 0.312,
        "noise_probe_median_over_min": 1.042,
        "subset_median_over_min": 1.087,
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
    for key in (
        "value",
        "baseline_subset_wall",
        "detail_path",
        "sf",
        "n",
        "noise_floor",
        "noise_probe_median_over_min",
        "subset_median_over_min",
    ):
        assert key in doc


def test_sentinel_stats_clean_vs_contaminated():
    """The load-sentinel math (r10, after the BENCH_r09 host-load
    episode): a clean capture reads ~1.0 on both ratios; a run where
    half the probe samples doubled reads >>1 on the probe ratio while
    noise_floor still records the idle capability."""
    from bench import sentinel_stats

    timings = {"q01": 1.0, "q02": 2.0, "q03": 4.0}
    medians = {"q01": 1.1, "q02": 2.2, "q03": 4.4}
    clean = sentinel_stats([0.30, 0.31, 0.30, 0.32], timings, medians, ("q01", "q02"))
    assert clean["noise_floor"] == 0.30
    assert 1.0 <= clean["noise_probe_median_over_min"] < 1.1
    assert clean["subset_median_over_min"] == 1.1  # (1.1+2.2)/(1.0+2.0)

    dirty = sentinel_stats([0.30, 0.80, 0.75, 0.90], timings, medians, ("q01", "q02"))
    assert dirty["noise_floor"] == 0.30
    assert dirty["noise_probe_median_over_min"] > 2.0

    # degenerate inputs stay JSON-serializable, never raise
    empty = sentinel_stats([], {}, {}, ("q01",))
    assert empty["subset_median_over_min"] is None
    assert "noise_floor" not in empty


def test_sentinel_survives_stdout_ladder():
    """Sentinel fields are headline scalars: they must survive even the
    scalars-only rung of the payload ladder."""
    summary = _summary()
    base = len(json.dumps(summary))
    timings = {f"q{i:02d}": 1.234 for i in range(1, 60)}
    line = select_stdout_line(summary, timings, SUBSET, budget=base + 5)
    doc = json.loads(line)
    assert "queries" not in doc
    assert doc["noise_floor"] == 0.312
    assert doc["subset_median_over_min"] == 1.087
