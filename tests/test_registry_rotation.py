"""The computed driver-window rotation: failed or errored
CORRECTNESS entries must NOT count as driver-checked (they re-front
automatically after a fix), and the window stays exactly _WINDOW
zero-green-history queries, plan-dependent families first."""

from __future__ import annotations

import glob
import json
import os

from guidewire_spark.registry import (
    _WINDOW,
    _driver_checked_names,
    _entry_passed,
    all_queries,
    driver_window_order,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_passed_semantics():
    assert _entry_passed({"err": None, "rows_match": True, "hash_match": True})
    assert _entry_passed({"err": None, "rows_match": True})  # rows-only
    assert not _entry_passed({"err": "boom"})
    assert not _entry_passed({"err": None, "rows_match": False})
    assert not _entry_passed(
        {"err": None, "rows_match": True, "hash_match": False}
    )
    # absent comparison keys (weaker driver record shapes) still pass
    assert _entry_passed({"err": None})
    # the driver's CLEAN rows-only record: err='no_oracle' + row count
    assert _entry_passed({"err": "no_oracle", "spark_rows": 25})
    assert not _entry_passed({"err": "no_oracle", "spark_rows": None})


def test_checked_names_match_committed_green_history():
    want = set()
    latest: dict[str, tuple[int, dict]] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(p) if c.isdigit()))
        with open(p) as fh:
            for k, v in json.load(fh).items():
                if k not in latest or rnd >= latest[k][0]:
                    latest[k] = (rnd, v)
    want = {k for k, (_, v) in latest.items() if _entry_passed(v)}
    assert _driver_checked_names() == want


def test_window_is_zero_history_plan_dependent_first():
    registry = all_queries()
    checked = _driver_checked_names()
    ordered = list(driver_window_order())
    assert set(ordered) == set(registry)
    front = ordered[:_WINDOW]
    backlog = [n for n in registry if n not in checked]
    assert set(front) <= set(backlog)
    if len(backlog) >= _WINDOW:
        assert len(front) == _WINDOW
    # no plan-dependent backlog query may trail a value-only one
    # inside the front window
    seen_value_only = False
    for n in front:
        plan_dep = n.startswith(
            ("stream_", "join_", "delta_", "cda_", "udtf_", "udaf_", "udf_")
        )
        if not plan_dep:
            seen_value_only = True
        elif seen_value_only:
            raise AssertionError(f"plan-dependent {n} after value-only")
