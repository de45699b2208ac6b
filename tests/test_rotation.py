"""The certification-window rotation must be arithmetic, not prose.

The driver samples the FIRST 50 registry entries each round. This test
recomputes never-driver-green = registry − union(CORRECTNESS_r01..rN)
from the actual artifacts and asserts the current window prefix covers
every never-green hash-oracle query (up to window capacity) — so a
hand-miscounted rotation list fails CI instead of stranding a query
without driver certification forever (the r6 comment said 37, actual
was 38)."""

from __future__ import annotations

import glob
import json
import os

from console_datagen_spark import plans

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green_union() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, res in json.load(f).items():
                if (
                    res.get("rows_match")
                    and res.get("schema_match")
                    and res.get("hash_match") in (True, None)
                ):
                    green.add(name)
    return green


def test_window_prefix_covers_never_green_queries():
    registry = plans.all_queries()
    names = list(registry)
    green = _driver_green_union()
    never_green_hash = [
        n for n in names if n not in green and registry[n].oracle is not None
    ]
    window = set(names[:WINDOW])
    outside = [n for n in never_green_hash if n not in window]
    # The window must absorb every never-green hash-oracle query unless
    # there are more of them than the window holds (then the prefix must
    # be entirely never-green — no re-cert may displace one).
    if len(never_green_hash) <= WINDOW:
        assert not outside, (
            f"never-driver-green hash-oracle queries left outside the "
            f"{WINDOW}-entry window: {outside}"
        )
    else:
        recerts_in_window = [n for n in names[:WINDOW] if n in green]
        assert not recerts_in_window, (
            f"window holds re-certs {recerts_in_window} while "
            f"{len(outside)} never-green queries wait outside"
        )


def test_no_oracle_less_query_inside_window():
    """A prefix-window harness treats oracle-less entries as failures
    (r5 lesson): rows-only-by-design queries must sit past the window."""
    registry = plans.all_queries()
    names = list(registry)
    bad = [n for n in names[:WINDOW] if registry[n].oracle is None]
    assert not bad, f"oracle-less queries inside the driver window: {bad}"


def _last_green_round() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            for name, res in json.load(f).items():
                if (
                    res.get("rows_match")
                    and res.get("schema_match")
                    and res.get("hash_match") in (True, None)
                ):
                    last[name] = rnd
    return last


def test_window_refreshes_stalest_evidence_first():
    """r8+ re-cert schedule: no hash-oracle query outside the window may
    have STALER driver evidence than one inside it — the window must be
    the 50 oldest-certified (never-green keys as round 0 and leads)."""
    registry = plans.all_queries()
    names = list(registry)
    last = _last_green_round()
    inside = [n for n in names[:WINDOW] if registry[n].oracle is not None]
    outside = [n for n in names[WINDOW:] if registry[n].oracle is not None]
    if not outside:
        return
    worst_inside = max(last.get(n, 0) for n in inside)
    best_outside = min(last.get(n, 0) for n in outside)
    assert worst_inside <= best_outside, (
        f"window holds evidence from round {worst_inside} while a query "
        f"outside is stale since round {best_outside}"
    )


def test_window_is_full():
    """The registry is bigger than the window; a short promote() list
    wastes certification slots only if the tail is also unordered —
    but the window itself must always have 50 distinct entries."""
    assert len(list(plans.all_queries())) >= WINDOW
