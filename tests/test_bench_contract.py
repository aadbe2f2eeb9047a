"""Bench output contract (round-5 verdict #2): the driver's BENCH
capture keeps only the LAST ~2000 characters of bench.py's single
JSON line, so round-over-round comparability requires the FIXED
``COMPARABLE`` block — printed last — to fit that tail with margin.

Round 5 broke this by growing the then-CONTINUITY list to 102 names
(only the newest ~66 survived truncation → zero comparable rows
between BENCH_r04 and BENCH_r05).  These tests make the failure mode
impossible to reintroduce silently."""

from __future__ import annotations

import json

import bench
import __spark_entry__ as entry_mod


def test_comparable_block_fits_tail():
    """Serialized COMPARABLE block (worst-case 7-char timings like
    999.999) plus the JSON suffix after ``queries`` must stay under
    1800 chars — comfortably inside the driver's 2000-char tail."""
    block = {name: 999.999 for name in bench.COMPARABLE}
    suffix = ', "sf": 0.1, "cold_total_sec": 99999.999, "runs_per_query": 3}}'
    assert len(json.dumps(block)) + len(suffix) < 1800, (
        "COMPARABLE grew past the driver tail budget — do NOT extend "
        "this list; add new names to BENCH_LOCAL.json history instead"
    )


def test_comparable_is_frozen_size():
    """COMPARABLE must never grow (growth is exactly what defeated the
    round-5 fix).  Shrinking is allowed only if a query is deleted."""
    assert len(bench.COMPARABLE) <= 40


def test_comparable_names_exist_in_registry():
    qs = entry_mod.queries()
    missing = [n for n in bench.COMPARABLE if n not in qs]
    assert not missing, f"COMPARABLE references unknown queries: {missing}"


def test_comparable_has_no_duplicates():
    assert len(bench.COMPARABLE) == len(set(bench.COMPARABLE))
