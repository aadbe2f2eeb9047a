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


def test_manifest_is_source_of_truth():
    """bench.py must read COMPARABLE / HIGH_VARIANCE from the frozen
    checked-in manifest (round-6 verdict #8), and every name must
    resolve in the registry.  HIGH_VARIANCE is the ACTIVE subset:
    entries whose evidence_round is within 2 of the newest committed
    bench round (round-7 verdict #4 auto-expiry)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    manifest = json.load(open(os.path.join(repo, "bench_manifest.json")))
    assert bench.COMPARABLE == manifest["comparable"]
    newest = bench._newest_bench_round()
    active = {
        n
        for n, meta in manifest["high_variance"].items()
        if newest - meta["evidence_round"] <= 2
    }
    assert bench.HIGH_VARIANCE == active
    qs = entry_mod.queries()
    unknown = [n for n in manifest["high_variance"] if n not in qs]
    assert not unknown, f"high_variance references unknown queries: {unknown}"


def test_high_variance_entries_not_expired():
    """Auto-expiry enforcement (round-7 verdict #4): every
    high_variance entry must carry evidence no older than 2 rounds
    behind the newest committed BENCH_LOCAL_r{N} snapshot and a
    non-empty reason.  An expired entry means its median-of-5 escape
    already stopped applying (bench.py drops it from the active set)
    — re-prove it with a fresh idle-machine probe (bump
    evidence_round, record the probe in PROGRESS.jsonl) or evict it
    from the manifest."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    manifest = json.load(open(os.path.join(repo, "bench_manifest.json")))
    newest = bench._newest_bench_round()
    expired = [
        f"{n} (evidence r{meta['evidence_round']}, newest bench r{newest})"
        for n, meta in manifest["high_variance"].items()
        if newest - meta["evidence_round"] > 2
    ]
    assert not expired, (
        "high_variance entries expired — re-prove with scripts/"
        "bench_probe.py or evict: " + ", ".join(expired)
    )
    empty = [
        n for n, meta in manifest["high_variance"].items()
        if not meta.get("reason")
    ]
    assert not empty, f"high_variance entries without evidence: {empty}"


def _load_bench(path):
    import os

    if not os.path.exists(path):
        return None
    return json.load(open(path))


def test_no_unexplained_warm_regressions_vs_committed_baseline():
    """Variance-aware regression gate (round-6 verdict #1).

    Compares the latest local bench run (BENCH_LOCAL.json) against the
    newest committed per-round snapshot (BENCH_LOCAL_r{N}.json).  A
    comparable query FAILS if its warm time regressed more than 1.5x.
    Variance handling: the baseline for each name is the MAX across the
    committed evidence (the snapshot's warm value and, when present,
    the driver-tail warm value from BENCH_r{N}.json) so a low-noise
    lucky baseline doesn't flag a normal run; names in HIGH_VARIANCE
    are additionally measured as median-of-5 by bench.py itself.  An
    absolute floor of 0.4 s of regression filters sub-second jitter.
    """
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = sorted(glob.glob(os.path.join(repo, "BENCH_LOCAL_r*.json")))
    cur = _load_bench(os.path.join(repo, "BENCH_LOCAL.json"))
    if not snaps or cur is None:
        import pytest

        pytest.skip("no committed baseline or no local bench run yet")
    base = json.load(open(snaps[-1]))
    base_warm = dict(base["queries"])
    # fold in the driver-tail evidence for the same round, if recorded
    rnd = re.search(r"_r(\d+)\.json$", snaps[-1]).group(1)
    drv_path = os.path.join(repo, f"BENCH_r{rnd}.json")
    if os.path.exists(drv_path):
        tail = json.load(open(drv_path)).get("tail", "")
        for m in re.finditer(r'"(\w+)":\s*([\d.]+)', tail):
            name, val = m.group(1), float(m.group(2))
            if name in base_warm:
                base_warm[name] = max(base_warm[name], val)
    # explained one-round exemptions: a deliberate feature change that
    # re-costs a query (manifest `rebaselined`) skips the compare ONLY
    # while the baseline snapshot is still the recorded round — the
    # exemption expires by itself once the next snapshot is committed
    manifest = json.load(
        open(os.path.join(repo, "bench_manifest.json"))
    )
    rebase = {
        name: meta
        for name, meta in manifest.get("rebaselined", {}).items()
        if int(rnd) == meta["baseline_round"]
    }
    regressions = []
    for name, new in cur["queries"].items():
        old = base_warm.get(name)
        if old is None:
            continue  # new query this round — no history yet
        if name in rebase:
            continue  # documented feature re-cost, see manifest
        if new > 1.5 * old and new - old > 0.4:
            regressions.append(f"{name}: {old:.2f}s -> {new:.2f}s ({new / old:.2f}x)")
    assert not regressions, (
        "warm-time regressions vs committed baseline (if a rerun on an "
        "IDLE machine reproduces these, the operator regressed; if not, "
        "add the name to bench_manifest.json high_variance with the "
        "evidence): " + "; ".join(sorted(regressions))
    )
