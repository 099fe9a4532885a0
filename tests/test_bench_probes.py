"""Round-15 bench measurement fix: BLAS-pinned probes + legacy clamp.

The bench's legacy CPU probes let OpenBLAS fan the matmul out to every
idle core (the same workload measured 0.005-0.302 s with idle capacity),
so they track idle cores, not host speed. These tests pin the fix's three
load-bearing properties without asserting absolute timings.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_blas_threads_pins_and_restores():
    import ctypes
    import glob

    import numpy as np

    root = os.path.dirname(os.path.dirname(np.__file__))
    hits = []
    for pat in ("numpy.libs/*openblas*", "numpy/.libs/*openblas*"):
        hits += glob.glob(os.path.join(root, pat))
    if not hits:  # no OpenBLAS — _blas_threads must degrade to a no-op
        with bench._blas_threads(1):
            pass
        return
    lib = ctypes.CDLL(hits[0])
    getter = None
    for sym in ("openblas_get_num_threads64_", "openblas_get_num_threads"):
        if hasattr(lib, sym):
            getter = getattr(lib, sym)
            break
    assert getter is not None
    before = getter()
    with bench._blas_threads(1):
        assert getter() == 1
    assert getter() == before  # restored


def test_pinned_probe_is_a_fixed_workload():
    # the pinned probe must not get FASTER than one core allows: on this
    # hardware the free-threaded probe reads ~0.005 s idle while a true
    # single-core matmul needs >= ~0.02 s; the pinned reading must also
    # be finite/positive. (Upper bound deliberately loose — ambient load
    # can slow it arbitrarily; the fix targets the too-FAST direction.)
    pinned = bench._cpu_probe(pin=True)
    assert pinned >= 0.02, (
        f"pinned probe {pinned} faster than a single core can run the "
        "workload — BLAS pinning did not take effect"
    )


def test_previous_round_exposes_pinned_series_and_legacy_ratio_clamps():
    prev, probe, par_probe, pinned = bench._previous_round()
    # history exists in this repo (BENCH_r01..r14+) and pre-r15 rounds
    # carry no pinned pair
    assert prev and probe and par_probe
    assert isinstance(pinned, tuple) and len(pinned) == 2
    # jitter bands vs a pre-r15 history row must never project the band
    # DOWNWARD on a fast-probe host (the clamp): feed a current probe 10x
    # faster than every recorded round and check each band's lower edge
    # is still >= the smallest raw recorded value for that query.
    hist = bench._round_history()[-4:]
    name = next(iter(prev))
    bands = bench._jitter_bands({name: prev[name]}, 0.001, 0.001)
    band = bands[name]
    if band.get("band_projected"):
        raw_min = min(
            h["queries"][name] for h in hist if name in h["queries"]
        )
        assert band["band_projected"][0] >= raw_min - 1e-9
