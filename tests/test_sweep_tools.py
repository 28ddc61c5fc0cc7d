"""Guards on the two-scale sweep's flagging logic (tools/sweep_scale.py):
the ratio gate catches superlinear blow-ups, and the ABSOLUTE gate
catches the case the ratio gate is blind to — a slow-side artifact
that produces a 'good' ratio (round 11's q118: 67.5 s single-shot at
sf0.1 vs a ~23 s headline median gave a 0.35x ratio and was never
re-measured)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.sweep_scale import abs_flags, ratio_flags  # noqa: E402


def test_ratio_flags_catch_superlinear_only():
    ok = {
        "fine_linear": {"a": 2.0, "b": 4.0},
        "fine_small": {"a": 0.3, "b": 2.0},  # sub-threshold absolute cost
        "blowup": {"a": 2.0, "b": 30.0},
    }
    assert set(ratio_flags(ok)) == {"blowup"}


def test_abs_flags_catch_slow_side_artifact_with_good_ratio():
    """The q118 shape: sf0.1 single-shot 67.5 s (vs 23 s headline
    median) but 10x side 23.5 s -> ratio 0.35x, invisible to the
    ratio gate; the absolute gate must flag it for min-of-3
    re-measurement."""
    ok = {
        "q118_like": {"a": 67.5, "b": 23.5},
        "steady": {"a": 22.0, "b": 30.0},
        "not_in_bench": {"a": 99.0, "b": 99.0},
    }
    medians = {"q118_like": 23.0, "steady": 22.5}
    flags = abs_flags(ok, medians, factor=2.5)
    assert set(flags) == {"q118_like"}
    assert flags["q118_like"]["single_shot"] == 67.5
    assert ratio_flags({"q118_like": ok["q118_like"]}) == {}  # ratio-blind


def test_abs_flags_inverse_ratio_without_median():
    """q118 had NO headline median; the inverse-ratio gate (10x more
    data running 2.5x faster = the small side is an artifact) must
    still flag it."""
    ok = {"q118_pagerank": {"a": 67.5, "b": 23.5}, "ok": {"a": 3.0, "b": 6.0}}
    flags = abs_flags(ok, {})
    assert set(flags) == {"q118_pagerank"}


def test_abs_flags_ignore_fast_queries_and_missing_medians():
    ok = {"quick": {"a": 1.2, "b": 1.5}}
    # 3x over a 0.3 s median but under the 5 s absolute floor: noise
    assert abs_flags(ok, {"quick": 0.3}) == {}
    assert abs_flags(ok, {}) == {}
