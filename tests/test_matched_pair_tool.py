"""Property tests for the matched-pair benchmark tooling (round-10
verdict item #8 / the round-10 advice's asymmetric-retake finding).
Pure-Python — no Spark session needed."""

from __future__ import annotations

import os
import statistics
import sys

from hypothesis import given, strategies as st

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from matched_pair import DISPERSION_RETAKE, retake_needed  # noqa: E402

times = st.floats(min_value=1e-3, max_value=1e3,
                  allow_nan=False, allow_infinity=False)


@given(st.lists(times, min_size=3, max_size=7), times)
def test_retake_fires_on_impossible_steady_state(samples, cold):
    """warm median > cold ALWAYS triggers a retake."""
    if statistics.median(samples) > cold:
        assert retake_needed(samples, cold)


@given(st.lists(times, min_size=3, max_size=7), times)
def test_retake_is_symmetric_on_dispersion(samples, cold):
    """A dispersed warm block triggers a retake in EITHER direction —
    including when the median looks plausibly fast (the downward-bias
    case the round-10 advice flagged)."""
    if max(samples) / min(samples) > DISPERSION_RETAKE:
        assert retake_needed(samples, cold)


@given(st.lists(times, min_size=3, max_size=7), times)
def test_no_retake_on_clean_blocks(samples, cold):
    """Tight warm blocks at or under cold never waste extra samples."""
    if (statistics.median(samples) <= cold
            and max(samples) / min(samples) <= DISPERSION_RETAKE):
        assert not retake_needed(samples, cold)


@given(times, times)
def test_uniform_block_retakes_iff_slower_than_cold(t, cold):
    """Zero-dispersion block: the only trigger left is median > cold."""
    assert retake_needed([t, t, t], cold) == (t > cold)


def test_empty_block_never_retakes():
    assert not retake_needed([], 1.0)


@given(st.lists(times, min_size=3, max_size=7))
def test_scale_invariance(samples):
    """The dispersion trigger is a RATIO: rescaling every sample and
    the cold together cannot change the verdict (host speed is not a
    retake reason)."""
    cold = max(samples)  # median <= cold, isolate the dispersion arm
    for f in (0.25, 4.0):
        assert (retake_needed(samples, cold)
                == retake_needed([s * f for s in samples], cold * f))
