"""Property-based tests (hypothesis) for the codec and host algorithms."""

import numpy as np
from hypothesis import given, settings, strategies as st

from clustering_tpu.models import coring, mpp
from clustering_tpu.utils import xtc


@st.composite
def coords_arrays(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    vals = draw(st.lists(
        st.floats(min_value=-50.0, max_value=50.0, allow_nan=False,
                  width=32),
        min_size=n * 3, max_size=n * 3))
    return np.asarray(vals, dtype=np.float32).reshape(n, 3)


@settings(max_examples=40, deadline=None)
@given(coords_arrays(), st.sampled_from([100.0, 1000.0, 10000.0]))
def test_xtc_roundtrip_within_precision(coords, precision):
    blob = xtc._compress_frame_py(coords, precision)
    out, prec, consumed = xtc._decompress_frame_py(blob, 0)
    assert consumed == len(blob)
    np.testing.assert_allclose(out, coords, atol=1.01 / precision)


@settings(max_examples=40, deadline=None)
@given(coords_arrays(), st.sampled_from([1000.0, 10000.0]))
def test_xtc_native_python_agree(coords, precision):
    from clustering_tpu.utils import xtc_native
    if not xtc_native.available():
        return
    py = xtc._compress_frame_py(coords, precision)
    nat = xtc_native.compress_frame(coords, precision)
    assert py == nat


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=4), min_size=2,
                max_size=80),
       st.integers(min_value=1, max_value=5))
def test_coring_idempotent_at_fixpoint(states, window):
    """Coring its own output again must be a no-op once stable."""
    states = np.asarray(states)
    limits = [len(states)]
    cored1, _, _ = coring.core_trajectory(states, limits, {}, window)
    cored2, _, _ = coring.core_trajectory(cored1, limits, {}, window)
    cored3, _, _ = coring.core_trajectory(cored2, limits, {}, window)
    np.testing.assert_array_equal(cored2, cored3)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=3), min_size=3,
                max_size=60),
       st.integers(min_value=1, max_value=4))
def test_transition_counts_total(states, lag):
    """Counts sum to the number of admissible pairs."""
    counts = mpp.transition_counts(states, [len(states)], lag)
    total = sum(int(c) for row in counts.values() for c in row.values())
    assert total == max(0, len(states) - lag)
