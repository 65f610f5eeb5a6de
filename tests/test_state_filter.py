"""Filter fast path: the bulk ASCII table route must be byte-identical
to the row-streaming handler (which the golden oracle tests pin against
the reference binary)."""

import os
import random

import numpy as np
import pytest

from clustering_tpu.models import state_filter as sf
from clustering_tpu.utils import textio_native

pytestmark = pytest.mark.skipif(not textio_native.available(),
                                reason="native textio unavailable")


def _write_coords(path, coords):
    with open(path, "w") as fh:
        for row in coords:
            fh.write("".join(" %g" % float(np.float32(v)) for v in row)
                     + "\n")


def _run_streaming(*args):
    orig = sf._ascii_table
    sf._ascii_table = lambda *a: None
    try:
        sf.filter_coords(*args)
    finally:
        sf._ascii_table = orig


@pytest.mark.parametrize("every_nth", [1, 3])
def test_fast_path_matches_streaming(tmp_path, every_nth):
    rng = np.random.default_rng(5)
    n, d = 3000, 4
    coords = (rng.normal(0, 1, (n, d))
              * (10.0 ** rng.integers(-6, 7, (n, d)).astype(np.float64)))
    path = str(tmp_path / "c.dat")
    _write_coords(path, coords.astype(np.float32))
    states = rng.integers(1, 5, size=n)
    sf.filter_coords(states, path, str(tmp_path / "fast"), [1, 2, 3, 4],
                     every_nth, 0)
    _run_streaming(states, path, str(tmp_path / "slow"), [1, 2, 3, 4],
                   every_nth, 0)
    for s in (1, 2, 3, 4):
        a = (tmp_path / f"fast.state{s}.dat").read_bytes()
        b = (tmp_path / f"slow.state{s}.dat").read_bytes()
        assert a == b
        assert len(a) > 0


def test_fast_path_matches_streaming_nrandom(tmp_path, monkeypatch):
    rng = np.random.default_rng(9)
    n, d = 2000, 3
    coords = rng.normal(0, 1, (n, d)).astype(np.float32)
    path = str(tmp_path / "c.dat")
    _write_coords(path, coords)
    states = rng.integers(1, 4, size=n)

    class FakeSystemRandom:  # deterministic per-construction
        def __init__(self):
            self._r = random.Random(42)

        def randint(self, a, b):
            return self._r.randint(a, b)

    monkeypatch.setattr(sf.random, "SystemRandom", FakeSystemRandom)
    sf.filter_coords(states, path, str(tmp_path / "fast"), [1, 2, 3], 1, 40)
    _run_streaming(states, path, str(tmp_path / "slow"), [1, 2, 3], 1, 40)
    for s in (1, 2, 3):
        assert (tmp_path / f"fast.state{s}.dat").read_bytes() == \
               (tmp_path / f"slow.state{s}.dat").read_bytes()


def test_fast_path_declines_comments_and_short_files(tmp_path):
    path = str(tmp_path / "c.dat")
    with open(path, "w") as fh:
        fh.write("# header\n 1.0 2.0\n 3.0 4.0\n")
    assert sf._ascii_table(path, 2) is None  # leading comment -> streaming
    with open(path, "w") as fh:  # blank lines before the comment too
        fh.write("\n  \n # header\n 1.0 2.0\n 3.0 4.0\n")
    assert sf._ascii_table(path, 2) is None
    _write_coords(path, np.ones((3, 2), np.float32))
    assert sf._ascii_table(path, 5) is None  # fewer rows than frames
    tbl = sf._ascii_table(path, 3)
    assert tbl is not None and tbl.shape == (3, 2)


def test_nonpositive_every_nth_keeps_streaming_semantics(tmp_path):
    """every_nth=0 must raise exactly like the streaming loop (the
    reference SIGFPEs on the size_t modulo), not silently write."""
    coords = np.ones((10, 2), np.float32)
    path = str(tmp_path / "c.dat")
    _write_coords(path, coords)
    states = np.ones(10, dtype=np.int64)
    with pytest.raises(ZeroDivisionError):
        sf.filter_coords(states, path, str(tmp_path / "o"), [1], 0, 0)
