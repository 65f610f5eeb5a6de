"""Native C++ codec must be byte-identical to the pure-Python codec."""

import numpy as np
import pytest

from clustering_tpu.utils import xtc, xtc_native


def _walk(natoms, seed):
    rng = np.random.default_rng(seed)
    x = np.empty((natoms, 3), dtype=np.float32)
    for i in range(natoms):
        if i % 5 == 0:
            x[i] = rng.uniform(-3, 3, 3)
        else:
            x[i] = x[i - 1] + rng.uniform(-0.02, 0.02, 3)
    return x


@pytest.mark.skipif(not xtc_native.available(),
                    reason="native codec unavailable")
@pytest.mark.parametrize("natoms,prec,seed", [
    (12, 1000.0, 0), (100, 1000.0, 1), (1000, 10000.0, 2),
    (3, 1000.0, 3), (333, 100.0, 4)])
def test_native_matches_python(natoms, prec, seed):
    coords = _walk(natoms, seed)
    py = xtc._compress_frame_py(coords, prec)
    nat = xtc_native.compress_frame(coords, prec)
    assert py == nat
    c1, p1, o1 = xtc._decompress_frame_py(py, 0)
    c2, p2, o2 = xtc_native.decompress_frame(py, 0)
    np.testing.assert_array_equal(c1, c2)
    assert o1 == o2
    assert p1 == p2


def _decoders():
    out = [("python", xtc._decompress_frame_py)]
    if xtc_native.available():
        out.append(("native", xtc_native.decompress_frame))
    return out


@pytest.mark.parametrize("name,decode", _decoders())
def test_corrupt_negative_natoms_rejected(name, decode):
    blob = bytearray(xtc._compress_frame_py(_walk(50, 7), 1000.0))
    blob[0:4] = (-5).to_bytes(4, "big", signed=True)
    with pytest.raises(ValueError):
        decode(bytes(blob), 0)


@pytest.mark.parametrize("name,decode", _decoders())
@pytest.mark.parametrize("bad_smallidx", [-3, 0, 5, 72, 1000])
def test_corrupt_smallidx_rejected(name, decode, bad_smallidx):
    # smallidx lives at byte 32 (natoms 4 + precision 4 + min/max ints 24)
    blob = bytearray(xtc._compress_frame_py(_walk(50, 8), 1000.0))
    blob[32:36] = bad_smallidx.to_bytes(4, "big", signed=True)
    with pytest.raises(ValueError):
        decode(bytes(blob), 0)


@pytest.mark.parametrize("name,decode", _decoders())
def test_corrupt_run_past_natoms_rejected(name, decode):
    # a tightly-packed walk guarantees long runs; shrinking the stream's
    # natoms field makes those runs overrun the (natoms, 3) output buffer
    # unless the decoder bounds them (the native path used to corrupt the
    # heap here)
    rng = np.random.default_rng(11)
    coords = np.cumsum(
        rng.uniform(-0.001, 0.001, (100, 3)).astype(np.float32), axis=0)
    blob = bytearray(xtc._compress_frame_py(coords, 1000.0))
    blob[0:4] = (12).to_bytes(4, "big", signed=True)
    with pytest.raises(ValueError):
        decode(bytes(blob), 0)


@pytest.mark.skipif(not xtc_native.available(),
                    reason="native codec unavailable")
def test_native_throughput_sane():
    coords = _walk(20000, 9)
    import time
    t0 = time.perf_counter()
    blob = xtc_native.compress_frame(coords, 1000.0)
    out, _, _ = xtc_native.decompress_frame(blob, 0)
    t = time.perf_counter() - t0
    np.testing.assert_allclose(out, coords, atol=1.01e-3)
    assert t < 1.0  # 20k atoms round trip well under a second
