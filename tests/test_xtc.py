"""XTC codec tests: self-roundtrip plus byte-level golden parity against the
reference's vendored GROMACS xdrfile library (compiled on the fly as an
oracle)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from clustering_tpu.utils import xtc

XDR_DIR = "/root/reference/src/coords_file/xdrfile"


def _random_walk(natoms, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty((natoms, 3), dtype=np.float32)
    for i in range(natoms):
        if i % 7 == 0:
            x[i] = rng.uniform(-2, 2, 3)
        else:
            x[i] = x[i - 1] + rng.uniform(-0.01, 0.01, 3)
    return x


def test_roundtrip_small(tmp_path):
    # <= 9 atoms: stored uncompressed
    coords = np.asarray([[0.1, 0.2, 0.3], [1.0, -1.0, 0.5]],
                        dtype=np.float32)
    p = tmp_path / "small.xtc"
    w = xtc.XtcWriter(str(p))
    w.write_frame(coords, step=3, time=1.5)
    w.close()
    r = xtc.XtcReader(str(p))
    f = r.read_frame()
    np.testing.assert_allclose(f.coords, coords, rtol=1e-6)
    assert f.step == 3 and abs(f.time - 1.5) < 1e-6
    assert r.read_frame() is None
    r.close()


def test_roundtrip_compressed(tmp_path):
    coords = _random_walk(200)
    p = tmp_path / "c.xtc"
    w = xtc.XtcWriter(str(p))
    for f in range(3):
        w.write_frame(coords + 0.001 * f, step=f, time=0.1 * f,
                      precision=1000.0)
    w.close()
    r = xtc.XtcReader(str(p))
    for f in range(3):
        frame = r.read_frame()
        assert frame is not None
        assert frame.natoms == 200
        # lossy at 1/precision
        np.testing.assert_allclose(frame.coords, coords + 0.001 * f,
                                   atol=1.01e-3)
    assert r.read_frame() is None
    r.close()


def test_quantization_matches_reference_semantics():
    # round-half-away-from-zero via fp32 trunc
    vals = np.asarray([0.0004999, -0.0004999, 0.0015, -0.0015, 1.23456],
                      dtype=np.float32)
    q = xtc._quantize(vals, 1000.0)
    lf = np.where(vals >= 0, vals * np.float32(1000) + np.float32(0.5),
                  vals * np.float32(1000) - np.float32(0.5))
    np.testing.assert_array_equal(q, np.trunc(lf).astype(np.int64))


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler for the xdrfile oracle")
    d = tmp_path_factory.mktemp("xtc_oracle")
    exe = d / "xtc_oracle"
    src = os.path.join(os.path.dirname(__file__), "xtc_oracle.c")
    subprocess.run(
        [cc, "-O2", "-I", XDR_DIR, src,
         os.path.join(XDR_DIR, "xdrfile.c"),
         os.path.join(XDR_DIR, "xdrfile_xtc.c"),
         "-o", str(exe), "-lm"],
        check=True, capture_output=True)
    return str(exe)


@pytest.mark.parametrize("natoms,prec", [(5, 1000.0), (50, 1000.0),
                                         (500, 1000.0), (500, 100000.0),
                                         (2000, 10000.0)])
def test_golden_read(oracle, tmp_path, natoms, prec):
    """Our reader must exactly reproduce what the reference library wrote."""
    p = tmp_path / "ref.xtc"
    subprocess.run([oracle, "write", str(p), str(natoms), "3", "42",
                    str(prec)], check=True)
    dump = subprocess.run([oracle, "read", str(p)], check=True,
                          capture_output=True, text=True).stdout
    lines = iter(dump.strip().splitlines())
    r = xtc.XtcReader(str(p))
    for f in range(3):
        head = next(lines).split()
        frame = r.read_frame()
        assert frame is not None
        assert frame.step == int(head[1])
        ref = np.asarray([[float(v) for v in next(lines).split()]
                          for _ in range(natoms)], dtype=np.float32)
        np.testing.assert_array_equal(frame.coords, ref)
    assert r.read_frame() is None
    r.close()


@pytest.mark.parametrize("natoms,prec", [(50, 1000.0), (500, 1000.0),
                                         (2000, 10000.0)])
def test_golden_write(oracle, tmp_path, natoms, prec):
    """Our writer must produce byte-identical files to the reference
    library for the same input coordinates."""
    ref_path = tmp_path / "ref.xtc"
    subprocess.run([oracle, "write", str(ref_path), str(natoms), "2", "7",
                    str(prec)], check=True)
    # decode the reference file, then re-encode with our writer
    r = xtc.XtcReader(str(ref_path))
    frames = []
    while True:
        f = r.read_frame()
        if f is None:
            break
        frames.append(f)
    r.close()
    our_path = tmp_path / "ours.xtc"
    w = xtc.XtcWriter(str(our_path))
    for f in frames:
        w.write_frame(f.coords, step=f.step, time=f.time, box=f.box,
                      precision=f.precision)
    w.close()
    assert our_path.read_bytes() == ref_path.read_bytes()
