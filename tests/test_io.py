import numpy as np

from clustering_tpu.utils import io


def test_single_column_roundtrip(tmp_path):
    p = tmp_path / "col.dat"
    io.write_single_column(str(p), [3, 1, 2], "# a header\n")
    assert io.read_single_column(str(p), int).tolist() == [3, 1, 2]


def test_comment_lines_skipped(tmp_path):
    p = tmp_path / "col.dat"
    p.write_text("# comment\n1\n2\n# another\n3\n")
    assert io.read_single_column(str(p), int).tolist() == [1, 2, 3]


def test_fe_scientific_format(tmp_path):
    p = tmp_path / "fe.dat"
    io.write_fes(str(p), [np.float32(0.5), np.float32(1.25)], "",
                 io.default_comments_map())
    lines = [l for l in p.read_text().splitlines()
             if not l.startswith("#")]
    assert lines == ["5.000000e-01", "1.250000e+00"]


def test_comments_map_roundtrip(tmp_path):
    p = tmp_path / "x.dat"
    cm = io.default_comments_map()
    cm["clustering_radius"] = 0.25
    cm["limits"] = 3.0
    io.write_pops(str(p), [1, 2, 3], "# hdr\n", cm)
    cm2 = io.default_comments_map()
    io.read_comments(str(p), cm2)
    assert cm2["clustering_radius"] == 0.25
    assert cm2["limits"] == 3.0
    assert cm2["screening_to"] == 0.0
    # data survives
    assert io.read_single_column(str(p), int).tolist() == [1, 2, 3]


def test_comments_format_matches_reference(tmp_path):
    p = tmp_path / "x.dat"
    cm = io.default_comments_map()
    cm["clustering_radius"] = 0.25
    io.write_pops(str(p), [7], "", cm)
    text = p.read_text()
    assert "#@   clustering_radius = 0.25000\n" in text


def test_neighborhood_roundtrip(tmp_path):
    p = tmp_path / "nn.dat"
    io.write_neighborhood(str(p), [1, 0], [0.5, 0.5], [1, 0], [2.0, 0.0],
                          "# hdr\n")
    nh_i, nh_d, hd_i, hd_d = io.read_neighborhood(str(p))
    np.testing.assert_array_equal(nh_i, [1, 0])
    np.testing.assert_allclose(nh_d, [0.5, 0.5])
    np.testing.assert_allclose(hd_d, [2.0, 0.0])


def test_concat_limits_cumulative(tmp_path):
    p = tmp_path / "lims.dat"
    p.write_text("100\n50\n300\n")
    assert io.read_concat_limits(str(p)) == [100, 150, 450]


def test_read_coords(tmp_path):
    p = tmp_path / "c.dat"
    p.write_text("1.0 2.0 3.0\n4.0 5.0 6.0\n")
    arr = io.read_coords(str(p))
    assert arr.shape == (2, 3)
    assert arr.dtype == np.float32
    arr2 = io.read_coords(str(p), usecols=[0, 2])
    np.testing.assert_allclose(arr2, [[1.0, 3.0], [4.0, 6.0]])


def test_fmt_float_matches_cpp_default():
    assert io.fmt_float(0.5) == "0.5"
    assert io.fmt_float(0.1) == "0.1"
    assert io.fmt_float(1234567.0) == "1.23457e+06"
    assert io.fmt_float(np.float32(1.0 / 3.0)) == "0.333333"


def test_npy_cache_roundtrip(tmp_path):
    p = str(tmp_path / "fe.npy")
    cm = io.default_comments_map()
    cm["clustering_radius"] = 0.5
    io.write_fes(p, [0.5, 1.25], "# hdr\n", cm)
    assert io.read_single_column(p, float).tolist() == [0.5, 1.25]
    cm2 = io.default_comments_map()
    io.read_comments(p, cm2)
    assert cm2["clustering_radius"] == 0.5


def test_npy_coords(tmp_path):
    import numpy as np
    p = str(tmp_path / "c.npy")
    arr = np.random.default_rng(0).random((5, 3)).astype(np.float32)
    np.save(p, arr)
    got = io.read_coords(p)
    np.testing.assert_allclose(got, arr)


# ---------------------------------------------------------------------------
# fast-path IO: byte identity and exact fallback semantics
# ---------------------------------------------------------------------------

def _slow_single_column(text, dtype):
    out = []
    for line in text.splitlines():
        for tok in line.split():
            try:
                out.append(dtype(tok))
            except ValueError:
                break
    return out


def test_native_formatting_matches_python_fuzz():
    from clustering_tpu.utils import textio_native
    if not textio_native.available():
        import pytest
        pytest.skip("native textio unavailable")
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.random(20000) * (10.0 ** rng.integers(-30, 30, 20000)
                             .astype(np.float64)),
        -rng.random(2000),
        rng.random(5000).astype(np.float32).astype(np.float64),
        np.array([0.0, -0.0, 1e-300, 1e300, 0.1, 2.5e-5])])
    want_e = ("\n".join("%e" % v for v in vals.tolist()) + "\n").encode()
    assert textio_native.format_e(vals) == want_e
    ints = np.concatenate([rng.integers(-2**62, 2**62, 10000),
                           np.array([0, -1, 2**62, -2**62])])
    want_i = ("\n".join(str(int(v)) for v in ints.tolist()) + "\n").encode()
    assert textio_native.format_i64(ints) == want_i
    n = 5000
    a = rng.integers(0, 10**6, n)
    b = rng.random(n).astype(np.float32).astype(np.float64)
    c = rng.integers(0, 10**6, n)
    d = rng.random(n).astype(np.float32).astype(np.float64)
    want_nn = ("".join(f"{int(x)} {'%g' % y} {int(z)} {'%g' % w}\n"
                       for x, y, z, w in zip(a, b, c, d))).encode()
    assert textio_native.format_nn(a, b, c, d) == want_nn


def test_fast_reader_matches_slow_loop(tmp_path):
    """The vectorized token reader must agree with (or fall back to) the
    exact per-token line-skip loop on adversarial content."""
    cases = [
        "# hdr\n1\n2\n3\n",
        "1 2 3\n4 5\n",                       # multiple tokens per line
        "# hdr\n\n  \n7\n8\n",                # blank lines
        "1\nfoo 2\n3\n",                      # garbage token skips line
        "1\n2.5.6 9\n3\n",                    # malformed numeric
        "1\n2 # trailing comment\n3\n",       # mid-line comment
        "1e3\n-2.5\n+4\n.5\n5.\n",            # exotic but valid tokens
        "# only comments\n# more\n9\n",
        "nan\n1\n",                           # charset fallback
        "  1\t2\r\n3\n",                      # mixed whitespace
    ]
    for k, text in enumerate(cases):
        p = tmp_path / f"case{k}.dat"
        p.write_text(text)
        want = _slow_single_column(text, float)
        got = io.read_single_column(str(p), float)
        np.testing.assert_array_equal(np.asarray(got, dtype=float),
                                      np.asarray(want, dtype=float),
                                      err_msg=str((k, text)))
    # int dtype: the slow loop rejects "3.0" as int and skips the line
    p = tmp_path / "ints.dat"
    p.write_text("1\n3.0 7\n2\n")
    assert io.read_single_column(str(p), int).tolist() == [1, 2]


def test_fast_table_reader_rejects_ragged(tmp_path):
    import pytest
    p = tmp_path / "ragged.dat"
    p.write_text("1 2 3\n4 5\n6 7 8\n")  # 8 tokens, not 3 per row
    from clustering_tpu.utils.io import _read_table_fast
    assert _read_table_fast(str(p)) is None
    with pytest.raises(ValueError):
        io.read_coords(str(p))
    p2 = tmp_path / "ragged2.dat"
    p2.write_text("1 2 3\n4 5 6 7 8 9\n")  # 9 tokens, avg 3 -- still ragged
    assert _read_table_fast(str(p2)) is None


def test_native_line_cols_matches_table_shapes():
    """Native uniform-width scan agrees with the table semantics the
    numpy validation enforced (blank lines skipped, CRLF and trailing
    unterminated lines handled, ragged rejected)."""
    from clustering_tpu.utils import textio_native
    if not textio_native.available():
        import pytest
        pytest.skip("native textio unavailable")
    cases = [
        (b"1 2\n3 4\n", 2),
        (b"1 2\n\n3 4\n", 2),          # blank line doesn't count
        (b"1 2\n3 4", 2),              # unterminated final line
        (b"1 2 3\n4 5\n", -1),         # ragged
        (b"1 2\r\n3 4\r\n", 2),        # CRLF
        (b"  1   2  \n 3 4\n", 2),     # extra whitespace
        (b"\n \n", 0),                 # whitespace only
        (b"", 0),
        (b"7", 1),
    ]
    for body, want in cases:
        assert textio_native.line_cols(body) == want, body


def test_fast_table_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.normal(size=(500, 4)).astype(np.float32)
    p = tmp_path / "coords.dat"
    np.savetxt(p, arr, fmt="%.8g", header="made by savetxt")
    got = io.read_coords(str(p))
    want = np.loadtxt(str(p), dtype=np.float32, ndmin=2, comments="#")
    np.testing.assert_array_equal(got, want)


def test_neighborhood_roundtrip_large(tmp_path):
    rng = np.random.default_rng(4)
    n = 2000
    nh_i = rng.integers(0, n, n)
    nh_d = rng.random(n).astype(np.float32)
    hd_i = rng.integers(0, n, n)
    hd_d = rng.random(n).astype(np.float32)
    p = tmp_path / "nn.dat"
    io.write_neighborhood(str(p), nh_i, nh_d, hd_i, hd_d, "# hdr\n")
    a, b, c, d = io.read_neighborhood(str(p))
    np.testing.assert_array_equal(a, nh_i)
    np.testing.assert_array_equal(c, hd_i)
    # %g keeps 6 significant digits (reference format)
    np.testing.assert_allclose(b, nh_d, rtol=1e-5)
    np.testing.assert_allclose(d, hd_d, rtol=1e-5)


def test_large_io_fast_paths_engaged(tmp_path):
    """1M-row read/write must use the fast paths (native or numpy), not
    the per-token loop -- generous wall-clock bound that only the Python
    loop would violate."""
    import time
    rng = np.random.default_rng(0)
    n = 1_000_000
    states = rng.integers(1, 5000, n)
    fes = (rng.random(n) * 8).astype(np.float32)
    cm = io.default_comments_map()
    t0 = time.perf_counter()
    io.write_clustered_trajectory(str(tmp_path / "s.dat"), states,
                                  "# h\n", cm)
    io.write_fes(str(tmp_path / "f.dat"), fes, "# h\n", cm)
    s2 = io.read_clustered_trajectory(str(tmp_path / "s.dat"))
    f2 = io.read_free_energies(str(tmp_path / "f.dat"))
    elapsed = time.perf_counter() - t0
    np.testing.assert_array_equal(s2, states)
    # %e keeps 7 significant digits (reference fe-file format)
    np.testing.assert_allclose(f2, fes, rtol=1e-6)
    assert elapsed < 30.0, f"1M-row IO round-trip took {elapsed:.1f}s"


def test_native_morton_order_matches_numpy():
    """The native morton_order_pad must replicate the numpy reference
    bit-for-bit (float64 quantization, stable tie order) -- engine
    layouts and the screening band order both ride on it."""
    import numpy as np
    from clustering_tpu.utils import textio_native
    if not textio_native.available() or textio_native.morton_order_pad(
            np.zeros((2, 2), dtype=np.float32)) is None:
        import pytest
        pytest.skip("native library unavailable")

    def ref(coords):
        c = np.asarray(coords, dtype=np.float64)
        n, d = c.shape
        bits = max(1, 62 // d)
        lo = c.min(axis=0)
        span = c.max(axis=0) - lo
        span[span == 0] = 1.0
        q = ((c - lo) / span * ((1 << bits) - 1)).astype(np.uint64)
        key = np.zeros(n, dtype=np.uint64)
        for b in range(bits):
            for k in range(d):
                key |= (((q[:, k] >> np.uint64(b)) & np.uint64(1))
                        << np.uint64(b * d + k))
        return np.argsort(key, kind="stable")

    rng = np.random.default_rng(11)
    for d in (1, 2, 4, 6):
        for n in (1, 9, 2048, 30000):
            c = rng.normal(size=(n, d)).astype(np.float32)
            if n >= 2048:
                c[::5] = c[1]  # tied keys exercise stable order
            order = textio_native.morton_order_pad(c)
            assert np.array_equal(order, ref(c))
            n_pad = n + 53
            o2, padded = textio_native.morton_order_pad(c, n_pad=n_pad)
            assert np.array_equal(o2, order)
            assert np.array_equal(padded[:n], c[order])
            assert (padded[n:] == np.float32(3e38)).all()
        c0 = np.zeros((777, d), dtype=np.float32)
        assert np.array_equal(textio_native.morton_order_pad(c0), ref(c0))
