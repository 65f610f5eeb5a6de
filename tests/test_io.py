import numpy as np

from clustering_tpu.utils import io


def test_single_column_roundtrip(tmp_path):
    p = tmp_path / "col.dat"
    io.write_single_column(str(p), [3, 1, 2], "# a header\n")
    assert io.read_single_column(str(p), int) == [3, 1, 2]


def test_comment_lines_skipped(tmp_path):
    p = tmp_path / "col.dat"
    p.write_text("# comment\n1\n2\n# another\n3\n")
    assert io.read_single_column(str(p), int) == [1, 2, 3]


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
    assert io.read_single_column(str(p), int) == [1, 2, 3]


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
    assert io.read_single_column(p, float) == [0.5, 1.25]
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
