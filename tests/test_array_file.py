"""Tests for the .dat array format (bitwise compat with the reference format:
self_defined/save_np_array_to_file.py / load_np_array_from_file.py)."""

import numpy as np
import pytest

from viterbi_spl_tpu.io import load_array, save_array


def test_roundtrip_1d(tmp_path):
    x = np.arange(7, dtype=np.float32)
    f = tmp_path / "x.dat"
    save_array(f, x, "x")
    name, y = load_array(f)
    assert name == "x"
    assert y.dtype == np.float32
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int64, np.int32])
def test_roundtrip_2d_c_order(tmp_path, dtype):
    x = np.arange(12, dtype=dtype).reshape(3, 4)
    f = tmp_path / "x.dat"
    save_array(f, x, "mat")
    name, y = load_array(f)
    assert name == "mat"
    assert y.dtype == dtype
    assert y.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(x, y)


def test_roundtrip_f_order(tmp_path):
    x = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    f = tmp_path / "x.dat"
    save_array(f, x, "fmat")
    name, y = load_array(f)
    assert y.flags["F_CONTIGUOUS"]
    np.testing.assert_array_equal(x, y)


def test_header_format_matches_reference(tmp_path):
    """The on-disk header must be '<name> <C|F> <dtype> <dims...>\\n' + raw bytes."""
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    f = tmp_path / "x.dat"
    save_array(f, x, "viterbi_init_probs")
    raw = f.read_bytes()
    header, _, body = raw.partition(b"\n")
    assert header == b"viterbi_init_probs C float32 2 3"
    assert body == x.tobytes()


def test_reads_reference_artifact_format(tmp_path):
    """Hand-written file in the reference's exact format loads correctly."""
    x = np.linspace(0, 1, 10, dtype=np.float32)
    f = tmp_path / "ref.dat"
    with open(f, "wb") as fh:
        fh.write(b"p_steady C float32 10\n")
        fh.write(x.tobytes())
    name, y = load_array(f)
    assert name == "p_steady"
    np.testing.assert_array_equal(x, y)


def test_reads_legacy_headerless_order(tmp_path):
    x = np.arange(4, dtype=np.int64)
    f = tmp_path / "legacy.dat"
    with open(f, "wb") as fh:
        fh.write(b"switch int64 4\n")
        fh.write(x.tobytes())
    name, y = load_array(f)
    assert name == "switch"
    np.testing.assert_array_equal(x, y)


def test_shipped_reference_artifacts_load():
    """The reference repo ships .dat artifacts; our loader must read them."""
    import os

    path = "/root/reference/msnet/viterbi_transition_matrix.dat"
    if not os.path.exists(path):
        pytest.skip("reference artifacts not mounted")
    name, mat = load_array(path)
    assert name == "viterbi_transition_matrix"
    assert mat.shape == (321, 321)
    assert mat.dtype == np.float32
    np.testing.assert_allclose(mat.sum(axis=1), 1.0, rtol=1e-5)

    name, pi = load_array("/root/reference/msnet/viterbi_init_probs.dat")
    assert name == "viterbi_init_probs"
    assert pi.shape == (321,)
    assert np.isclose(pi.sum(), 1.0)
