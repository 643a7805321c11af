import numpy as np
import pytest

from spmv_acc_tpu.formats import random_csr
from spmv_acc_tpu.formats.convert import csr_to_dense
from spmv_acc_tpu.io import load_matrix
from spmv_acc_tpu.io.binary import TP_BOOL, TP_INT, read_bin2, write_bin2
from spmv_acc_tpu.io.csr_text import read_csr_text, write_csr_text
from spmv_acc_tpu.io.matrix_market import read_mtx, write_mtx


@pytest.fixture
def sample(rng):
    return random_csr(20, 16, 80, seed=21)


def test_csr_text_roundtrip(tmp_path, sample, rng):
    rp, ci, v, shape = sample.to_numpy()
    x = rng.random(shape[1])
    path = tmp_path / "m.csr"
    write_csr_text(path, rp, ci, v, x)
    rp2, ci2, v2, x2, shape2 = read_csr_text(path)
    assert shape2 == shape
    assert np.array_equal(rp, rp2) and np.array_equal(ci, ci2)
    assert np.allclose(v, v2) and np.allclose(x, x2)


def test_bin2_roundtrip(tmp_path, sample):
    rp, ci, v, shape = sample.to_numpy()
    path = tmp_path / "m.bin2"
    write_bin2(path, rp, ci, v, shape)
    rp2, ci2, v2, shape2 = read_bin2(path)
    assert shape2 == shape
    assert np.array_equal(rp, rp2) and np.array_equal(ci, ci2) and np.allclose(v, v2)


def test_bin2_magic_check(tmp_path):
    path = tmp_path / "bad.bin2"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_bin2(path)


def test_bin2_bool_and_int(tmp_path, sample):
    rp, ci, v, shape = sample.to_numpy()
    path = tmp_path / "b.bin2"
    write_bin2(path, rp, ci, v, shape, val_type=TP_BOOL)
    _, _, v2, _ = read_bin2(path)
    assert np.all(v2 == 1.0)
    write_bin2(path, rp, ci, np.arange(len(v)), shape, val_type=TP_INT)
    _, _, v3, _ = read_bin2(path)
    assert np.array_equal(v3, np.arange(len(v)).astype(np.float64))


def test_mtx_general_roundtrip(tmp_path, sample):
    rp, ci, v, shape = sample.to_numpy()
    rows = np.repeat(np.arange(shape[0]), np.diff(rp))
    path = tmp_path / "m.mtx"
    write_mtx(path, rows, ci, v, shape)
    r2, c2, v2, shape2 = read_mtx(path)
    assert shape2 == shape
    d1 = csr_to_dense(rp, ci, v, shape)
    d2 = np.zeros(shape)
    d2[r2, c2] = v2
    assert np.allclose(d1, d2)


def test_mtx_symmetric_mirroring(tmp_path):
    # lower triangle of a symmetric 3x3
    path = tmp_path / "s.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% comment line\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "3 2 5.0\n"
        "3 3 7.0\n"
    )
    r, c, v, shape = read_mtx(path)
    d = np.zeros(shape)
    d[r, c] = v
    expected = np.array([[2.0, -1.0, 0], [-1.0, 0, 5.0], [0, 5.0, 7.0]])
    assert np.allclose(d, expected)


def test_mtx_pattern(tmp_path):
    path = tmp_path / "p.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n2 2 2\n1 1\n2 2\n"
    )
    r, c, v, shape = read_mtx(path)
    assert np.all(v == 1.0) and len(v) == 2


def test_mtx_skew_symmetric(tmp_path):
    path = tmp_path / "k.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n3 3 1\n2 1 4.0\n"
    )
    r, c, v, shape = read_mtx(path)
    d = np.zeros(shape)
    d[r, c] = v
    assert d[1, 0] == 4.0 and d[0, 1] == -4.0


def test_mtx_out_of_bounds(tmp_path):
    path = tmp_path / "oob.mtx"
    path.write_text("%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n")
    with pytest.raises(ValueError, match="out of bounds"):
        read_mtx(path)


def test_mtx_nnz_mismatch(tmp_path):
    path = tmp_path / "mm.mtx"
    path.write_text("%%MatrixMarket matrix coordinate real general\n2 2 3\n1 1 1.0\n")
    with pytest.raises(ValueError, match="mismatch non-zeros"):
        read_mtx(path)


def test_load_matrix_dispatch(tmp_path, sample, rng):
    rp, ci, v, shape = sample.to_numpy()
    x = rng.random(shape[1])
    p1 = tmp_path / "a.csr"
    write_csr_text(p1, rp, ci, v, x)
    rp1, ci1, v1, shape1, x1 = load_matrix(p1)
    assert x1 is not None and shape1 == shape
    p2 = tmp_path / "a.bin2"
    write_bin2(p2, rp, ci, v, shape)
    rp2, ci2, v2, shape2, x2 = load_matrix(p2)
    assert x2 is None and np.allclose(v1, v2)
