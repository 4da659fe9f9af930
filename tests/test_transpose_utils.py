"""Transpose variants + rcutil small utilities."""
import numpy as np
import pytest

from turborc_tpu.transforms import transpose as tp


@pytest.mark.parametrize("esize", [2, 3, 4, 8])
def test_tpenc_inverts(rng, esize):
    data = rng.integers(0, 256, 1000 + 1).astype(np.uint8)
    np.testing.assert_array_equal(tp.tpdec(tp.tpenc(data, esize), esize),
                                  data)


@pytest.mark.parametrize("dims", [(8, 16), (4, 5, 6), (2, 3, 4, 5)])
def test_tpenc_nd_inverts(rng, dims):
    esize = 2
    n = int(np.prod(dims)) * esize + 3
    data = rng.integers(0, 256, n).astype(np.uint8)
    if len(dims) == 2:
        enc = tp.tpenc2d(data, dims[0], dims[1], esize)
        dec = tp.tpdec2d(enc, dims[0], dims[1], esize)
    else:
        enc = tp.tpenc_nd(data, dims, esize)
        dec = tp.tpdec_nd(enc, dims, esize)
    np.testing.assert_array_equal(dec, data)


@pytest.mark.parametrize("esize", [2, 4])
def test_tp4_inverts(rng, esize):
    data = rng.integers(0, 256, 512 * esize + 1).astype(np.uint8)
    np.testing.assert_array_equal(tp.tp4dec(tp.tp4enc(data, esize), esize),
                                  data)


def test_histogram_memrun(rng):
    data = np.array([7, 7, 7, 2, 2, 9], np.uint8)
    assert tp.memrun(data) == 3
    assert tp.memrun(np.zeros(0, np.uint8)) == 0
    assert tp.memrun(np.full(5, 1, np.uint8)) == 5
    h = tp.histogram(data)
    assert h[7] == 3 and h[2] == 2 and h[9] == 1 and h.sum() == 6


@pytest.mark.parametrize("width", [1, 3, 7, 12])
def test_bitenc_inverts(rng, width):
    vals = rng.integers(0, 1 << width, 777).astype(np.uint64)
    packed = tp.bitenc(vals, width)
    assert packed.shape[0] == -(-777 * width // 8)
    np.testing.assert_array_equal(tp.bitdec(packed, width, 777), vals)
