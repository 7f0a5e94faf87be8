"""Blob codec round-trips (reference analog: blosc round-trip tests,
test_cube.py:299-400)."""

import numpy as np
import pytest

from spdb_spark.codec import blob_dtype, pack_array, unpack_array


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint64"])
def test_pack_unpack_roundtrip(dtype):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 200, size=(16, 512, 512)).astype(dtype)
    blob = pack_array(arr)
    out = unpack_array(blob)
    assert out.dtype == np.dtype(dtype)
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)
    assert blob_dtype(blob) == dtype


def test_pack_rejects_non_3d():
    with pytest.raises(ValueError):
        pack_array(np.zeros((4, 4), dtype="uint8"))


def test_compression_shrinks_sparse():
    arr = np.zeros((16, 512, 512), dtype="uint64")
    arr[0, 0, 0] = 7
    blob = pack_array(arr)
    assert len(blob) < arr.nbytes / 100
