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


def test_merge_kernel_truth_tables():
    """make_merge_voxels_to_blocks as a pure function: dense-overlay
    semantics per mode, empty-result suppression, and blob round-trip."""
    import numpy as np
    import pandas as pd

    from spdb_spark.codec import make_merge_voxels_to_blocks, unpack_array

    key = ("chan&0", 0, 0, 0, 0, 0)

    def pdf(rows):
        # rows: (side, x, y, z, value)
        return pd.DataFrame(
            {
                "side": [r[0] for r in rows],
                "x": [r[1] for r in rows],
                "y": [r[2] for r in rows],
                "z": [r[3] for r in rows],
                "value": [r[4] for r in rows],
            }
        )

    k_ov = make_merge_voxels_to_blocks("uint8", "overwrite")
    out = k_ov(key, pdf([("o", 1, 1, 1, 5), ("o", 2, 2, 2, 6), ("n", 1, 1, 1, 9), ("n", 3, 3, 3, 7)]))
    arr = unpack_array(out["blob"][0])
    assert arr[1, 1, 1] == 9 and arr[2, 2, 2] == 6 and arr[3, 3, 3] == 7
    assert int(out["morton"][0]) == 0

    k_ex = make_merge_voxels_to_blocks("uint8", "exception")
    arr = unpack_array(
        k_ex(key, pdf([("o", 1, 1, 1, 5), ("n", 1, 1, 1, 9), ("n", 3, 3, 3, 7)]))["blob"][0]
    )
    assert arr[1, 1, 1] == 5 and arr[3, 3, 3] == 7  # old wins, gaps fill

    k_tb = make_merge_voxels_to_blocks("uint8", "to_black")
    arr = unpack_array(
        k_tb(key, pdf([("o", 1, 1, 1, 5), ("o", 2, 2, 2, 6), ("n", 1, 1, 1, 1)]))["blob"][0]
    )
    assert arr[1, 1, 1] == 0 and arr[2, 2, 2] == 6  # mask==1 erases

    # a merge that empties the cuboid emits NO block row
    empty = k_tb(key, pdf([("o", 1, 1, 1, 5), ("n", 1, 1, 1, 1)]))
    assert len(empty) == 0

    # uint64 boundary ids survive the overlay bit-exactly
    k64 = make_merge_voxels_to_blocks("uint64", "overwrite")
    big = 2**63 - 1
    out = k64(key, pdf([("o", 0, 0, 0, big), ("n", 4, 4, 4, big - 1)]))
    arr = unpack_array(out["blob"][0])
    assert arr[0, 0, 0] == np.uint64(big) and arr[4, 4, 4] == np.uint64(big - 1)

    import pytest

    with pytest.raises(ValueError):
        make_merge_voxels_to_blocks("uint8", "bogus")
