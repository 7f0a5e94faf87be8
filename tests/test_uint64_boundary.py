"""uint64 upper-range behavior (SURVEY §1.2 caveat).

The reference stores annotation ids as numpy uint64 (resource.py:480-512
maps uint64 channels to AnnotateCube64); Spark has no unsigned 64-bit
type, so the voxel DataFrame carries values as LongType (int64). The
documented contract this file pins:

- ids < 2^63 (everything the sequential reserve_ids allocator from 1 can
  ever hand out before exhausting 9.2e18 ids) are EXACT end-to-end:
  write -> blob -> voxel DataFrame -> id filter -> bbox -> dense cutout.
- ids >= 2^63 still round-trip the dense write->cutout path bit-exactly
  (the blob stores raw uint64 bytes; uint64 -> int64 -> uint64 is the
  two's-complement identity), but APPEAR as negative longs in the voxel
  DataFrame — callers filtering on such an id must pass the wrapped
  int64 representation. That wrapped-view caveat is the whole cost of
  LongType, and it never bites the reference's own id space.
"""

import numpy as np
import pytest

from spdb_spark.operators import voxel as V
from spdb_spark.store import CuboidStore

ID_MAX_SIGNED = 2**63 - 1  # largest id exact in both uint64 and int64
ID_WRAPPED = 2**64 - 1     # wraps to -1 in the LongType view


@pytest.fixture
def anno_store(spark, tmp_path):
    return CuboidStore(spark, str(tmp_path / "blocks"), datatype="uint64")


def _cube_with_boundary_ids():
    """One cuboid: background zeros, a small slab of id 2^63-1, one voxel
    of 2^63-2, one voxel of 2^64-1 (the wrapped probe)."""
    arr = np.zeros((16, 512, 512), dtype=np.uint64)
    arr[2:4, 10:20, 30:40] = np.uint64(ID_MAX_SIGNED)
    arr[5, 100, 200] = np.uint64(ID_MAX_SIGNED - 1)
    arr[7, 300, 400] = np.uint64(ID_WRAPPED)
    return arr


def test_dense_roundtrip_is_bit_exact_across_the_boundary(anno_store):
    data = _cube_with_boundary_ids()
    anno_store.write_cuboid(data, (0, 0, 0))
    out = anno_store.cutout((0, 0, 0), (512, 512, 16))
    assert out.dtype == np.uint64
    np.testing.assert_array_equal(out[0], data)


def test_id_filter_and_bbox_at_2_63_minus_1(anno_store):
    data = _cube_with_boundary_ids()
    anno_store.write_cuboid(data, (0, 0, 0))
    vox = anno_store.voxels()

    # filtered cutout through the store API
    only = anno_store.cutout(
        (0, 0, 0), (512, 512, 16), filter_ids=[ID_MAX_SIGNED]
    )
    expect = np.where(data == np.uint64(ID_MAX_SIGNED), data, np.uint64(0))
    np.testing.assert_array_equal(only[0], expect)

    # id_filter operator keeps exactly the slab + nothing else
    kept = V.id_filter(vox, [ID_MAX_SIGNED, ID_MAX_SIGNED - 1])
    assert kept.count() == 2 * 10 * 10 + 1

    tb = V.tight_bounding_box(vox, ID_MAX_SIGNED).collect()[0]
    assert (tb.x_min, tb.x_max) == (30, 39)
    assert (tb.y_min, tb.y_max) == (10, 19)
    assert (tb.z_min, tb.z_max) == (2, 3)
    lb = V.loose_bounding_box(vox, ID_MAX_SIGNED).collect()[0]
    assert (lb.x_min, lb.x_max) == (0, 511)
    assert (lb.z_min, lb.z_max) == (0, 15)


def test_ids_in_region_reports_boundary_ids_in_long_view(anno_store):
    data = _cube_with_boundary_ids()
    anno_store.write_cuboid(data, (0, 0, 0))
    ids = {
        r.id
        for r in V.ids_in_region(
            anno_store.voxels(), (0, 0, 0), (512, 512, 16)
        ).collect()
    }
    # 2^63-1 and 2^63-2 are exact; 2^64-1 surfaces as its wrapped long -1
    assert ids == {ID_MAX_SIGNED, ID_MAX_SIGNED - 1, -1}


def test_wrapped_id_filterable_via_two_complement_representation(anno_store):
    """The documented LongType behavior for ids >= 2^63: filter with the
    wrapped int64 value; the dense result still materializes the original
    uint64 bits."""
    data = _cube_with_boundary_ids()
    anno_store.write_cuboid(data, (0, 0, 0))
    wrapped = np.uint64(ID_WRAPPED).astype(np.int64)  # -1
    out = anno_store.cutout((0, 0, 0), (512, 512, 16), filter_ids=[int(wrapped)])
    assert out[0, 7, 300, 400] == np.uint64(ID_WRAPPED)
    assert out.sum(dtype=object) == int(ID_WRAPPED)  # nothing else kept
