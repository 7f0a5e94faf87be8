"""Engine-wide constants.

Mirrors the reference tiling geometry: cuboid tile size 512 x 512 x 16
(x, y, z) at every one of 13 resolution levels
(reference: spdb/c_lib/ndtype.py:21 `CUBOIDSIZE = [[512, 512, 16]] * 13`).
"""

# (x, y, z) voxels per cuboid tile, identical at every resolution level.
CUBOID_SIZE = (512, 512, 16)
CUBOID_X, CUBOID_Y, CUBOID_Z = CUBOID_SIZE

# Number of resolution levels in the hierarchy (reference: ndtype.py:21).
NUM_HIERARCHY_LEVELS = 13

# Morton codes interleave 21 bits per axis -> 63-bit codes
# (reference: spdb/c_lib/c_version/zindex.c:27-49).
MORTON_BITS_PER_AXIS = 21

# Value 0 is the reserved "no data / background" sentinel; zero voxels are
# never stored (zero-suppression, reference: spatialdb.py:571-585).
BACKGROUND = 0

# Supported channel datatypes (reference: resource.py:480-512). Spark has no
# unsigned types; values are widened to signed LongType in the voxel table.
CHANNEL_DATATYPES = ("uint8", "uint16", "uint64")
