"""spdb_spark — a PySpark-native spatial analytics engine.

A brand-new engine with the query/data-processing capabilities of the
jhuapl-boss/spdb spatial database (cuboid-tiled, Morton-indexed storage of
3D/4D volumetric data with cutout / write-merge / object-id queries /
resolution-hierarchy downsampling), re-expressed Spark-first:

- dense-array blocks -> a **block table** (1 row = 1 cuboid, binary blob)
  plus a **voxel table** (1 row = 1 voxel) that all operators run on;
- hand-coded pruning/merge tactics -> Catalyst: partition pruning,
  predicate pushdown, broadcast joins, partial/final aggregation, AQE;
- ctypes/OpenMP kernels -> built-in `pyspark.sql.functions` expressions
  (whole-stage codegen) with Arrow-batched pandas UDFs only for the
  block codec.

Beyond the reference surface it adds LLM-data-pipeline operators:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, and multimodal column
plumbing.
"""

from spdb_spark.constants import CUBOID_SIZE, NUM_HIERARCHY_LEVELS
from spdb_spark.morton import morton_encode, morton_decode, xyz_morton, morton_xyz

__version__ = "0.1.0"

__all__ = [
    "CUBOID_SIZE",
    "NUM_HIERARCHY_LEVELS",
    "morton_encode",
    "morton_decode",
    "xyz_morton",
    "morton_xyz",
]
