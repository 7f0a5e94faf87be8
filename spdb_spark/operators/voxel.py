"""Voxel-table operators — the engine's query surface (SURVEY.md §2).

Every operator is a pure DataFrame transformation on the voxel layout
(t, x, y, z, value [, lookup_key, resolution]); Catalyst supplies pruning,
pushdown, broadcast selection, and partial/final aggregation. Value 0 is the
background sentinel and is never stored (zero-suppression), so "zero out"
semantics become row filters and "missing = zero" becomes left-join+coalesce.

Reference parity notes cite /root/reference file:line for the semantics each
operator reproduces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spdb_spark.constants import CUBOID_X, CUBOID_Y, CUBOID_Z
from spdb_spark.session import truncate_lineage

VOXEL_KEY = ["t", "x", "y", "z"]


# ---------------------------------------------------------------------------
# Scans / filters (reference: spatialdb.py cutout 360-717, filterCutoutOMP.c)
# ---------------------------------------------------------------------------

def box_predicate(
    corner: Sequence[int],
    extent: Sequence[int],
    t_range: Sequence[int] | None = None,
) -> Column:
    """Half-open box predicate [corner, corner+extent) — the cutout filter
    (reference: spatialdb.py:451-475). Pushes down to parquet scans."""
    (x0, y0, z0), (dx, dy, dz) = corner, extent
    p = (
        (F.col("x") >= x0) & (F.col("x") < x0 + dx)
        & (F.col("y") >= y0) & (F.col("y") < y0 + dy)
        & (F.col("z") >= z0) & (F.col("z") < z0 + dz)
    )
    if t_range is not None:
        p = p & (F.col("t") >= t_range[0]) & (F.col("t") < t_range[1])
    return p


def cutout(
    v: DataFrame,
    corner: Sequence[int],
    extent: Sequence[int],
    t_range: Sequence[int] | None = None,
    filter_ids: Sequence[int] | None = None,
) -> DataFrame:
    """THE read operator (reference: spatialdb.py:360-717): box read with
    optional id filter. Absent rows are implicit zeros — no trim/zero-fill
    materialization needed in the sparse representation."""
    out = v.where(box_predicate(corner, extent, t_range))
    if filter_ids is not None:
        out = id_filter(out, filter_ids)
    return out


def id_filter(v: DataFrame, ids: Sequence[int] | DataFrame) -> DataFrame:
    """Keep only voxels whose value is in `ids`; everything else becomes
    background (= row dropped). Parity: filterCutoutOMP.c:23-74 zeroes
    non-matching voxels of a dense cutout.

    Small literal lists compile to an `IN` (whole-stage codegen); a DataFrame
    of ids becomes a broadcast left-semi join (the 100TB path for large sets).
    """
    if isinstance(ids, DataFrame):
        ids_df = ids.toDF("value").distinct()
        return v.join(F.broadcast(ids_df), on="value", how="left_semi")
    return v.where(F.col("value").isin(list(ids)))


def with_cuboid_coords(v: DataFrame) -> DataFrame:
    """Attach cuboid-grid coords + Morton code (reference: zindex.c:27-49,
    cuboid decomposition spatialdb.py:451-475)."""
    from spdb_spark.morton import morton_encode

    xi = F.floor(F.col("x") / CUBOID_X).cast("long")
    yi = F.floor(F.col("y") / CUBOID_Y).cast("long")
    zi = F.floor(F.col("z") / CUBOID_Z).cast("long")
    return (
        v.withColumn("x_idx", xi)
        .withColumn("y_idx", yi)
        .withColumn("z_idx", zi)
        .withColumn("morton", morton_encode(F.col("x_idx"), F.col("y_idx"), F.col("z_idx")))
    )


# ---------------------------------------------------------------------------
# Id queries (reference: object.py:778-857, object_indices.py:373-623)
# ---------------------------------------------------------------------------

def ids_in_region(
    v: DataFrame, corner: Sequence[int], extent: Sequence[int],
    t_range: Sequence[int] | None = None,
) -> DataFrame:
    """Distinct non-zero ids in a box (reference: get_ids_in_region,
    object.py:778-831). One partial+final distinct agg replaces the
    reference's interior-index/boundary-cutout split."""
    return (
        v.where(box_predicate(corner, extent, t_range))
        .where(F.col("value") != 0)
        .select(F.col("value").alias("id"))
        .distinct()
    )


def tight_bounding_box(v: DataFrame, obj_id: int) -> DataFrame:
    """Exact per-axis min/max of an id (reference: get_tight_bounding_box,
    object_indices.py:434-623 — six slab cutouts collapse to one agg)."""
    return (
        v.where(F.col("value") == obj_id)
        .agg(
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"),
            F.min("z").alias("z_min"), F.max("z").alias("z_max"),
        )
    )


def loose_bounding_box(v: DataFrame, obj_id: int) -> DataFrame:
    """Cuboid-aligned bbox (reference: get_loose_bounding_box,
    object_indices.py:373-432): tight bounds rounded out to tile boundaries."""
    tb = tight_bounding_box(v, obj_id)
    return tb.select(
        (F.floor(F.col("x_min") / CUBOID_X) * CUBOID_X).cast("long").alias("x_min"),
        ((F.floor(F.col("x_max") / CUBOID_X) + 1) * CUBOID_X - 1).cast("long").alias("x_max"),
        (F.floor(F.col("y_min") / CUBOID_Y) * CUBOID_Y).cast("long").alias("y_min"),
        ((F.floor(F.col("y_max") / CUBOID_Y) + 1) * CUBOID_Y - 1).cast("long").alias("y_max"),
        (F.floor(F.col("z_min") / CUBOID_Z) * CUBOID_Z).cast("long").alias("z_min"),
        ((F.floor(F.col("z_max") / CUBOID_Z) + 1) * CUBOID_Z - 1).cast("long").alias("z_max"),
    )


def cuboid_id_index(v: DataFrame) -> DataFrame:
    """Per-cuboid distinct-id pairs — the materialized id index that replaces
    the reference's DynamoDB id-set attributes (object_indices.py:625-769)."""
    return (
        with_cuboid_coords(v)
        .where(F.col("value") != 0)
        .select("morton", F.col("value").alias("id"))
        .distinct()
    )


def cuboids_containing_id(v: DataFrame, obj_id: int) -> DataFrame:
    """id -> cuboids containing it (reference: ObjectIndices.get_cuboids,
    object_indices.py:262-301)."""
    return (
        with_cuboid_coords(v.where(F.col("value") == obj_id))
        .select("morton")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Merge family (reference: overwriteDense.c, exceptionDense.c, shaveDense.c,
# cube.py:264-291; write path spatialdb.py:719-867)
# ---------------------------------------------------------------------------

def overwrite_merge(old: DataFrame, new: DataFrame) -> DataFrame:
    """Non-zero voxels of `new` overwrite `old` (overwriteDense.c:27-96).
    Inputs must be keyed (one row per coordinate)."""
    n = new.select(*VOXEL_KEY, F.col("value").alias("new_value"))
    return (
        old.join(n, on=VOXEL_KEY, how="full_outer")
        .select(
            *VOXEL_KEY,
            F.coalesce(
                F.nullif(F.col("new_value"), F.lit(0)), F.col("value"), F.lit(0)
            ).alias("value"),
        )
        .where(F.col("value") != 0)
    )


def exception_merge(old: DataFrame, new: DataFrame) -> DataFrame:
    """Fill-only merge: new voxel lands only where old is background
    (exceptionDense.c:25-42)."""
    n = new.select(*VOXEL_KEY, F.col("value").alias("new_value"))
    return (
        old.join(n, on=VOXEL_KEY, how="full_outer")
        .select(
            *VOXEL_KEY,
            F.coalesce(F.col("value"), F.col("new_value"), F.lit(0)).alias("value"),
        )
        .where(F.col("value") != 0)
    )


def shave_merge(old: DataFrame, mask: DataFrame) -> DataFrame:
    """Zero out old voxels wherever mask is non-zero (shaveDense.c:25-42) —
    an anti-join in the sparse representation."""
    m = mask.where(F.col("value") != 0).select(*VOXEL_KEY)
    return old.join(m, on=VOXEL_KEY, how="left_anti")


def _tagged_union(old: DataFrame, new: DataFrame):
    """(key, o_val, n_val) union of two voxel sets — the substrate for the
    single-shuffle merge forms. NULL marks an absent side (a genuine 0
    value stays 0, matching the join forms' semantics)."""
    o = old.select(
        *VOXEL_KEY,
        F.col("value").alias("o_val"),
        F.lit(None).cast("long").alias("n_val"),
    )
    n = new.select(
        *VOXEL_KEY,
        F.lit(None).cast("long").alias("o_val"),
        F.col("value").alias("n_val"),
    )
    return (
        o.unionByName(n)
        .groupBy(*VOXEL_KEY)
        .agg(F.max("o_val").alias("o_val"), F.max("n_val").alias("n_val"))
    )


def overwrite_merge_union(old: DataFrame, new: DataFrame) -> DataFrame:
    """overwrite_merge as ONE partial-aggregating shuffle: tag-union both
    sides and resolve per coordinate in a single groupBy. The full-outer
    join form exchanges THREE times at scale (old hash, new hash, and
    both sides' sort/merge); this form exchanges the union once, with
    map-side partials. Same output for keyed inputs (test-pinned); inputs
    carrying duplicate coordinates additionally resolve by MAX per side —
    the upstream dedup the join form requires is absorbed, the same
    composition the downsample entries exploit."""
    return (
        _tagged_union(old, new)
        .select(
            *VOXEL_KEY,
            F.coalesce(
                F.nullif(F.col("n_val"), F.lit(0)), F.col("o_val"), F.lit(0)
            ).alias("value"),
        )
        .where(F.col("value") != 0)
    )


def exception_merge_union(old: DataFrame, new: DataFrame) -> DataFrame:
    """exception_merge (fill-only) as one shuffle — see
    overwrite_merge_union."""
    return (
        _tagged_union(old, new)
        .select(
            *VOXEL_KEY,
            F.coalesce(F.col("o_val"), F.col("n_val"), F.lit(0)).alias("value"),
        )
        .where(F.col("value") != 0)
    )


def shave_merge_union(old: DataFrame, mask: DataFrame) -> DataFrame:
    """shave_merge as one shuffle: the mask side unions in as a hit flag;
    surviving rows are old voxels whose coordinate saw no non-zero mask."""
    agg = _tagged_union(old, mask.where(F.col("value") != 0))
    return agg.where(F.col("n_val").isNull() & F.col("o_val").isNotNull()).select(
        *VOXEL_KEY, F.col("o_val").alias("value")
    )


def overwrite_to_black(old: DataFrame, mask: DataFrame) -> DataFrame:
    """cutout-to-black erase: zero old voxels where mask==1
    (cube.py:264-291, write path spatialdb.py:793-801)."""
    m = mask.where(F.col("value") == 1).select(*VOXEL_KEY)
    return old.join(m, on=VOXEL_KEY, how="left_anti")


def mask_by_annotation(
    image: DataFrame,
    annotation: DataFrame,
    ids: Sequence[int] | None = None,
) -> DataFrame:
    """Cross-channel read: image voxels where the co-located annotation
    channel holds (one of) the given object id(s) — the workflow the
    reference's channel `sources`/`related` links exist for
    (resource.py:246-259): extract an object's image intensities.

    Equi-join on the voxel key; the annotation side is pre-filtered so only
    masked coordinates shuffle. Output adds the annotation id alongside the
    image value."""
    a = annotation.where(F.col("value") != 0)
    if ids is not None:
        a = a.where(F.col("value").isin(list(ids)))
    a = a.select(*VOXEL_KEY, F.col("value").alias("anno_id"))
    return image.join(a, on=VOXEL_KEY, how="inner").select(
        *VOXEL_KEY, "value", "anno_id"
    )


# ---------------------------------------------------------------------------
# Annotation mutation (reference: annotateCube.c, shaveCube.c, mergeCube.c,
# annotateEntityDense.c)
# ---------------------------------------------------------------------------

def annotate(
    data: DataFrame,
    locations: DataFrame,
    annid: int,
    conflict: str = "O",
) -> tuple[DataFrame, DataFrame | None]:
    """Sparse voxel-list labeling with conflict policy
    (annotateCube.c:27-79): 'O' overwrite, 'P' preserve existing,
    'E' preserve + emit exceptions (already-labeled locations).

    Returns (result, exceptions); exceptions is None unless conflict='E'.
    """
    if conflict not in ("O", "P", "E"):
        raise ValueError(f"conflict must be O/P/E, got {conflict!r}")
    locs = locations.select(*VOXEL_KEY).distinct().withColumn("_loc", F.lit(1))
    joined = data.join(locs, on=VOXEL_KEY, how="full_outer")
    is_loc = F.col("_loc").isNotNull()
    old = F.coalesce(F.col("value"), F.lit(0))
    if conflict == "O":
        value = F.when(is_loc, F.lit(annid)).otherwise(old)
    else:  # P and E both preserve already-labeled voxels
        value = F.when(is_loc & (old == 0), F.lit(annid)).otherwise(old)
    result = (
        joined.select(*VOXEL_KEY, value.alias("value"))
        .where(F.col("value") != 0)
    )
    exceptions = None
    if conflict == "E":
        exceptions = (
            joined.where(is_loc & (old != 0) & (old != annid))
            .select(*VOXEL_KEY)
        )
    return result, exceptions


def shave_id(
    data: DataFrame, locations: DataFrame, annid: int
) -> tuple[DataFrame, DataFrame]:
    """Sparse unlabel (shaveCube.c:25-65): zero listed voxels where
    value == annid. Returns (result, exceptions=listed voxels holding a
    different non-zero id)."""
    locs = locations.select(*VOXEL_KEY).distinct().withColumn("_loc", F.lit(1))
    joined = data.join(locs, on=VOXEL_KEY, how="left")
    is_loc = F.col("_loc").isNotNull()
    result = (
        joined.where(~(is_loc & (F.col("value") == annid)))
        .select(*VOXEL_KEY, "value")
    )
    exceptions = (
        joined.where(is_loc & (F.col("value") != annid) & (F.col("value") != 0))
        .select(*VOXEL_KEY)
    )
    return result, exceptions


def relabel(v: DataFrame, old_id: int, new_id: int) -> DataFrame:
    """value==old_id -> new_id (mergeCube.c:22-45)."""
    return v.withColumn(
        "value",
        F.when(F.col("value") == old_id, F.lit(new_id)).otherwise(F.col("value")),
    )


def relabel_all(v: DataFrame, entity_id: int) -> DataFrame:
    """All non-zero voxels -> one id (annotateEntityDense.c:25-42)."""
    return v.withColumn(
        "value", F.when(F.col("value") != 0, F.lit(entity_id)).otherwise(F.lit(0))
    ).where(F.col("value") != 0)


def relabel_with_map(v: DataFrame, mapping: DataFrame) -> DataFrame:
    """General relabel against a (old_id, new_id) map — broadcast join
    (generalizes mergeCube.c to bulk merges)."""
    m = mapping.toDF("old_id", "new_id")
    return (
        v.join(F.broadcast(m), v.value == m.old_id, "left")
        .select(*VOXEL_KEY, F.coalesce(F.col("new_id"), F.col("value")).alias("value"))
    )


# ---------------------------------------------------------------------------
# Resolution hierarchy (reference: zoomData.c, addData.c, isotropicBuild.c,
# resource.py:21-118)
# ---------------------------------------------------------------------------

def downsample_image_stride(v: DataFrame, factor: int = 1) -> DataFrame:
    """Stride-sampled (top-left pick) xy zoom-out by 2**factor
    (zoomOutData, zoomData.c:28-75)."""
    p = 2**factor
    return (
        v.where((F.col("x") % p == 0) & (F.col("y") % p == 0))
        .select(
            "t",
            (F.col("x") / p).cast("long").alias("x"),
            (F.col("y") / p).cast("long").alias("y"),
            "z",
            "value",
        )
    )


def downsample_image_avg(v: DataFrame, factor: int = 1) -> DataFrame:
    """Average-pooling xy downsample (Spark-native quality upgrade over the
    stride pick; the agg is partial/final so it scales shuffle-light)."""
    p = 2**factor
    return (
        v.groupBy(
            "t",
            F.floor(F.col("x") / p).cast("long").alias("x"),
            F.floor(F.col("y") / p).cast("long").alias("y"),
            "z",
        )
        .agg(F.avg("value").alias("value"))
    )


def connected_components(
    v: DataFrame,
    max_iter: int = 30,
    same_value_only: bool = True,
    checkpoint_every: int | None = 5,
    probe_every: int = 2,
) -> DataFrame:
    """3D connected-component labeling over the 6-neighborhood: label every
    non-zero voxel with the minimum Morton-style scalar key of its
    component (iterative min-label propagation; converges in O(diameter)
    rounds, checked each round).

    `same_value_only` restricts components to runs of equal value (label a
    segmentation); False treats all non-zero voxels as one foreground mask.
    The reference stores segmentations but cannot compute them — this is
    the parity-plus operator that closes that loop. Returns
    (t, x, y, z, value, component).

    Keys: the 6-neighborhood never crosses time samples, so propagation is
    keyed on (t, vid) with vid the z-major packing (z<<42)|(y<<21)|x —
    21 bits per axis, the engine's full coordinate range, exactly filling a
    signed long. (t, component) identifies a component; `component` decodes
    to the component's canonical voxel (its z-major minimum), which makes
    labels deterministic and oracle-hashable. Coordinates outside
    [0, 2^21) raise rather than silently merging unrelated components."""
    lim = F.lit(1 << 21)
    in_range = (
        (F.col("x") >= 0) & (F.col("x") < lim)
        & (F.col("y") >= 0) & (F.col("y") < lim)
        & (F.col("z") >= 0) & (F.col("z") < lim)
    )
    packed = (
        (F.col("z").cast("long") * F.lit(1 << 42))
        + (F.col("y").cast("long") * F.lit(1 << 21))
        + F.col("x").cast("long")
    )
    key = ["t", "vid"]
    vox = v.where(F.col("value") != 0).select(
        "t", "x", "y", "z", "value",
        F.when(in_range, packed)
        .otherwise(
            F.expr(
                "raise_error('connected_components: coordinate out of"
                " [0, 2^21) packable range')"
            ).cast("long")
        )
        .alias("vid"),
    ).persist()
    value_cond = (
        (F.col("a.value") == F.col("b.value")) if same_value_only else F.lit(True)
    )
    neighbor_offsets = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    edges = None
    for dx, dy, dz in neighbor_offsets:
        e = (
            vox.alias("a")
            .join(
                vox.alias("b"),
                (F.col("a.t") == F.col("b.t"))
                & (F.col("b.x") == F.col("a.x") + dx)
                & (F.col("b.y") == F.col("a.y") + dy)
                & (F.col("b.z") == F.col("a.z") + dz)
                & value_cond,
            )
            .select(
                F.col("a.t").alias("t"),
                F.col("a.vid").alias("src"),
                F.col("b.vid").alias("dst"),
            )
        )
        edges = e if edges is None else edges.unionByName(e)
    edges = edges.union(
        edges.select("t", F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

    labels = vox.select(*key, F.col("vid").alias("component")).persist()
    pending: list = [labels]  # persisted handles awaiting a probe
    since_probe = 0
    for it in range(max_iter):
        if it == 0:
            # Fused init round (see dedup.dup_clusters): starting labels
            # are the identity (component = vid), so the first round's
            # neighbor minimum is min(dst) straight off the edge table —
            # no join against the trivial labels. Isolated voxels still
            # enter through the left join below.
            nbr_min = (
                edges.groupBy("t", "src")
                .agg(F.min("dst").alias("nbr_min"))
                .select(F.col("t").alias("nt"), "src", "nbr_min")
            )
        else:
            nbr_min = (
                edges.join(
                    labels,
                    (edges.t == labels.t) & (edges.dst == labels.vid),
                )
                .groupBy(edges.t, "src")
                .agg(F.min("component").alias("nbr_min"))
                .select(F.col("t").alias("nt"), "src", "nbr_min")
            )
        # _chg rides along instead of a separate new-vs-old join (see
        # dedup.dup_clusters): the new label is least(old, nbr_min), so
        # "changed" is exactly "nbr_min < old component" — the probe is a
        # limit(1) scan of the frame this round materializes anyway.
        new_full = labels.join(
            nbr_min,
            (labels.t == nbr_min.nt) & (labels.vid == nbr_min.src),
            "left",
        ).select(
            labels.t,
            "vid",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_min"), F.col("component")),
            ).alias("component"),
            (F.col("nbr_min") < F.col("component")).alias("_chg"),
        )
        # truncate lineage periodically: O(diameter) rounds would otherwise
        # nest the plan O(diameter) deep and Catalyst re-analyzes the whole
        # tree each round (see dedup.dup_clusters for the cluster-mode note)
        ckpt = bool(checkpoint_every) and (it + 1) % checkpoint_every == 0
        if ckpt:
            new_full = truncate_lineage(new_full, eager=True)
        else:
            new_full = new_full.persist()
        labels = new_full.select(*key, "component")
        since_probe += 1
        # Batched convergence probe (see dedup.dup_clusters): the limit(1)
        # count is a driver-synchronized job, so probing every round
        # serializes the loop into one job per iteration. Probe on
        # checkpoint rounds (that job already ran), on round 0 (so
        # already-converged volumes — the common small-object case — exit
        # without extra rounds), and every probe_every-th round otherwise;
        # skipped rounds stay lazy and pipeline into the next probe's job.
        # Convergence only needs the LATEST round's _chg, so the result is
        # value-identical for any probe_every >= 1 (a converged round
        # recomputes identical labels).
        if ckpt or it == 0 or since_probe >= max(1, probe_every):
            changed = new_full.where(F.col("_chg")).limit(1).count()
            since_probe = 0
            # new_full is materialized now — earlier handles are dead
            # weight; keep new_full itself in pending so the final cleanup
            # releases it too (including on the break path).
            for h in pending:
                h.unpersist()
            pending = [new_full]
            if changed == 0:
                break
        else:
            pending.append(new_full)
    # materialize the returned labels BEFORE dropping the caches they read
    if checkpoint_every:
        labels = truncate_lineage(labels, eager=True)
    for h in pending:
        h.unpersist()
    edges.unpersist()
    out = vox.join(labels, key).select("t", "x", "y", "z", "value", "component")
    vox.unpersist()
    return out


def smooth_xy(v: DataFrame, radius: int = 1) -> DataFrame:
    """(2r+1)^2 xy box smoothing: each voxel's contribution explodes to its
    neighbor positions (map-side, no join), then one partial/final agg sums
    per target — absent voxels count as zeros, divisor is the full window
    area. Scatter+agg beats a 9-way self-join: one shuffle, no skew."""
    k = 2 * radius + 1
    area = float(k * k)
    offs = F.sequence(F.lit(-radius), F.lit(radius)).cast("array<long>")
    scattered = (
        v.select("t", "x", "y", "z", "value", F.explode(offs).alias("dx"))
        .select("t", "x", "y", "z", "value", "dx", F.explode(offs).alias("dy"))
        .select(
            "t",
            (F.col("x") + F.col("dx")).alias("x"),
            (F.col("y") + F.col("dy")).alias("y"),
            "z",
            "value",
        )
    )
    return scattered.groupBy("t", "x", "y", "z").agg(
        (F.sum("value") / area).alias("value")
    )


def surface_stats(v: DataFrame) -> DataFrame:
    """Per-object surface statistics: a voxel of id k is SURFACE when any
    of its 6 face-neighbors is not also id k (different id or absent).
    Returns (anno_id, n_surface, n_total) — surface area + volume per
    segmented object (parity-plus: the reference stores segmentations
    but has no morphometry operator; cf. get_ids_in_region
    object.py:778-831 which only enumerates ids).

    Shape: each voxel scatters its id to its 6 neighbor positions
    (map-side explode), unioned with the voxels themselves; ONE
    partial/final agg per (position, id) counts same-id neighbors, and a
    voxel is interior iff it received all 6. No self-join — the 6-way
    neighborhood join becomes a single shuffle, skew-free at any volume."""
    g = (
        _scatter_union(v)
        .groupBy("t", "x", "y", "z", "value")
        .agg(F.sum("present").alias("p"), F.sum("nbr").alias("n"))
    )
    return (
        g.where(F.col("p") > 0)
        .groupBy(F.col("value").alias("anno_id"))
        .agg(
            F.sum(F.when(F.col("n") < 6, 1).otherwise(0))
            .cast("long")
            .alias("n_surface"),
            F.count("*").alias("n_total"),
        )
    )


def downsample_image_box(v: DataFrame, factor: int = 1) -> DataFrame:
    """Dense box-filter downsample: SUM over the 2^f x 2^f xy window divided
    by the FULL window area (absent voxels count as zeros — matching the
    dense-array average a C kernel would compute, unlike
    downsample_image_avg which averages present voxels only)."""
    p = 2**factor
    area = float(p * p)
    return (
        v.groupBy(
            "t",
            F.floor(F.col("x") / p).cast("long").alias("x"),
            F.floor(F.col("y") / p).cast("long").alias("y"),
            "z",
        )
        .agg((F.sum("value") / area).alias("value"))
    )


def upsample_replicate(v: DataFrame, factor: int = 1) -> DataFrame:
    """Zoom-in by replication (zoomInData, zoomData.c:79-148): each voxel
    expands to a 2**factor square in xy (explode of generated offsets — no
    shuffle, no join)."""
    p = 2**factor
    offs = F.explode(F.sequence(F.lit(0), F.lit(p - 1))).alias("d")
    return (
        v.select("*", offs)
        .withColumnRenamed("d", "dx")
        .select("*", offs)
        .withColumnRenamed("d", "dy")
        .select(
            "t",
            (F.col("x") * p + F.col("dx")).alias("x"),
            (F.col("y") * p + F.col("dy")).alias("y"),
            "z",
            "value",
        )
    )


def _get_ann_value(v00: Column, v01: Column, v10: Column, v11: Column) -> Column:
    """Exact port of getAnnValue (addData.c:28-48) including its quirk: when
    the running value is still 0 at the v11 step, the C code assigns v10 (not
    v11). Order-dependent — NOT a plain mode."""
    a = F.when(v00 == 0, v01).otherwise(v00)
    b = (
        F.when((v10 != 0) & (a == 0), v10)
        .when((v10 != 0) & ((v10 == v00) | (v10 == v01)), v10)
        .otherwise(a)
    )
    c = (
        F.when((v11 != 0) & (b == 0), v10)  # reference quirk: v10, not v11
        .when((v11 != 0) & ((v11 == v00) | (v11 == v01) | (v11 == v10)), v11)
        .otherwise(b)
    )
    return c


def _pivot_2x2(v: DataFrame, zdiv: bool):
    """Group voxels into 2x2 xy windows (optionally 2-deep z pairs) and pivot
    the four corners into columns. Missing corners are background (0)."""
    gz = (F.floor(F.col("z") / 2) if zdiv else F.col("z")).cast("long").alias("z")
    zsel = (F.col("z") % 2).alias("zs") if zdiv else F.lit(0).alias("zs")
    corner = lambda xs, ys, zs: F.coalesce(  # noqa: E731
        F.max(
            F.when(
                (F.col("xs") == xs) & (F.col("ys") == ys) & (F.col("zs") == zs),
                F.col("value"),
            )
        ),
        F.lit(0),
    )
    g = (
        v.select(
            "t",
            F.floor(F.col("x") / 2).cast("long").alias("x"),
            F.floor(F.col("y") / 2).cast("long").alias("y"),
            gz,
            (F.col("x") % 2).alias("xs"),
            (F.col("y") % 2).alias("ys"),
            zsel,
            "value",
        )
        .groupBy("t", "x", "y", "z")
    )
    return g, corner


def downsample_annotation(v: DataFrame, isotropic: bool = False) -> DataFrame:
    """Annotation pyramid reduction (addDataZSlice / addAnnotationData,
    addData.c:75-96, :144-202): each 2x2 xy window (and z-pair when
    isotropic) reduces via getAnnValue; isotropic falls back to the lower z
    slice's window when the upper yields background.

    Input must be keyed (one row per coordinate). Implemented as a single
    groupBy with conditional-max corner pivots — partial aggregation
    map-side, one shuffle, no UDF.
    """
    g, corner = _pivot_2x2(v, zdiv=isotropic)
    top = [corner(0, 0, 0), corner(1, 0, 0), corner(0, 1, 0), corner(1, 1, 0)]
    if not isotropic:
        out = g.agg(_get_ann_value(*top).alias("value"))
    else:
        bot = [corner(0, 0, 1), corner(1, 0, 1), corner(0, 1, 1), corner(1, 1, 1)]
        v_top = _get_ann_value(*top)
        v_bot = _get_ann_value(*bot)
        out = g.agg(F.when(v_top != 0, v_top).otherwise(v_bot).alias("value"))
    return out.where(F.col("value") != 0)


def isotropic_build(v: DataFrame, float_values: bool = False) -> DataFrame:
    """Average consecutive z-slice pairs treating 0 as missing
    (isotropicBuild.c:27-106): out = a if b==0 else b if a==0 else (a+b)/2.
    Truncating integer average like the C code.

    `float_values=True` is the legacy float32 variant
    (isotropicBuildF32, isotropicBuild.c:88-106 / ndlib.py:441-442):
    identical 0-is-missing selection but a non-truncating float average
    (value column comes back as double). The uint32 C variants
    (ndlib.py:45-47) need no separate path — every kernel here is a
    dtype-agnostic Catalyst expression over the long value column."""
    pair = (
        v.select(
            "t", "x", "y",
            F.floor(F.col("z") / 2).cast("long").alias("z"),
            (F.col("z") % 2).alias("zs"),
            "value",
        )
        .groupBy("t", "x", "y", "z")
        .agg(
            F.coalesce(F.max(F.when(F.col("zs") == 0, F.col("value"))), F.lit(0)).alias("a"),
            F.coalesce(F.max(F.when(F.col("zs") == 1, F.col("value"))), F.lit(0)).alias("b"),
        )
    )
    mean = (F.col("a") + F.col("b")) / 2
    avg = (
        F.when(F.col("a") == 0, F.col("b"))
        .when(F.col("b") == 0, F.col("a"))
        .otherwise(mean if float_values else mean.cast("long"))
    )
    if float_values:
        avg = avg.cast("double")
    return pair.select("t", "x", "y", "z", avg.alias("value")).where(F.col("value") != 0)


# ---------------------------------------------------------------------------
# Time series (reference: spatialdb.py:139-199 missing-time handling)
# ---------------------------------------------------------------------------

def missing_time_steps(
    v: DataFrame, t_start: int, t_stop: int, group: Sequence[str] = ("x", "y", "z")
) -> DataFrame:
    """Per-coordinate detection of absent time samples in [t_start, t_stop)
    (reference: mark_missing_time_steps, spatialdb.py:187-199 — absent
    samples render as zeros). Expected-grid left-anti-join present."""
    expected = (
        v.select(*group).distinct()
        .select(
            *group,
            F.explode(
                F.sequence(F.lit(t_start), F.lit(t_stop - 1)).cast("array<long>")
            ).alias("t"),
        )
    )
    present = v.select(*group, "t").distinct()
    return expected.join(present, on=[*group, "t"], how="left_anti")


def time_filled(
    v: DataFrame, t_start: int, t_stop: int
) -> DataFrame:
    """Cutout-with-time semantics: every (coordinate, t) in range appears,
    absent samples as value 0 (reference renders missing steps as zero cubes,
    spatialdb.py:175-199)."""
    grid = (
        v.select("x", "y", "z").distinct()
        .select(
            "x", "y", "z",
            F.explode(
                F.sequence(F.lit(t_start), F.lit(t_stop - 1)).cast("array<long>")
            ).alias("t"),
        )
    )
    present = v.where((F.col("t") >= t_start) & (F.col("t") < t_stop))
    return (
        grid.join(present, on=["x", "y", "z", "t"], how="left")
        .select("t", "x", "y", "z", F.coalesce(F.col("value"), F.lit(0)).alias("value"))
    )


def object_moments(v: DataFrame) -> DataFrame:
    """Per-object centroid + moment statistics: (anno_id, n_voxels,
    cx, cy, cz, moment_trace) for every non-zero annotation id.

    Parity-plus morphometry in the surface_stats family (the reference
    stores segmentations but computes no shape statistics; cf.
    object.py:778-831 which only enumerates ids). Numeric discipline:
    coordinate sums stay exact bigints through the aggregate; centroids
    are floor(sum * 1e6 / n) / 1e6 — integer arithmetic until the single
    terminal division, so any engine agrees bit-for-bit. moment_trace is
    the raw integer second moment sum(x^2+y^2+z^2) (the rotation-
    invariant part callers derive gyration radii from without float
    drift). One partial/final aggregate keyed by the object id."""
    nz = v.where(F.col("value") != 0)
    g = nz.groupBy("value").agg(
        F.count("*").alias("n_voxels"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(
            F.col("x") * F.col("x") + F.col("y") * F.col("y")
            + F.col("z") * F.col("z")
        ).alias("moment_trace"),
    )
    def _c(s):
        return (F.floor(F.col(s) * 1000000 / F.col("n_voxels")) / 1000000).alias(
            "c" + s[1]
        )
    return g.select(
        F.col("value").alias("anno_id"),
        "n_voxels",
        _c("sx"),
        _c("sy"),
        _c("sz"),
        F.col("moment_trace").cast("long").alias("moment_trace"),
    )


def _scatter_union(v: DataFrame) -> DataFrame:
    """Shared union-scatter for 6-neighborhood morphology: every voxel
    contributes itself (present=1, offset 0) and its id scattered to the
    6 face positions (nbr=1) — ONE 7-element explode, so the input
    subtree is referenced exactly ONCE. (The earlier self-UNION-neighbors
    form referenced the input twice; Spark's exchange reuse does not
    unify the duplicated subtrees, so any non-trivial input — e.g.
    closing's dilate stage — executed twice unless checkpointed.) The
    single groupBy a consumer runs on top is the only shuffle."""
    offs = [
        (0, 0, 0, 1, 0),  # self
        (1, 0, 0, 0, 1), (-1, 0, 0, 0, 1),
        (0, 1, 0, 0, 1), (0, -1, 0, 0, 1),
        (0, 0, 1, 0, 1), (0, 0, -1, 0, 1),
    ]
    return v.select(
        "t", "x", "y", "z", "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).alias("dx"),
                        F.lit(dy).alias("dy"),
                        F.lit(dz).alias("dz"),
                        F.lit(p).alias("present"),
                        F.lit(n).alias("nbr"),
                    )
                    for dx, dy, dz, p, n in offs
                ]
            )
        ).alias("o"),
    ).select(
        "t",
        (F.col("x") + F.col("o.dx")).alias("x"),
        (F.col("y") + F.col("o.dy")).alias("y"),
        (F.col("z") + F.col("o.dz")).alias("z"),
        "value",
        F.col("o.present").alias("present"),
        F.col("o.nbr").alias("nbr"),
    )


def _pack_shifts(bounds: tuple[int, int, int, int], slack: int = 4):
    """Bit layout for packing (t, x, y, z) into ONE 64-bit key given the
    caller's region bounds (coords in [0, bound) per axis). Each spatial
    axis gets `2*slack` extra values of headroom so morphology scatters
    (±1 per round, two rounds for closing) never carry across fields;
    t is never scattered, so its field is exact. Returns (t_shift,
    x_shift, y_shift, z_bits_tuple...) — see _pack_expr/_unpack_cols."""
    tb_, xb_, yb_, zb_ = bounds
    if min(bounds) < 1:
        raise ValueError(f"bounds must be positive, got {bounds}")
    tbits = max(1, (tb_ - 1).bit_length() or 1)
    xbits = (xb_ + 2 * slack).bit_length()
    ybits = (yb_ + 2 * slack).bit_length()
    zbits = (zb_ + 2 * slack).bit_length()
    if tbits + xbits + ybits + zbits > 62:
        raise ValueError(
            f"bounds {bounds} need {tbits + xbits + ybits + zbits} bits; "
            "packed morphology requires <= 62"
        )
    return slack, tbits, xbits, ybits, zbits


def _pack_expr(shifts, t, x, y, z):
    slack, _tbits, xbits, ybits, zbits = shifts
    return (
        F.shiftleft(t, xbits + ybits + zbits)
        + F.shiftleft(x + slack, ybits + zbits)
        + F.shiftleft(y + slack, zbits)
        + (z + slack)
    ).alias("pk")


def _pack_delta(shifts, dx: int, dy: int, dz: int) -> int:
    _slack, _tbits, _xbits, ybits, zbits = shifts
    return (dx << (ybits + zbits)) + (dy << zbits) + dz


def _unpack_cols(shifts):
    slack, _tbits, xbits, ybits, zbits = shifts
    pk = F.col("pk")
    return [
        F.shiftright(pk, xbits + ybits + zbits).alias("t"),
        (
            F.shiftright(pk, ybits + zbits).bitwiseAND(F.lit((1 << xbits) - 1))
            - slack
        ).alias("x"),
        (
            F.shiftright(pk, zbits).bitwiseAND(F.lit((1 << ybits) - 1)) - slack
        ).alias("y"),
        (pk.bitwiseAND(F.lit((1 << zbits) - 1)) - slack).alias("z"),
    ]


def _packed_scatter(pv: DataFrame, shifts, offs) -> DataFrame:
    """(pk, value) -> one row per (pk + packed_delta, value, d) where d
    is the raw packed delta (d = 0 marks the self/present contribution).
    The offset add is ONE long addition instead of three coordinate
    adds, and the downstream group key is ONE column instead of four —
    §2.3 'narrower types': the scatter/agg shuffle carries 2-3 longs
    per row instead of 6-7."""
    deltas = [_pack_delta(shifts, dx, dy, dz) for dx, dy, dz in offs]
    return pv.select(
        "pk", "value", F.explode(F.array(*[F.lit(d) for d in deltas])).alias("d")
    ).select((F.col("pk") + F.col("d")).alias("pk"), "value", "d")


_FACE_OFFS = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]


def _packed_dilate(pv: DataFrame, shifts) -> DataFrame:
    g = (
        _packed_scatter(pv, shifts, _FACE_OFFS)
        .groupBy("pk")
        .agg(
            F.max(F.when(F.col("d") == 0, F.col("value"))).alias("self_val"),
            F.min(F.when(F.col("d") != 0, F.col("value"))).alias("nbr_min"),
        )
    )
    return g.select(
        "pk", F.coalesce(F.col("self_val"), F.col("nbr_min")).alias("value")
    )


def _packed_erode(pv: DataFrame, shifts) -> DataFrame:
    # value stays OUT of the group key (cf. erode): a voxel survives iff
    # it exists (sv not null), all 6 neighbors exist (cnt = 6), and every
    # neighbor carries the same id (min = max = sv) — bit-identical to
    # the (position, value)-keyed count form, with a 1-column key.
    g = (
        _packed_scatter(pv, shifts, _FACE_OFFS)
        .groupBy("pk")
        .agg(
            F.max(F.when(F.col("d") == 0, F.col("value"))).alias("sv"),
            F.min(F.when(F.col("d") != 0, F.col("value"))).alias("nmin"),
            F.max(F.when(F.col("d") != 0, F.col("value"))).alias("nmax"),
            F.count(F.when(F.col("d") != 0, F.lit(1))).alias("cnt"),
        )
    )
    return g.where(
        F.col("sv").isNotNull()
        & (F.col("cnt") == 6)
        & (F.col("nmin") == F.col("sv"))
        & (F.col("nmax") == F.col("sv"))
    ).select("pk", F.col("sv").alias("value"))


def _pack_input(v: DataFrame, shifts) -> DataFrame:
    return v.select(
        _pack_expr(shifts, F.col("t"), F.col("x"), F.col("y"), F.col("z")),
        "value",
    )


def _unpack_output(pv: DataFrame, shifts) -> DataFrame:
    return pv.select(*_unpack_cols(shifts), "value")


def dilate(
    v: DataFrame, bounds: tuple[int, int, int, int] | None = None
) -> DataFrame:
    """Binary 6-neighborhood dilation of a segmentation: a position is
    labeled after dilation if it holds a voxel (keeps its own id) or any
    face-neighbor does (takes the MIN claiming id — deterministic when
    objects touch). Parity-plus morphology in the surface_stats family;
    the grid is unbounded (no clamp) — clip with box_predicate if needed.

    Same scale shape as surface_stats: scatter-union then ONE
    partial/final aggregate keyed by position — no self-join.

    `bounds` = (t_bound, x_bound, y_bound, z_bound), the caller's region
    extents (every cutout request carries them): when given, positions
    pack into ONE 64-bit key for the scatter/aggregate — the shuffle
    row shrinks from 6 longs to 3 and the hash key from 4 columns to 1
    (guide §2.3). Output is identical (unpacked on the way out)."""
    if bounds is not None:
        shifts = _pack_shifts(bounds)
        return _unpack_output(_packed_dilate(_pack_input(v, shifts), shifts), shifts)
    g = (
        _scatter_union(v)
        .groupBy("t", "x", "y", "z")
        .agg(
            F.max(F.when(F.col("present") == 1, F.col("value"))).alias("self_val"),
            F.min(F.when(F.col("nbr") == 1, F.col("value"))).alias("nbr_min"),
        )
    )
    return g.select(
        "t", "x", "y", "z",
        F.coalesce(F.col("self_val"), F.col("nbr_min")).alias("value"),
    )


def erode(
    v: DataFrame, bounds: tuple[int, int, int, int] | None = None
) -> DataFrame:
    """Binary 6-neighborhood erosion of a segmentation: a voxel survives
    iff all 6 face-neighbors hold the SAME id (object interiors; surface
    voxels — surface_stats' n < 6 — are removed). Same single-shuffle
    scatter-union shape; `bounds` as in dilate.

    The group key is the position alone (NOT position+value): survival
    = own id exists AND 6 neighbor contributions AND neighbor min = max
    = own id — equivalent to the (position, value)-keyed count form (a
    position holds one value, each neighbor contributes exactly once)
    with one fewer key column in the shuffle hash."""
    if bounds is not None:
        shifts = _pack_shifts(bounds)
        return _unpack_output(_packed_erode(_pack_input(v, shifts), shifts), shifts)
    g = (
        _scatter_union(v)
        .groupBy("t", "x", "y", "z")
        .agg(
            F.max(F.when(F.col("present") == 1, F.col("value"))).alias("sv"),
            F.min(F.when(F.col("nbr") == 1, F.col("value"))).alias("nmin"),
            F.max(F.when(F.col("nbr") == 1, F.col("value"))).alias("nmax"),
            F.count(F.when(F.col("nbr") == 1, F.lit(1))).alias("cnt"),
        )
    )
    return g.where(
        F.col("sv").isNotNull()
        & (F.col("cnt") == 6)
        & (F.col("nmin") == F.col("sv"))
        & (F.col("nmax") == F.col("sv"))
    ).select("t", "x", "y", "z", F.col("sv").alias("value"))


def object_contacts(
    v: DataFrame, bounds: tuple[int, int, int, int] | None = None
) -> DataFrame:
    """Contact surfaces between segmented objects: (id_a, id_b,
    n_contacts) for every unordered pair of DIFFERENT non-zero ids with
    face-adjacent voxels, n_contacts = number of touching voxel faces
    (the synapse-candidate / adjacency-graph statistic; parity-plus — the
    reference stores segmentations but computes no adjacency).

    Shape: scatter each voxel's id to its 6 face positions (narrow
    explode), equi-join the scattered stream against the voxels ON
    POSITION (one uniform position-keyed shuffle per side — no id-keyed
    skew even for huge objects), keep different-id hits. Each touching
    face is seen once from each side, so the pair count halves exactly.

    Measured note (round 5): a join-free variant — _scatter_union into
    one position-keyed collect_list aggregate — was tried and ran 3x
    SLOWER at sf0.1 (12.5 s vs 4.3 s): collect_list forces
    ObjectHashAggregate (no whole-stage codegen, object allocation per
    row, sort-based fallback under pressure), which loses far more than
    the second exchange costs. The codegen'd equi-join + count agg is
    the right plan.

    With `bounds` (region extents, as in dilate) the position equi-join
    keys on ONE packed long instead of four coordinate columns — same
    join strategy, narrower hash and build rows."""
    if bounds is not None:
        shifts = _pack_shifts(bounds)
        nzp = _pack_input(v.where(F.col("value") != 0), shifts)
        deltas = [
            _pack_delta(shifts, dx, dy, dz)
            for dx, dy, dz in _FACE_OFFS
            if (dx, dy, dz) != (0, 0, 0)
        ]
        scattered = nzp.select(
            F.col("value").alias("src_id"),
            F.explode(F.array(*[(F.col("pk") + F.lit(d)) for d in deltas])).alias(
                "pk"
            ),
        )
        hits = scattered.join(nzp, "pk").where(F.col("value") != F.col("src_id"))
        return (
            hits.select(
                F.least(F.col("src_id"), F.col("value")).alias("id_a"),
                F.greatest(F.col("src_id"), F.col("value")).alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg((F.count("*") / 2).cast("long").alias("n_contacts"))
        )
    nz = v.where(F.col("value") != 0)
    offs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    scattered = nz.select(
        "t", "x", "y", "z", F.col("value").alias("src_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).alias("dx"),
                        F.lit(dy).alias("dy"),
                        F.lit(dz).alias("dz"),
                    )
                    for dx, dy, dz in offs
                ]
            )
        ).alias("o"),
    ).select(
        "t",
        (F.col("x") + F.col("o.dx")).alias("x"),
        (F.col("y") + F.col("o.dy")).alias("y"),
        (F.col("z") + F.col("o.dz")).alias("z"),
        "src_id",
    )
    hits = scattered.join(nz, on=["t", "x", "y", "z"]).where(
        F.col("value") != F.col("src_id")
    )
    return (
        hits.select(
            F.least(F.col("src_id"), F.col("value")).alias("id_a"),
            F.greatest(F.col("src_id"), F.col("value")).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg((F.count("*") / 2).cast("long").alias("n_contacts"))
    )


def value_histogram(v: DataFrame, n_buckets: int = 64, bucket_width: int = 4) -> DataFrame:
    """Intensity histogram of a channel: (bucket, lo, n_voxels) with
    fixed-width buckets (uint8 default: 64 buckets x width 4; the
    statistic auto-contrast windowing in a tile service is computed
    from — cf. the Boss ecosystem's histogram service; spdb itself
    stores but never aggregates intensities). Values beyond the last
    bucket clamp into it. One partial/final aggregate: the shuffle
    carries n_buckets rows per partition."""
    b = F.least(
        F.floor(F.col("value") / F.lit(bucket_width)).cast("long"),
        F.lit(n_buckets - 1),
    )
    return (
        v.groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n_voxels"))
        .select(
            "bucket",
            (F.col("bucket") * bucket_width).alias("lo"),
            "n_voxels",
        )
    )


def closing(
    v: DataFrame, bounds: tuple[int, int, int, int] | None = None
) -> DataFrame:
    """Morphological closing: erode(dilate(v)) as ONE straight-line plan
    — scan -> 7-way scatter -> position agg (dilate) -> 7-way scatter ->
    position agg (erode): two position-keyed shuffles, one input scan,
    nothing executed twice. The single-explode _scatter_union references
    the dilate stage exactly once, which removed the checkpoint this
    operator previously needed (the old self-union scatter referenced
    its input twice and re-executed the whole dilate pipeline; measured
    2x wall). No checkpoint also means nothing to lose with executor
    churn — the plan is a plain two-stage pipeline Spark can retry per
    task.

    With `bounds` (region extents, as in dilate) the whole composition
    runs PACKED: pack once, dilate agg, scatter, erode agg, unpack once
    — both shuffles carry the single-long position key."""
    if bounds is not None:
        shifts = _pack_shifts(bounds)
        return _unpack_output(
            _packed_erode(_packed_dilate(_pack_input(v, shifts), shifts), shifts),
            shifts,
        )
    return erode(dilate(v))
