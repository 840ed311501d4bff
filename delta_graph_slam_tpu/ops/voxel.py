"""Voxel-grid kernels: downsampling, occupied-cell centers, hash lookup.

TPU-native replacements for pcl::VoxelGrid / ApproximateVoxelGrid
(/root/reference/apps/prefiltering_nodelet.cpp:55-75, :249-260) and
pcl::octree occupied-voxel centers (/root/reference/src/hdl_graph_slam/
map_cloud_generator.cpp:38-49).

Strategy: quantize to integer cell coords, lexicographically sort the
(valid, ix, iy, iz) tuples with ``lax.sort(num_keys=4)``, mark first-in-run
flags, and segment-reduce into a fixed-capacity output. Exact (no hash
collisions), fully static shapes.

``VoxelHash`` is the sorted-key lookup table used by the registration engine
in place of kd-trees: packed 30-bit cell keys + ``searchsorted`` queries.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .cloud import MaskedCloud


def voxel_coords(points, resolution, dtype=jnp.int32):
    """floor(p / resolution) as integer cell coordinates (PCL convention)."""
    return jnp.floor(points / resolution).astype(dtype)


def voxel_keys(points, mask, resolution, bits=10, origin=None):
    """Packed int32 voxel key per point; invalid points get key = 2^31-1.

    Coordinates are offset by ``origin`` (defaults to the masked min corner)
    and clamped to [0, 2^bits); 3*bits must be < 31.
    """
    assert 3 * bits < 31
    coords = voxel_coords(points, resolution)
    if origin is None:
        big = jnp.iinfo(jnp.int32).max
        origin = jnp.min(jnp.where(mask[:, None], coords, big), axis=0)
    coords = jnp.clip(coords - origin, 0, (1 << bits) - 1)
    key = (coords[:, 0] << (2 * bits)) | (coords[:, 1] << bits) | coords[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)
    return key, origin


def _sorted_segments(points, mask, resolution):
    """Sort points by voxel cell; return sorted pts, validity, first-in-run flags.

    Cells are ordered by a scrambled hash of the cell coords (exact coords
    as tie-breakers, so points of one cell stay adjacent): when the number
    of occupied voxels exceeds the output capacity, the overflow that gets
    dropped is then a spatially *unbiased* random subset. A plain
    lexicographic order would silently crop one side of the scan — at
    KITTI scale (131k raw points / 0.1 m cells vs 32k capacity) that
    cropped half the field of view and broke registration through turns.
    """
    coords = voxel_coords(points, resolution)
    invalid = (~mask).astype(jnp.int32)
    h = (
        (coords[:, 0] * jnp.int32(73856093))
        ^ (coords[:, 1] * jnp.int32(19349669))
        ^ (coords[:, 2] * jnp.int32(83492791))
    )
    inv_s, h_s, ix_s, iy_s, iz_s, px, py, pz = jax.lax.sort(
        (invalid, h, coords[:, 0], coords[:, 1], coords[:, 2],
         points[:, 0], points[:, 1], points[:, 2]),
        num_keys=5,
    )
    valid_s = inv_s == 0
    same = (
        (ix_s[1:] == ix_s[:-1])
        & (iy_s[1:] == iy_s[:-1])
        & (iz_s[1:] == iz_s[:-1])
    )
    first = jnp.concatenate([jnp.ones((1,), bool), ~same]) & valid_s
    pts_s = jnp.stack([px, py, pz], axis=-1)
    coords_s = jnp.stack([ix_s, iy_s, iz_s], axis=-1)
    return pts_s, coords_s, valid_s, first


def voxel_downsample(cloud: MaskedCloud, resolution, capacity_out=None) -> MaskedCloud:
    """Centroid per occupied voxel (pcl::VoxelGrid semantics).

    Voxels beyond ``capacity_out`` (in cell-sorted order) are dropped; choose
    capacity generously. Output is compacted (valid prefix).
    """
    n = cloud.capacity
    if capacity_out is None:
        capacity_out = n
    pts_s, _, valid_s, first = _sorted_segments(cloud.points, cloud.mask, resolution)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, capacity_out)  # drop invalid
    sums = jax.ops.segment_sum(pts_s, seg, num_segments=capacity_out + 1)[:-1]
    cnts = jax.ops.segment_sum(
        jnp.ones((n,), pts_s.dtype), seg, num_segments=capacity_out + 1
    )[:-1]
    mask_out = cnts > 0
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    return MaskedCloud(jnp.where(mask_out[:, None], centroids, 0.0), mask_out)


def occupied_voxel_centers(cloud: MaskedCloud, resolution, capacity_out=None) -> MaskedCloud:
    """Center of each occupied voxel (pcl octree getOccupiedVoxelCenters
    semantics, map_cloud_generator.cpp:38-49)."""
    n = cloud.capacity
    if capacity_out is None:
        capacity_out = n
    _, coords_s, valid_s, first = _sorted_segments(cloud.points, cloud.mask, resolution)
    take = first & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(take, seg, capacity_out)
    centers = (coords_s.astype(cloud.points.dtype) + 0.5) * resolution
    out = jax.ops.segment_sum(centers, seg, num_segments=capacity_out + 1)[:-1]
    cnt = jax.ops.segment_sum(
        jnp.ones((n,), cloud.points.dtype), seg, num_segments=capacity_out + 1
    )[:-1]
    mask_out = cnt > 0
    return MaskedCloud(jnp.where(mask_out[:, None], out, 0.0), mask_out)


class VoxelHash(NamedTuple):
    """Sorted-unique-key voxel table: the kd-tree replacement.

    Two lookup paths:
    - searchsorted over ``keys`` (O(log V), ~13 dependent gathers on TPU);
    - optional dense direct-address index ``dense_slot`` (one gather): a
      flat (2^bits)^2 * 2^zbits grid of slot ids, far faster on TPU where
      binary search serializes into dependent gathers.
    """

    keys: jnp.ndarray        # (V,) int32 sorted unique cell keys (pad = INT32_MAX)
    counts: jnp.ndarray      # (V,) float
    means: jnp.ndarray       # (V, 3)
    covs: jnp.ndarray        # (V, 3, 3)  E[xx^T] - mean mean^T (population)
    starts: jnp.ndarray      # (V,) int32 start index into sorted points
    sorted_points: jnp.ndarray  # (N, 3) points sorted by cell key
    sorted_valid: jnp.ndarray   # (N,) bool
    origin: jnp.ndarray      # (3,) int32 cell-coordinate offset
    resolution: jnp.ndarray  # () float
    bits: int
    dense_slot: Optional[jnp.ndarray] = None  # (G,) int32, -1 = empty cell


def build_voxel_hash(cloud: MaskedCloud, resolution, capacity_voxels, bits=10,
                     dense_index=False, dense_bits=(8, 8, 6),
                     with_stats=True) -> VoxelHash:
    """Build the voxel stats table for a target cloud.

    dense_index=True also scatters a direct-address (2^bx * 2^by * 2^bz)
    slot grid (dense_bits per axis; 8,8,6 -> 4.2M int32 = 16 MB) so lookups
    cost one gather instead of a binary search. with_stats=False skips the
    per-voxel mean/covariance reductions (pure NN indexes don't need them).
    """
    n = cloud.capacity
    key, origin = voxel_keys(cloud.points, cloud.mask, resolution, bits=bits)
    key_s, px, py, pz = jax.lax.sort(
        (key, cloud.points[:, 0], cloud.points[:, 1], cloud.points[:, 2]),
        num_keys=1,
    )
    pts_s = jnp.stack([px, py, pz], axis=-1)
    valid_s = key_s != jnp.iinfo(jnp.int32).max
    first = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]) & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    segd = jnp.where(valid_s, seg, capacity_voxels)
    V = capacity_voxels
    cnt = jax.ops.segment_sum(jnp.ones((n,), pts_s.dtype), segd, num_segments=V + 1)[:-1]
    if with_stats:
        psum = jax.ops.segment_sum(pts_s, segd, num_segments=V + 1)[:-1]
        outer = pts_s[:, :, None] * pts_s[:, None, :]
        osum = jax.ops.segment_sum(outer, segd, num_segments=V + 1)[:-1]
        cnt_safe = jnp.maximum(cnt, 1.0)
        means = psum / cnt_safe[:, None]
        covs = osum / cnt_safe[:, None, None] - means[:, :, None] * means[:, None, :]
    else:
        means = jnp.zeros((V, 3), pts_s.dtype)
        covs = jnp.zeros((V, 3, 3), pts_s.dtype)
    # representative key and start index per segment
    keys_u = jax.ops.segment_min(
        jnp.where(valid_s, key_s, jnp.iinfo(jnp.int32).max), segd, num_segments=V + 1
    )[:-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    starts = jax.ops.segment_min(
        jnp.where(valid_s, idx, n), segd, num_segments=V + 1
    )[:-1]
    dense = None
    if dense_index:
        bx, by, bz = dense_bits
        ku = keys_u.astype(jnp.int32)
        occupied = ku != jnp.iinfo(jnp.int32).max
        ix = (ku >> (2 * bits)) & ((1 << bits) - 1)
        iy = (ku >> bits) & ((1 << bits) - 1)
        iz = ku & ((1 << bits) - 1)
        in_box = occupied & (ix < (1 << bx)) & (iy < (1 << by)) & (iz < (1 << bz))
        G = 1 << (bx + by + bz)
        flat = (ix << (by + bz)) | (iy << bz) | iz
        flat = jnp.where(in_box, flat, G)  # dropped by the +1 scatter pad
        slots = jnp.arange(V, dtype=jnp.int32)
        dense = (
            jnp.full((G + 1,), -1, jnp.int32).at[flat].set(slots)[:G]
        )
    return VoxelHash(
        keys=keys_u.astype(jnp.int32),
        counts=cnt,
        means=means,
        covs=covs,
        starts=starts.astype(jnp.int32),
        sorted_points=pts_s,
        sorted_valid=valid_s,
        origin=origin,
        resolution=jnp.asarray(resolution, pts_s.dtype),
        bits=bits,
        dense_slot=dense,
    )


DENSE_BITS = (8, 8, 6)  # default direct-address grid: 256 x 256 x 64 cells


def voxel_lookup(vh: VoxelHash, query_points, query_mask, offsets=None,
                 dense_bits=DENSE_BITS):
    """Find the voxel slot for each query point (and optional neighbor cells).

    offsets: (M, 3) int cell offsets (e.g. 7- or 27-neighborhood); default
    just the containing cell. Returns (slots (N, M) int32, hit (N, M) bool).
    Uses the direct-address grid when the hash carries one (one gather per
    candidate) and binary search otherwise.
    """
    if offsets is None:
        offsets = jnp.zeros((1, 3), jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)
    bits = vh.bits
    coords = voxel_coords(query_points, vh.resolution) - vh.origin
    cand = coords[:, None, :] + offsets[None, :, :]  # (N, M, 3)
    if vh.dense_slot is not None:
        bx, by, bz = dense_bits
        in_range = (
            (cand[..., 0] >= 0) & (cand[..., 0] < (1 << bx))
            & (cand[..., 1] >= 0) & (cand[..., 1] < (1 << by))
            & (cand[..., 2] >= 0) & (cand[..., 2] < (1 << bz))
        )
        c = jnp.clip(cand, 0, jnp.asarray(
            [(1 << bx) - 1, (1 << by) - 1, (1 << bz) - 1], jnp.int32))
        flat = (c[..., 0] << (by + bz)) | (c[..., 1] << bz) | c[..., 2]
        slot = vh.dense_slot[flat]
        hit = (slot >= 0) & in_range & query_mask[:, None]
        return jnp.maximum(slot, 0), hit
    in_range = jnp.all((cand >= 0) & (cand < (1 << bits)), axis=-1)
    cand = jnp.clip(cand, 0, (1 << bits) - 1)
    key = (cand[..., 0] << (2 * bits)) | (cand[..., 1] << bits) | cand[..., 2]
    slot = jnp.searchsorted(vh.keys, key, side="left").astype(jnp.int32)
    slot = jnp.clip(slot, 0, vh.keys.shape[0] - 1)
    hit = (vh.keys[slot] == key) & in_range & query_mask[:, None]
    return slot, hit
