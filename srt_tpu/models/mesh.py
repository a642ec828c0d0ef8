"""Triangle-mesh scenes: device pytree, traversal strategies, shading hookup.

The TPU-side counterpart of the reference's model path: ``CheckHit``'s
per-model frame transform + BVH traversal (raytrace_compute.glsl:143-161 ->
``Intersects``, ray_intersects.glsl:99-133) and the OBJ-material conversion
``TriangleToSupportedMat`` (raytrace_utils.glsl:140-175).

Traversal strategies over the flattened node/triangle arrays:

* ``"dense"``  — every ray against every triangle, ``[tile, T]`` broadcast
  Moller-Trumbore on the VPU.  No divergence, no gather; the fastest choice
  for small-to-medium meshes and the correctness baseline for everything.
* ``"bvh"``    — classic per-ray stack traversal (``lax.while_loop`` with a
  fixed-size stack, vmapped).  Matches the reference algorithm one-to-one;
  used for CPU validation and as the semantics spec for the Pallas kernel.
* ``"pallas"`` — the production TPU kernel (ops/traversal_pallas.py):
  BVH-culled cluster intersection over ray tiles.

All strategies return identical hits (tested).  Rays are processed in
static tiles so memory stays bounded; the whole thing is differentiable
w.r.t. triangle vertices, frames, and material tables.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srt_tpu.models.pathtracer import Hit, HitFn
from srt_tpu.ops import intersect
from srt_tpu.ops import vec
from srt_tpu.scene import Materials
from srt_tpu.utils.flatten import FlatScene

INF = jnp.float32(jnp.inf)
MISS = jnp.int32(-1)

# ``TriangleToSupportedMat`` constants (raytrace_utils.glsl:169-173).
MESH_METALNESS = 0.1
ROUGHNESS_EPS = 1e-7


@struct.dataclass
class MeshScene:
    """Device-resident flattened multi-model scene.

    Array fields are traced (differentiable); ``static`` fields are python
    metadata fixed at trace time (model directory, sizes, stack depth).
    """

    frames: jnp.ndarray       # [B, 4, 4] world->model (differentiable pose)
    node_min: jnp.ndarray     # [Nn, 3]
    node_max: jnp.ndarray     # [Nn, 3]
    node_first: jnp.ndarray   # [Nn] int32
    node_count: jnp.ndarray   # [Nn] int32
    tri_v0: jnp.ndarray       # [T, 3] model-space corners
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    uv0: jnp.ndarray          # [T, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    tri_mat: jnp.ndarray      # [T] int32
    tri_n0: jnp.ndarray       # [T, 3] shading normals (zero rows fall
    tri_n1: jnp.ndarray       #        back to the geometric normal)
    tri_n2: jnp.ndarray
    mat_diffuse: jnp.ndarray  # [M, 3]
    mat_specular: jnp.ndarray  # [M, 3]
    mat_emissive: jnp.ndarray  # [M, 3] (Ke; zero = non-emitter)
    mat_specular_ex: jnp.ndarray  # [M]
    mat_use_texture: jnp.ndarray  # [M] bool
    mat_tex_index: jnp.ndarray    # [M] int32
    atlas: Optional[jnp.ndarray] = None  # [H, W, 3] texture atlas or None
    atlas_rects: Optional[jnp.ndarray] = None  # [K, 4] (x, y, w, h) in texels
    atlas_mip_rects: Optional[jnp.ndarray] = None  # [K, L, 4] mip chain rects
    # Quad-packed atlas [H*W, 12] (utils/atlas.build_quad_table): one
    # packed row gather per bilinear tap instead of four 2D gathers —
    # forward-render fast path; None when differentiating w.r.t. texels.
    atlas_quad: Optional[jnp.ndarray] = None
    # Pallas cluster-kernel tables (ops/traversal_pallas.py); present when
    # the scene was flattened with pad_to=128.
    woop: Optional[jnp.ndarray] = None         # [13, T]
    cluster_min: Optional[jnp.ndarray] = None  # [C, 3]
    cluster_max: Optional[jnp.ndarray] = None  # [C, 3]
    # Shared-vertex view for geometry optimization: tri_v0/v1/v2 above are
    # the pre-gathered per-corner duplicates (model_loader.cpp:296-331);
    # ``with_positions`` re-derives them from this buffer so vertex
    # gradients scatter-add back to shared vertices via the gather VJP.
    tri_vidx: Optional[jnp.ndarray] = None   # [T, 3] int32 into positions
    positions: Optional[jnp.ndarray] = None  # [V, 3]
    # Edge adjacency (global triangle ids, -1 = boundary/padding): the
    # topology the mesh silhouette gradients walk
    # (models/edge_aware_mesh.py).
    tri_adj: Optional[jnp.ndarray] = None    # [T, 3] int32

    # Distance-based mip LOD: lod = log2(hit_t * mip_lod_scale), clamped to
    # the chain; 0 disables (base level only).  A path tracer has no screen
    # derivatives, so this is the standard distance heuristic — set scale
    # ~ texels-per-world-unit / viewport-rays-per-world-unit for the scene.
    mip_lod_scale: float = struct.field(pytree_node=False, default=0.0)
    model_first_node: tuple = struct.field(pytree_node=False, default=(0,))
    model_first_tri: tuple = struct.field(pytree_node=False, default=(0,))
    model_tri_count: tuple = struct.field(pytree_node=False, default=(0,))
    model_padded_tri_count: tuple = struct.field(pytree_node=False, default=(0,))
    num_triangles: int = struct.field(pytree_node=False, default=0)
    stack_depth: int = struct.field(pytree_node=False, default=34)
    max_leaf: int = struct.field(pytree_node=False, default=2)
    # Set by refit_accel: the Pallas/dense tables track the moved vertices
    # but the BVH *node* bounds do not; the "bvh" strategy refuses to run
    # on such a scene (it would silently return wrong hits).
    stale_node_bounds: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_models(self) -> int:
        return len(self.model_first_node)


def upload(scene: FlatScene, atlas=None, atlas_rects=None,
           atlas_mip_rects=None, mip_lod_scale: float = 0.0,
           quad_pack: bool = True) -> MeshScene:
    """Host FlatScene -> device MeshScene (the ``glBufferData`` moment,
    gpu_loader.cpp:142-182; here a plain pytree of jnp arrays).

    When the scene is cluster-aligned (flatten_models pad_to=128) the Woop
    transform table and cluster AABBs for the Pallas kernel are built here.
    """
    import numpy as _np

    # Quad-packed atlas (r5): the forward texture fast path; skip with
    # quad_pack=False when the caller will differentiate w.r.t. texels
    # (the quad table is a host-built copy, not a traced view).
    atlas_quad = None
    if quad_pack and atlas is not None and atlas_rects is not None:
        from srt_tpu.utils.atlas import build_quad_table
        atlas_quad = jnp.asarray(build_quad_table(
            _np.asarray(atlas), _np.asarray(atlas_rects),
            None if atlas_mip_rects is None
            else _np.asarray(atlas_mip_rects)))

    t_total = scene.tri_v0.shape[0]
    firsts = [int(x) for x in scene.model_first_tri]
    padded_counts = tuple(
        (firsts[i + 1] if i + 1 < len(firsts) else t_total) - firsts[i]
        for i in range(len(firsts))
    )

    woop = cmin = cmax = None
    from srt_tpu.ops.traversal_pallas import CLUSTER, build_clusters, build_woop
    if t_total > 0 and t_total % CLUSTER == 0 and all(
        c % CLUSTER == 0 for c in padded_counts
    ):
        w = build_woop(scene.tri_v0, scene.tri_v1, scene.tri_v2)  # [13, T]
        # Kernel layout: [C, 16, 128] — per-cluster blocks, rows padded to
        # a full sublane tile (see traversal_pallas._intersect_kernel).
        w16 = _np.zeros((16, w.shape[1]), _np.float32)
        w16[:13] = w
        c_total = t_total // CLUSTER
        woop = jnp.asarray(
            w16.reshape(16, c_total, CLUSTER).transpose(1, 0, 2).copy()
        )
        lo, hi = build_clusters(scene.tri_v0, scene.tri_v1, scene.tri_v2)
        cmin, cmax = jnp.asarray(lo), jnp.asarray(hi)

    return MeshScene(
        frames=jnp.asarray(scene.frames),
        node_min=jnp.asarray(scene.node_min),
        node_max=jnp.asarray(scene.node_max),
        node_first=jnp.asarray(scene.node_first),
        node_count=jnp.asarray(scene.node_count),
        tri_v0=jnp.asarray(scene.tri_v0),
        tri_v1=jnp.asarray(scene.tri_v1),
        tri_v2=jnp.asarray(scene.tri_v2),
        uv0=jnp.asarray(scene.uv0),
        uv1=jnp.asarray(scene.uv1),
        uv2=jnp.asarray(scene.uv2),
        tri_mat=jnp.asarray(scene.tri_mat),
        tri_n0=jnp.asarray(scene.tri_n0),
        tri_n1=jnp.asarray(scene.tri_n1),
        tri_n2=jnp.asarray(scene.tri_n2),
        mat_diffuse=jnp.asarray(scene.mat_diffuse),
        mat_specular=jnp.asarray(scene.mat_specular),
        mat_emissive=jnp.asarray(scene.mat_emissive),
        mat_specular_ex=jnp.asarray(scene.mat_specular_ex),
        mat_use_texture=jnp.asarray(scene.mat_use_texture),
        mat_tex_index=jnp.asarray(scene.mat_tex_index),
        atlas=None if atlas is None else jnp.asarray(atlas),
        atlas_rects=None if atlas_rects is None else jnp.asarray(atlas_rects),
        atlas_mip_rects=(None if atlas_mip_rects is None
                         else jnp.asarray(atlas_mip_rects)),
        atlas_quad=atlas_quad,
        mip_lod_scale=float(mip_lod_scale),
        woop=woop,
        cluster_min=cmin,
        cluster_max=cmax,
        tri_vidx=jnp.asarray(scene.tri_vidx),
        positions=jnp.asarray(scene.positions),
        tri_adj=(None if scene.tri_adj is None
                 else jnp.asarray(scene.tri_adj)),
        model_first_node=tuple(int(x) for x in scene.model_first_node),
        model_first_tri=tuple(int(x) for x in scene.model_first_tri),
        model_tri_count=tuple(int(x) for x in scene.model_tri_count),
        model_padded_tri_count=padded_counts,
        num_triangles=int(scene.num_triangles),
        stack_depth=int(scene.max_depth) + 2,
        max_leaf=int(scene.node_count.max()),
    )


def with_positions(scene: MeshScene, positions) -> MeshScene:
    """Re-gather the per-corner vertex arrays from a shared vertex buffer.

    The differentiable-geometry entry point: parameterize a render by
    ``positions`` [V, 3] and gradients through tri_v0/v1/v2 scatter-add
    back to the *shared* vertices via the gather VJP (BASELINE config 4,
    "vertex + material gradients"; vertex layout parity:
    model_loader.cpp:296-331).  Padding triangles duplicate real triangles
    (utils/flatten.py), so their vidx rows alias real vertices and their
    gradients land on the same shared vertices — consistent by
    construction.

    Note: the BVH node bounds and Pallas cluster tables are built from the
    *uploaded* geometry; within one gradient evaluation they agree with
    ``positions``, but after an optimizer step moves vertices call
    ``refit_accel`` (jit-able) so traversal candidates track the geometry.
    Stored shading normals (tri_n0..2) are likewise not re-derived — for
    large vertex moves recompute them host-side
    (utils.obj_loader.compute_vertex_normals) and re-upload, or optimize
    with flat (geometric) shading, which tracks the vertices exactly.
    """
    vidx = scene.tri_vidx
    return scene.replace(
        positions=positions,
        tri_v0=positions[vidx[:, 0]],
        tri_v1=positions[vidx[:, 1]],
        tri_v2=positions[vidx[:, 2]],
    )


def refit_accel(scene: MeshScene) -> MeshScene:
    """Refit acceleration tables to the current tri_v0/v1/v2 (jit-able).

    Rebuilds the Pallas Woop table + cluster AABBs in jnp.  BVH *node*
    bounds are not refit (the "bvh" strategy is a CPU-validation path);
    the dense and pallas strategies never read node bounds, so
    optimization loops using them stay correct.  The returned scene is
    flagged ``stale_node_bounds`` and the "bvh" strategy refuses to run
    on it.  Use after optimizer steps that move vertices.
    """
    if scene.woop is None:
        return scene
    from srt_tpu.ops.traversal_pallas import CLUSTER

    v0, v1, v2 = scene.tri_v0, scene.tri_v1, scene.tri_v2
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = jnp.cross(e1, e2)
    a = jnp.stack([e1, e2, nrm], axis=-1)               # [T, 3, 3]
    det = jnp.linalg.det(a)
    # f32 threshold (the host build uses 1e-18 in f64): near-singular
    # inverses overflow f32, and such slivers never win a closest hit.
    ok = jnp.abs(det) > 1e-12
    a_safe = jnp.where(ok[:, None, None], a, jnp.eye(3)[None])
    a_inv = jnp.linalg.inv(a_safe)
    trans = -jnp.einsum("tij,tj->ti", a_inv, v0)
    t_count = v0.shape[0]
    rows = [a_inv[:, r // 4, r % 4] if r % 4 < 3 else trans[:, r // 4]
            for r in range(12)]
    n2 = jnp.sum(nrm * nrm, axis=1)
    from srt_tpu.ops import intersect as _i
    eps = jnp.where(ok, _i.MT_PARALLEL_EPS / jnp.maximum(n2, 1e-30), jnp.inf)
    w = jnp.stack(rows + [eps], axis=0).astype(jnp.float32)  # [13, T]
    w16 = jnp.zeros((16, t_count), jnp.float32).at[:13].set(w)
    c_total = t_count // CLUSTER
    woop = w16.reshape(16, c_total, CLUSTER).transpose(1, 0, 2)

    def chunk(arr):
        return arr.reshape(c_total, CLUSTER, 3)

    cmin = jnp.minimum(jnp.minimum(chunk(v0).min(1), chunk(v1).min(1)),
                       chunk(v2).min(1))
    cmax = jnp.maximum(jnp.maximum(chunk(v0).max(1), chunk(v1).max(1)),
                       chunk(v2).max(1))
    return scene.replace(woop=woop, cluster_min=cmin, cluster_max=cmax,
                         stale_node_bounds=True)


def transform_rays(frame, origins, dirs):
    """World ray -> model space (raytrace_compute.glsl:146-147):
    origin as a point, direction as a vector (no normalize).
    origins/dirs: [3, N] component-first (ops/vec.py)."""
    rot = frame[:3, :3]
    o = rot @ origins + frame[:3, 3][:, None]
    d = rot @ dirs
    return o, d


def normal_to_world(frame, normals):
    """Model-space normal -> world, via the transpose of the world->model
    matrix; renormalized.  (The reference skips this —
    raytrace_compute.glsl:157 — which is only correct for identity frames.)
    """
    from srt_tpu.ops.safemath import safe_normalize
    return safe_normalize(normals @ frame[:3, :3])


# ---------------------------------------------------------------------------
# Dense strategy
# ---------------------------------------------------------------------------

def _dense_model_hit(scene: MeshScene, b: int, origins, dirs, t_best):
    """All-triangles sweep for model ``b``; returns (t, tri_idx, u, v).
    origins/dirs [3, N]; the dense MT kernel keeps its [N, T] layout."""
    lo = scene.model_first_tri[b]
    hi = lo + scene.model_tri_count[b]
    o_m, d_m = transform_rays(scene.frames[b], origins, dirs)
    t_all, u_all, v_all = intersect.moller_trumbore(
        o_m.T, d_m.T, scene.tri_v0[lo:hi], scene.tri_v1[lo:hi], scene.tri_v2[lo:hi]
    )
    t_all = jnp.where(t_all < t_best[:, None], t_all, INF)
    k = jnp.argmin(t_all, axis=1)
    rows = jnp.arange(t_all.shape[0])
    return (
        t_all[rows, k],
        (k + lo).astype(jnp.int32),
        u_all[rows, k],
        v_all[rows, k],
    )


# ---------------------------------------------------------------------------
# BVH stack strategy (the reference algorithm, lax.while_loop + vmap)
# ---------------------------------------------------------------------------

def _bvh_traverse_single(scene: MeshScene, root: int, o, d, t_init):
    """One ray through one model's BVH — ``Intersects``
    (ray_intersects.glsl:99-133) as a while_loop with a fixed stack."""
    stack = jnp.zeros((scene.stack_depth,), jnp.int32).at[0].set(root)

    def mt_one(idx):
        v0 = scene.tri_v0[idx]
        e1 = scene.tri_v1[idx] - v0
        e2 = scene.tri_v2[idx] - v0
        h = jnp.cross(d, e2)
        a = jnp.dot(e1, h)
        parallel = jnp.abs(a) < intersect.MT_PARALLEL_EPS
        f = 1.0 / jnp.where(parallel, 1.0, a)
        s = o - v0
        u = f * jnp.dot(s, h)
        q = jnp.cross(s, e1)
        v = f * jnp.dot(d, q)
        t = f * jnp.dot(e2, q)
        miss = parallel | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) \
            | (t <= intersect.MT_HIT_EPS)
        return jnp.where(miss, INF, t), u, v

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, stack, best_t, best_i, best_u, best_v = state
        sp = sp - 1
        ni = stack[sp]
        dist = intersect.ray_aabb(o, d, scene.node_min[ni], scene.node_max[ni])
        enter = (dist < best_t) & jnp.isfinite(dist)
        first = scene.node_first[ni]
        count = scene.node_count[ni]
        is_leaf = count > 0

        # Leaf: prims statically unrolled to the scene's max leaf size with
        # masks (degenerate midpoint splits can leave leaves > leaf_size,
        # exactly like the reference builder, bvh.h:129-131).
        for k in range(scene.max_leaf):
            idx = first + k
            valid = enter & is_leaf & (k < count)
            t, u, v = mt_one(idx)
            better = valid & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, idx, best_i)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)

        # Internal: push both children (left processed first, like the
        # reference's pop order).
        push = enter & ~is_leaf
        stack = stack.at[sp].set(jnp.where(push, first + 1, stack[sp]))
        nxt = jnp.minimum(sp + 1, scene.stack_depth - 1)
        stack = stack.at[nxt].set(jnp.where(push, first, stack[nxt]))
        sp = jnp.where(push, sp + 2, sp)
        return sp, stack, best_t, best_i, best_u, best_v

    init = (jnp.int32(1), stack, t_init, MISS, jnp.float32(0), jnp.float32(0))
    _, _, t, i, u, v = jax.lax.while_loop(cond, body, init)
    return t, i, u, v


def _bvh_model_hit(scene: MeshScene, b: int, origins, dirs, t_best):
    if scene.stale_node_bounds:
        raise ValueError(
            "scene was refit_accel'd after a vertex update: BVH node "
            "bounds are stale (refit_accel only rebuilds the Pallas "
            "tables). Use method='dense'/'pallas', or re-upload the scene."
        )
    o_m, d_m = transform_rays(scene.frames[b], origins, dirs)
    root = scene.model_first_node[b]
    t, i, u, v = jax.vmap(
        lambda o, d, tb: _bvh_traverse_single(scene, root, o, d, tb)
    )(o_m.T, d_m.T, t_best)
    return t, i, u, v


# ---------------------------------------------------------------------------
# Shading hookup
# ---------------------------------------------------------------------------

def _mip_lod(scene: MeshScene, t, cone=None):
    """Mip LOD; None when mips are absent or disabled.

    Default: the scalar distance heuristic lod = log2(t * scale).  With a
    ray ``cone`` (width-at-origin [N], spread [N]; RenderConfig.ray_cones)
    the footprint at the hit is width + t * spread and ``mip_lod_scale``
    acts as texels-per-world-unit — true footprint tracking through
    bounces (the GL driver analog: derivative-driven mipmapped samplers,
    include/asset_utils/gpu_texture.h:39-53)."""
    if scene.atlas_mip_rects is None or scene.mip_lod_scale <= 0.0:
        return None
    if cone is not None:
        width, spread = cone
        fp = width + t * spread
        return jnp.log2(jnp.maximum(fp * scene.mip_lod_scale, 1.0))
    return jnp.log2(jnp.maximum(t * scene.mip_lod_scale, 1.0))


def triangle_material(scene: MeshScene, tri_idx, u, v, t=None,
                      cone=None) -> Materials:
    """OBJ material -> shading material (``TriangleToSupportedMat``,
    raytrace_utils.glsl:140-175): textured albedo via barycentric UV lookup
    in the atlas (trilinear through the mip chain when ``t`` and mips are
    available), else Kd; roughness ~ 1/(Ns+eps); metalness 0.1;
    use_spec true."""
    midx = scene.tri_mat[tri_idx]
    albedo = scene.mat_diffuse[midx]
    if scene.atlas is not None:
        from srt_tpu.ops.texture import sample_atlas
        uv = (
            (1.0 - u - v)[:, None] * scene.uv0[tri_idx]
            + u[:, None] * scene.uv1[tri_idx]
            + v[:, None] * scene.uv2[tri_idx]
        )
        lod = None if t is None else _mip_lod(scene, t, cone=cone)
        tex_rgb = sample_atlas(
            scene.atlas, scene.atlas_rects, scene.mat_tex_index[midx], uv,
            mip_rects=scene.atlas_mip_rects, lod=lod,
            quad=scene.atlas_quad,
        )
        albedo = jnp.where(scene.mat_use_texture[midx][:, None], tex_rgb, albedo)
    rough = 1.0 / (scene.mat_specular_ex[midx] + ROUGHNESS_EPS)
    n = tri_idx.shape[0]
    return Materials(
        albedo=albedo,
        specular=scene.mat_specular[midx],
        roughness=rough,
        metalness=jnp.full((n,), MESH_METALNESS, jnp.float32),
        use_spec=jnp.ones((n,), bool),
    )


def pallas_model_hit_for_tests(scene: MeshScene, origins, dirs, t_best):
    """Direct single-model kernel entry (test hook; [3, N] rays)."""
    from srt_tpu.ops.traversal_pallas import pallas_model_hit
    return pallas_model_hit(scene, 0, origins, dirs, t_best)


def _tri_record(scene: MeshScene) -> jnp.ndarray:
    """Pack everything shading needs per triangle into one [T, 36] table.

    Row gathers on TPU cost milliseconds per 256k indices (ops/gather.py),
    so the post-hit pass does ONE ``record[idx]`` gather instead of ~12
    separate vertex/uv/material gathers.  Layout (36 columns): v0 v1 v2
    (0-8), uv0 uv1 uv2 (9-14), Kd (15-17), Ks (18-20), Ns (21), use_tex
    (22), tex_idx (23), Ke (24-26), shading normals n0 n1 n2 (27-35, zero
    = geometric).  Built from the
    scene's differentiable arrays inside the trace, so material/vertex
    gradients flow through the packing; the per-triangle material expansion
    is a [T]-sized gather (trivial).
    """
    m = scene.tri_mat
    return jnp.concatenate([
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.uv0, scene.uv1, scene.uv2,
        scene.mat_diffuse[m], scene.mat_specular[m],
        scene.mat_specular_ex[m][:, None],
        scene.mat_use_texture[m][:, None].astype(jnp.float32),
        scene.mat_tex_index[m][:, None].astype(jnp.float32),
        scene.mat_emissive[m],
        scene.tri_n0, scene.tri_n1, scene.tri_n2,
    ], axis=1)


def _record_material(scene: MeshScene, rec_t, u, v, t=None,
                     cone=None) -> Materials:
    """``TriangleToSupportedMat`` (raytrace_utils.glsl:140-175) from the
    packed per-triangle record (component-first [36, N]) — no per-ray
    table gathers."""
    albedo = rec_t[15:18]
    if scene.atlas is not None:
        from srt_tpu.ops.texture import sample_atlas
        uv = (
            (1.0 - u - v)[None, :] * rec_t[9:11]
            + u[None, :] * rec_t[11:13]
            + v[None, :] * rec_t[13:15]
        )
        lod = None if t is None else _mip_lod(scene, t, cone=cone)
        tex_rgb = sample_atlas(
            scene.atlas, scene.atlas_rects,
            rec_t[23].astype(jnp.int32), uv.T,
            mip_rects=scene.atlas_mip_rects, lod=lod,
            quad=scene.atlas_quad,
        ).T
        albedo = jnp.where(rec_t[22:23] > 0.5, tex_rgb, albedo)
    n = rec_t.shape[1]
    return Materials(
        albedo=albedo,
        specular=rec_t[18:21],
        roughness=1.0 / (rec_t[21] + ROUGHNESS_EPS),
        metalness=jnp.full((n,), MESH_METALNESS, jnp.float32),
        use_spec=jnp.ones((n,), bool),
    )


def mesh_hit_fn(scene: MeshScene, method: str = "dense",
                flip_normals: bool = True, ray_tile: int = 0,
                kernel_tile: int = 0, binned=False,
                binned_anyhit=None) -> HitFn:
    """Build the integrator's closest-hit callable for a mesh scene.

    Mirrors the model branch of ``CheckHit`` (raytrace_compute.glsl:143-161):
    per-model frame transform, traversal bounded by the running closest t
    across models, material conversion on the winning triangle.

    ``ray_tile > 0`` processes rays in fixed tiles via ``lax.map`` to bound
    the [tile, T] dense working set.  ``kernel_tile`` overrides the Pallas
    kernel's rays-per-tile (default DEFAULT_TILE; smaller tiles tighten
    per-tile supercluster unions for incoherent bounce rays at 2x the
    fixed per-tile cost).  ``binned`` (pallas only) selects the traversal
    walk: False = tiled supercluster walk, True = r3 pair-binned mode,
    "pg2:G:W" = the per-group walk at G-ray groups with W-wide evals (the
    incoherent-bounce production mode; see
    ``ops.traversal_pallas.pallas_model_hit``).  ``binned_anyhit``
    overrides the walk for any-hit (shadow) queries only — shadow and
    bounce rays have different footprints, so the compact driver picks
    per-bounce AND per-query-kind strategies (None = same as ``binned``).
    """
    if method == "pallas":
        import functools as _ft

        from srt_tpu.ops.traversal_pallas import (DEFAULT_TILE, SUPER,
                                                  pallas_model_hit)
        if kernel_tile == 0:
            # Adaptive default (measured on v5e, 102k-tri headline scene):
            # large scenes want small tiles — per-tile supercluster unions
            # tighten for incoherent bounce rays (512 -> 128 was +34%
            # frame throughput; 256 beat 128 on isolated primary/synthetic
            # workloads but measured ~5% SLOWER on the full frame, r3
            # matrix) — tiny scenes want big tiles (culling can't help
            # when one super covers the scene, fixed costs dominate).
            n_supers = (scene.woop.shape[0] + SUPER - 1) // SUPER \
                if scene.woop is not None else 1
            kernel_tile = 128 if n_supers > 8 else DEFAULT_TILE
        model_hit = _ft.partial(pallas_model_hit, tile=kernel_tile,
                                binned=binned)
        if binned_anyhit is not None:
            model_hit_any = _ft.partial(pallas_model_hit, tile=kernel_tile,
                                        binned=binned_anyhit)
        else:
            model_hit_any = model_hit
        ray_tile = 0  # the kernel tiles rays itself
    elif method == "dense":
        model_hit = _dense_model_hit
    elif method == "bvh":
        model_hit = _bvh_model_hit
    else:
        raise ValueError(f"unknown traversal method: {method}")

    def hit_tile(origins, dirs, t_min, t_max, any_hit=False, cone=None):
        n = origins.shape[1]
        best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        best_i = jnp.full((n,), MISS)
        best_u = jnp.zeros((n,), jnp.float32)
        best_v = jnp.zeros((n,), jnp.float32)
        best_b = jnp.zeros((n,), jnp.int32)
        for b in range(scene.num_models):
            if method == "pallas":
                # Kernel candidates only; exact (t, u, v) is re-derived once
                # for the cross-model winner below (one gather, not 3/model).
                mh = model_hit_any if any_hit else model_hit
                t, i, u, v = mh(scene, b, origins, dirs, best_t,
                                any_hit=any_hit, refine=False,
                                t_min=t_min)
            else:
                t, i, u, v = model_hit(scene, b, origins, dirs, best_t)
            better = (i != MISS) & (t < best_t) & (t > t_min)
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, i, best_i)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
            best_b = jnp.where(better, b, best_b)

        hit = best_i != MISS

        if any_hit:
            # Occlusion only: no shading data, no gathers at all.
            t_safe = jnp.where(hit, best_t, 1.0)
            p = origins + t_safe[None, :] * dirs
            zeros = jnp.zeros_like(p)
            return Hit(
                hit=hit, t=best_t, p=p, normal=zeros,
                mat=Materials(
                    albedo=zeros, specular=zeros,
                    roughness=jnp.ones((n,), jnp.float32),
                    metalness=jnp.zeros((n,), jnp.float32),
                    use_spec=jnp.zeros((n,), bool),
                ),
            )

        # --- Shared post-pass: ONE packed-record gather for the winner,
        # transposed once into the component-first layout ---
        idx = jnp.maximum(best_i, 0)
        rec_t = _tri_record(scene)[idx].T                   # [36, N]
        v0, v1, v2 = rec_t[0:3], rec_t[3:6], rec_t[6:9]
        e1 = v1 - v0
        e2 = v2 - v0

        # Winning model's ray transform (frames table is tiny: per-model
        # transforms selected by where-chain, no [N, 4, 4] gather ever
        # materializes).
        if scene.num_models == 1:
            o_m, d_m = transform_rays(scene.frames[0], origins, dirs)
        else:
            o_m = d_m = None
            for b in range(scene.num_models):
                o_b, d_b = transform_rays(scene.frames[b], origins, dirs)
                if o_m is None:
                    o_m, d_m = o_b, d_b
                else:
                    m = (best_b == b)[None, :]
                    o_m = jnp.where(m, o_b, o_m)
                    d_m = jnp.where(m, d_b, d_m)

        if method == "pallas":
            # Exact Moller-Trumbore refine of the kernel's winner so
            # (t, u, v) precision matches the dense path.
            h = vec.cross(d_m, e2)
            a = jnp.sum(e1 * h, axis=0)
            parallel = jnp.abs(a) < intersect.MT_PARALLEL_EPS
            f_inv = 1.0 / jnp.where(parallel, 1.0, a)
            s = o_m - v0
            u_r = f_inv * jnp.sum(s * h, axis=0)
            q = vec.cross(s, e1)
            v_r = f_inv * jnp.sum(d_m * q, axis=0)
            t_r = f_inv * jnp.sum(e2 * q, axis=0)
            best_t = jnp.where(hit, t_r, best_t)
            best_u = jnp.where(hit, u_r, 0.0)
            best_v = jnp.where(hit, v_r, 0.0)

        # Shading normal in model space: barycentric interpolation of the
        # per-corner normals when present (smooth shading; the reference
        # parses vn and discards it, model_loader.cpp:296-331), falling
        # back to the geometric normal wherever the interpolated vector is
        # ~zero (vn-less meshes, padding).  Reference normal convention:
        # model space, raytrace_compute.glsl:157; see RenderConfig.
        n_geom = vec.normalize(vec.cross(e1, e2))
        n_sm = (
            (1.0 - best_u - best_v)[None, :] * rec_t[27:30]
            + best_u[None, :] * rec_t[30:33]
            + best_v[None, :] * rec_t[33:36]
        )
        sm_len2 = jnp.sum(n_sm * n_sm, axis=0)
        use_sm = sm_len2 > 1e-12
        inv_sm = jax.lax.rsqrt(jnp.where(use_sm, sm_len2, 1.0))
        n_model = jnp.where(use_sm[None, :], n_sm * inv_sm[None, :], n_geom)

        # Normal to world via the transpose of world->model.
        if scene.num_models == 1:
            normal = scene.frames[0][:3, :3].T @ n_model
        else:
            normal = None
            for b in range(scene.num_models):
                n_b = scene.frames[b][:3, :3].T @ n_model
                if normal is None:
                    normal = n_b
                else:
                    normal = jnp.where((best_b == b)[None, :], n_b, normal)
        normal = vec.normalize(normal)

        t_safe = jnp.where(hit, best_t, 1.0)
        p = origins + t_safe[None, :] * dirs

        if flip_normals:
            facing = jnp.sum(normal * dirs, axis=0) < 0.0
            normal = jnp.where(facing[None, :], normal, -normal)

        mat = _record_material(scene, rec_t, best_u, best_v, t=t_safe,
                               cone=cone)
        # Emission (Ke) rides the Hit record; the integrator credits
        # throughput * Ke on hit — mesh area emitters, a capability the
        # reference parses but never uses (model_loader.cpp:240-273).
        emitted = jnp.where(hit[None, :], rec_t[24:27], 0.0)
        return Hit(hit=hit, t=best_t, p=p, normal=normal, mat=mat,
                   emitted=emitted,
                   tri=jnp.where(hit, idx, -1).astype(jnp.int32))

    if ray_tile <= 0:
        return hit_tile

    def hit_tiled(origins, dirs, t_min, t_max, any_hit=False, cone=None):
        n = origins.shape[1]
        if n <= ray_tile:
            return hit_tile(origins, dirs, t_min, t_max, any_hit=any_hit,
                            cone=cone)
        pad = (-n) % ray_tile
        o = jnp.pad(origins, ((0, 0), (0, pad)))
        d = jnp.pad(dirs, ((0, 0), (0, pad)), constant_values=1.0)
        tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)),
                     (0, pad), constant_values=1.0)
        tiles = (n + pad) // ray_tile
        if cone is None:
            cw = ct = jnp.zeros((n + pad,), jnp.float32)
        else:
            cw = jnp.pad(cone[0], (0, pad))
            ct = jnp.pad(cone[1], (0, pad))
        res = jax.lax.map(
            lambda args: hit_tile(args[0], args[1], t_min, args[2],
                                  any_hit=any_hit,
                                  cone=(None if cone is None
                                        else (args[3], args[4]))),
            (
                o.reshape(3, tiles, ray_tile).transpose(1, 0, 2),
                d.reshape(3, tiles, ray_tile).transpose(1, 0, 2),
                tm.reshape(tiles, ray_tile),
                cw.reshape(tiles, ray_tile),
                ct.reshape(tiles, ray_tile),
            ),
        )

        def unstack(x):
            # Per-tile results: [tiles, ...] with the ray axis last for
            # vectors ([tiles, 3, tile]) and direct for scalars.
            if x.ndim == 3:
                return x.transpose(1, 0, 2).reshape(x.shape[1], -1)[:, :n]
            return x.reshape(-1)[:n]

        return jax.tree_util.tree_map(unstack, res)

    return hit_tiled


def load_mesh_scene(obj_paths, frames=None, method_pad: int = 1,
                    leaf_size: int = 2) -> MeshScene:
    """Convenience: OBJ paths -> flattened device MeshScene."""
    from srt_tpu.utils.flatten import flatten_models
    from srt_tpu.utils.obj_loader import load_object

    meshes = [load_object(p) for p in obj_paths]
    flat = flatten_models(meshes, frames=frames, leaf_size=leaf_size,
                          pad_to=method_pad)
    return upload(flat)
