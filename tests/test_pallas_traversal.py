"""Pallas cluster-kernel correctness (interpret mode on CPU): hits must
agree with the dense Moller-Trumbore sweep."""

import jax.numpy as jnp
import numpy as np
import pytest

from srt_tpu.models import mesh as mesh_mod
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models
from tests.test_mesh import random_rays


@pytest.mark.parametrize("mesh_name", ["rubik", "sphere"])
def test_pallas_matches_dense(mesh_name):
    mesh = {
        "rubik": lambda: procgen.rubik_grid(),
        "sphere": lambda: procgen.uv_sphere(12, 18),
    }[mesh_name]()
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    assert scene.woop is not None

    o, d = random_rays(1024, seed=7)
    t_max = jnp.full((1024,), jnp.inf)

    td, idd, ud, vd = mesh_mod._dense_model_hit(scene, 0, o, d, t_max)
    tp, ip, up, vp = mesh_mod.pallas_model_hit_for_tests(scene, o, d, t_max)

    hit_d = np.isfinite(np.asarray(td))
    hit_p = np.asarray(ip) != -1
    # The kernel accepts grazing edge hits within EDGE_EPS that exact MT
    # rejects (and vice versa never: it is a superset), so hit masks may
    # differ on a tiny silhouette fraction.
    assert (hit_d == hit_p).mean() > 0.995
    both = hit_d & hit_p
    tp_b = np.asarray(tp)[both]
    td_b = np.asarray(td)[both]
    # Never a farther hit than the exact sweep...
    assert (tp_b <= td_b * (1 + 2e-4) + 1e-5).all()
    # ...and where the same triangle wins, t agrees to fp32 tolerance.
    same = np.asarray(idd)[both] == np.asarray(ip)[both]
    assert same.mean() > 0.98
    np.testing.assert_allclose(tp_b[same], td_b[same], rtol=2e-4, atol=1e-5)


def test_pallas_multi_model():
    cube1 = procgen.cube(size=1.0)
    cube2 = procgen.cube(size=1.0)
    f2 = np.eye(4, dtype=np.float32)
    f2[2, 3] = 3.0
    scene = mesh_mod.upload(
        flatten_models([cube1, cube2],
                       frames=[np.eye(4, dtype=np.float32), f2],
                       pad_to=128)
    )
    o = jnp.asarray([[0.0, 0.0, 5.0]] * 4, jnp.float32).T
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 4, jnp.float32).T
    rec = mesh_mod.mesh_hit_fn(scene, method="pallas")(
        o, d, 1e-3, jnp.full((4,), jnp.inf)
    )
    assert np.asarray(rec.hit).all()
    np.testing.assert_allclose(np.asarray(rec.t), 4.5, rtol=1e-5)


def test_pallas_render_matches_dense():
    import jax

    from srt_tpu.config import CameraConfig, RenderConfig
    from srt_tpu.models import pathtracer
    from srt_tpu.scene import model_scene_lights

    mesh = procgen.cube(size=2.0)
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    cam = CameraConfig(width=16, height=8, origin=(0, 1, 5), look_at=(0, 0, 0))
    cfg = RenderConfig(max_depth=2, rr_bounces=1)
    lights = model_scene_lights()
    key = jax.random.key(0)

    img_d = pathtracer.render(
        mesh_mod.mesh_hit_fn(scene, method="dense"), lights, cam, cfg, key
    )
    img_p = pathtracer.render(
        mesh_mod.mesh_hit_fn(scene, method="pallas"), lights, cam, cfg, key
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               rtol=1e-4, atol=1e-4)


def test_any_hit_agrees_with_closest_hit():
    """The any-hit (shadow) kernel mode must report occlusion exactly
    where the closest-hit walk finds a hit inside t_max — the early-out
    may stop at a different (non-closest) hit but never changes hit/miss
    (``CheckLightOccluded`` parity, raytrace_compute.glsl:167-176)."""
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    mesh = procgen.uv_sphere(12, 18)
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    o, d = random_rays(512, seed=11)
    # Finite t_max like a shadow segment (some hits fall beyond it).
    t_max = jnp.full((512,), 4.0)

    t_c, i_c, _, _ = pallas_model_hit(scene, 0, o, d, t_max)
    t_a, i_a, _, _ = pallas_model_hit(scene, 0, o, d, t_max, any_hit=True)

    hit_c = np.asarray(i_c) != -1
    hit_a = np.asarray(i_a) != -1
    np.testing.assert_array_equal(hit_c, hit_a)
    # Any-hit t values are still genuine hits within the segment.
    ta = np.asarray(t_a)[hit_a]
    assert (ta > 0).all() and (ta < 4.0 + 1e-3).all()


def test_any_hit_early_out_with_dead_lanes():
    """Mixed live/dead tiles must still take the any-hit early-out: once
    every LIVE ray has a hit, remaining supers are skipped — observable
    because a later super here holds a genuinely NEARER triangle that the
    early-out never evaluates.  Regression for the dead-lane gate (lanes
    with rb == t_max == 0 previously kept ``done`` from ever setting, so
    post-primary shadow tiles with any dead ray lost the shortcut)."""
    from srt_tpu.ops import traversal_pallas as tp

    tile = 8
    n_tiles = 8
    # Two supers, one real triangle each (lane 0 of their first cluster).
    # Super 0: huge AABB entered at z=1, triangle at z=50.
    # Super 1: small AABB entered at z=5, triangle at z=8 (closer hit).
    tris = np.zeros((2 * tp.SUPER * tp.CLUSTER, 3, 3), np.float32)

    def set_tri(c, z):
        tris[c * tp.CLUSTER] = [[-10, -10, z], [10, -10, z], [0, 10, z]]

    set_tri(0, 50.0)
    set_tri(tp.SUPER, 8.0)
    woop13 = tp.build_woop(tris[:, 0], tris[:, 1], tris[:, 2])   # [13, T]
    w16 = np.zeros((16, tris.shape[0]), np.float32)
    w16[:13] = woop13
    woop = jnp.asarray(
        w16.reshape(16, 2 * tp.SUPER, tp.CLUSTER).transpose(1, 0, 2).copy())

    # Cluster AABB table [S, 8, 16]; NaN boxes for the empty clusters.
    cb = np.full((2, 8, tp.SUPER), np.nan, np.float32)
    cb[0, 0:3, 0] = [-10.0, -10.0, 1.0]
    cb[0, 3:6, 0] = [10.0, 10.0, 100.0]
    cb[1, 0:3, 0] = [-10.0, -10.0, 5.0]
    cb[1, 3:6, 0] = [10.0, 10.0, 10.0]

    # Each tile: rays 0-3 live (t_max 200) at the origin along +z,
    # rays 4-7 dead (t_max 0).
    rays = np.zeros((n_tiles * tile, 8), np.float32)
    rays[:, 5] = 1.0
    rays[:, 6] = np.tile(np.array([200.0] * 4 + [0.0] * 4, np.float32),
                         n_tiles)

    counts = jnp.full((n_tiles, 1), 2, jnp.int32)
    clist = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (n_tiles, 1))
    elist = jnp.tile(jnp.asarray([[1.0, 5.0]], jnp.float32), (n_tiles, 1))
    args = (counts, clist, elist, jnp.asarray(rays), jnp.asarray(cb), woop)

    t_any, i_any = tp._launch(*args, tile, True, any_hit=True)
    t_closest, _ = tp._launch(*args, tile, True, any_hit=False)
    t_any = np.asarray(t_any).reshape(n_tiles, tile)
    t_closest = np.asarray(t_closest).reshape(n_tiles, tile)
    # Closest-hit walks both supers and finds the nearer z=8 triangle...
    np.testing.assert_allclose(t_closest[:, :4], 8.0, rtol=1e-4)
    # ...but any-hit resolves every live ray after super 0 and skips
    # super 1 despite the dead lanes in the tile (t stays at 50).
    np.testing.assert_allclose(t_any[:, :4], 50.0, rtol=1e-4)
    assert (np.asarray(i_any).reshape(n_tiles, tile)[:, :4] == 0).all()


def test_stream_mode_matches_resident():
    """The HBM-streaming kernel (stream=True: per-super double-buffered
    DMA of the Woop table) must return exactly the hits of the
    VMEM-resident kernel — same candidates, same winners — including on
    a model whose cluster count is NOT a multiple of SUPER (exercises the
    zero-padded tail blocks)."""
    from srt_tpu.ops.traversal_pallas import SUPER, pallas_model_hit

    mesh = procgen.uv_sphere(16, 24)          # ~700 tris -> 6 clusters
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    assert scene.woop.shape[0] % SUPER != 0   # partial super tail

    o, d = random_rays(1024, seed=3)
    t_max = jnp.full((1024,), jnp.inf)

    tr, ir, ur, vr = pallas_model_hit(scene, 0, o, d, t_max, stream=False)
    ts, is_, us, vs = pallas_model_hit(scene, 0, o, d, t_max, stream=True)
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(is_))
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(ts))

    # Any-hit mode too (the early-out path interacts with the prefetch
    # drain: a super's block may be fetched and never waited).
    t_seg = jnp.full((1024,), 4.0)
    _, ia, _, _ = pallas_model_hit(scene, 0, o, d, t_seg, any_hit=True,
                                   stream=False)
    _, ib, _, _ = pallas_model_hit(scene, 0, o, d, t_seg, any_hit=True,
                                   stream=True)
    np.testing.assert_array_equal(np.asarray(ia) != -1,
                                  np.asarray(ib) != -1)


def test_binned_matches_tiled():
    """Ray-supercluster BINNED traversal (the incoherent-bounce mode)
    must return the SAME hits as the tiled walk — same winner index and
    bit-equal candidate t — for fully-live and mixed live/dead
    wavefronts, in closest-hit and any-hit modes.  Both evaluate the
    identical Woop arithmetic on the identical cluster data; binning only
    regroups which (ray, super) pairs each kernel tile covers."""
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    mesh = procgen.uv_sphere(40, 60)     # several superclusters
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    o, d = random_rays(1024, seed=7)
    t_live = jnp.full((1024,), jnp.inf)
    t_mixed = t_live.at[::3].set(0.0)    # terminated paths

    for t_max in (t_live, t_mixed):
        t_t, i_t, _, _ = pallas_model_hit(scene, 0, o, d, t_max, tile=128)
        t_b, i_b, _, _ = pallas_model_hit(scene, 0, o, d, t_max, tile=128,
                                          binned=True)
        np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_b))
        hit = np.asarray(i_t) != -1
        np.testing.assert_array_equal(np.asarray(t_t)[hit],
                                      np.asarray(t_b)[hit])
        _, a_t, _, _ = pallas_model_hit(scene, 0, o, d, t_max,
                                        any_hit=True, tile=128)
        _, a_b, _, _ = pallas_model_hit(scene, 0, o, d, t_max,
                                        any_hit=True, tile=128, binned=True)
        np.testing.assert_array_equal(np.asarray(a_t) != -1,
                                      np.asarray(a_b) != -1)


def test_pgwalk_matches_tiled():
    """Per-group walks ("pg" mask-scan and "pg2:G:W" compacted-list, the
    production late-bounce + shadow modes) must return the SAME hits as
    the tiled walk — same winner index, bit-equal candidate t — for live
    and mixed live/dead wavefronts, closest-hit AND any-hit with a
    nonzero t_min lower bound (the shadow epsilon), across group sizes
    and eval widths.  (r4 advisor: these modes previously had no suite
    coverage — only the TPU-side parity artifact.)"""
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    mesh = procgen.uv_sphere(40, 60)     # several superclusters
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    o, d = random_rays(1024, seed=11)
    t_live = jnp.full((1024,), jnp.inf)
    t_mixed = t_live.at[::3].set(0.0)    # terminated paths

    for t_max in (t_live, t_mixed):
        t_t, i_t, _, _ = pallas_model_hit(scene, 0, o, d, t_max, tile=128)
        for mode in ("pg", "pg2:8:2", "pg2:16:4", "pg2:32:4"):
            t_p, i_p, _, _ = pallas_model_hit(scene, 0, o, d, t_max,
                                              tile=128, binned=mode)
            np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_p))
            hit = np.asarray(i_t) != -1
            np.testing.assert_array_equal(np.asarray(t_t)[hit],
                                          np.asarray(t_p)[hit])

        # Any-hit (shadow) mode with a segment-clipped t_max and the
        # t_min self-hit epsilon threaded into the kernel.
        t_seg = jnp.where(t_max > 0, 4.5, 0.0)
        _, a_t, _, _ = pallas_model_hit(scene, 0, o, d, t_seg,
                                        any_hit=True, tile=128,
                                        t_min=1e-2)
        for mode in ("pg", "pg2:16:4", "pg2:64:4"):
            _, a_p, _, _ = pallas_model_hit(scene, 0, o, d, t_seg,
                                            any_hit=True, tile=128,
                                            t_min=1e-2, binned=mode)
            np.testing.assert_array_equal(np.asarray(a_t) != -1,
                                          np.asarray(a_p) != -1)


def test_binned_overflow_falls_back_exactly():
    """When the static pair capacity is exceeded, the lax.cond fallback
    must run the tiled walk — results identical to binned=False, never a
    silently truncated expansion (rays with footprints beyond capacity
    would otherwise lose hits)."""
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    mesh = procgen.uv_sphere(40, 60)
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    o, d = random_rays(1024, seed=3)
    t_max = jnp.full((1024,), jnp.inf)

    t_t, i_t, _, _ = pallas_model_hit(scene, 0, o, d, t_max, tile=128)
    # pair_factor=1 cannot hold the real footprints -> cond fallback.
    t_b, i_b, _, _ = pallas_model_hit(scene, 0, o, d, t_max, tile=128,
                                      binned=True, pair_factor=1)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_b))
    np.testing.assert_array_equal(np.asarray(t_t), np.asarray(t_b))


def test_compact_driver_with_per_bounce_hit_fns():
    """trace_compact accepts a per-bounce hit-fn sequence (tiled for
    primaries, binned for later bounces — the production split) and must
    produce the same image and ray stats as a single tiled hit fn."""
    import jax

    from srt_tpu.config import CameraConfig, RenderConfig
    from srt_tpu.models.wavefront_compact import trace_image_compact
    from srt_tpu.ops.rng import KeyStream
    from srt_tpu.scene import model_scene_lights

    mesh = procgen.uv_sphere(24, 36)
    scene = mesh_mod.upload(flatten_models([mesh], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=32, height=32, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    cfg = RenderConfig(max_depth=3, rr_bounces=0, spp=1, sort_bounces=True)
    n = cam.width * cam.height
    sched = (n, n, n)

    tiled = mesh_mod.mesh_hit_fn(scene, method="pallas", kernel_tile=128)
    binned = mesh_mod.mesh_hit_fn(scene, method="pallas", kernel_tile=128,
                                  binned=True)
    key = jax.random.key(2)
    img1, st1, ov1 = trace_image_compact(
        tiled, lights, cam, cfg, KeyStream(key, n), sched,
        return_stats=True)
    img2, st2, ov2 = trace_image_compact(
        [tiled, binned, binned], lights, cam, cfg, KeyStream(key, n), sched,
        return_stats=True)
    assert int(ov1) == 0 and int(ov2) == 0
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-5, atol=1e-6)
