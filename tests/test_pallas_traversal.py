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
