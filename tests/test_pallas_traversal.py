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
