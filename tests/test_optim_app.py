"""Inverse-rendering driver, checkpoint/resume, and the progressive
render session."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srt_tpu import optim
from srt_tpu.app import RenderSession
from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import pathtracer
from srt_tpu.scene import default_sphere_scene, sphere_scene_lights
from srt_tpu.utils import checkpoint as ckpt


def test_inverse_rendering_recovers_albedo(tmp_path):
    cam = CameraConfig(width=24, height=16)
    cfg = RenderConfig(max_depth=2, rr_bounces=0, spp=1)
    lights = sphere_scene_lights()
    true_scene = default_sphere_scene()
    key = jax.random.key(0)

    target = pathtracer.render_spheres(true_scene, lights, cam, cfg, key)

    start = true_scene.replace(
        materials=true_scene.materials.replace(
            albedo=true_scene.materials.albedo.at[3].set(
                jnp.asarray([0.3, 0.6, 0.6])
            )
        )
    )

    def render_fn(scene, k):
        return pathtracer.render_spheres(scene, lights, cam, cfg, k)

    result = optim.run_inverse_rendering(
        render_fn, start, target, key, steps=40, learning_rate=0.05,
        log_every=0, project_fn=optim.clamp_sphere_scene, fixed_noise=True,
        trainable=lambda p, _: "albedo" in p,
        checkpoint_path=str(tmp_path / "ckpt.npz"), checkpoint_every=20,
    )
    assert result.losses[-1] < result.losses[0] * 0.25
    rec = np.asarray(result.params.materials.albedo)[3]
    true = np.asarray(true_scene.materials.albedo)[3]
    assert np.abs(rec - true).max() < 0.25

    # Resume from the checkpoint: must pick up at the saved step.
    result2 = optim.run_inverse_rendering(
        render_fn, start, target, key, steps=40, learning_rate=0.05,
        log_every=0, project_fn=optim.clamp_sphere_scene, fixed_noise=True,
        trainable=lambda p, _: "albedo" in p,
        checkpoint_path=str(tmp_path / "ckpt.npz"),
    )
    assert result2.steps == 40
    assert len(result2.losses) == 0  # already complete -> no extra steps


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.zeros(3), jnp.ones((2, 2)))}
    path = str(tmp_path / "t.npz")
    ckpt.save(path, tree, extra={"step": 7})
    leaves, extra = ckpt.load(path)
    restored = ckpt.restore_into(tree, leaves)
    assert extra["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_float_partition_skips_bools():
    scene = default_sphere_scene()
    leaves, merge = optim.float_partition(scene)
    assert all(jnp.issubdtype(x.dtype, jnp.floating) for x in leaves)
    rebuilt = merge(leaves)
    np.testing.assert_array_equal(
        np.asarray(rebuilt.materials.use_spec),
        np.asarray(scene.materials.use_spec),
    )


def test_render_session_accumulates_and_resets():
    cam = CameraConfig(width=16, height=12, origin=(0, 1, 4))
    cfg = RenderConfig(max_depth=2, rr_bounces=0)
    session = RenderSession(
        pathtracer.spheres_hit_fn(default_sphere_scene()),
        sphere_scene_lights(), cam, cfg,
    )
    img1 = session.step()
    assert img1.shape == (12, 16, 3)
    assert session.frames_accumulated == 1
    session.run(3)
    assert session.frames_accumulated == 4
    snap = session.snapshot()
    assert np.isfinite(snap).all()

    # Camera movement invalidates accumulation (resetAccumBuffer protocol).
    session.move(forward=0.5)
    assert session.frames_accumulated == 0
    img2 = session.step()
    assert img2.shape == (12, 16, 3)

    # Reset pose ('R' key analog).
    session.reset_camera()
    assert session.camera.position == (0.0, 1.0, 4.0)


def test_render_state_validation_and_healing():
    """ValidateRenderState analog (utils/validate.py): detects non-finite
    accumulation texels and heals them; healthy state reports ok."""
    import jax.numpy as jnp
    import numpy as np

    from srt_tpu.utils.validate import (heal_accumulation,
                                        validate_render_state)

    frame = jnp.ones((4, 4, 3), jnp.float32) * 0.5
    accum = jnp.ones((4, 4, 3), jnp.float32)
    rep = validate_render_state(frame, accum)
    assert rep.ok

    bad = accum.at[1, 2, 0].set(jnp.nan).at[0, 0, 1].set(-1.0)
    rep = validate_render_state(frame, bad)
    assert not rep.ok
    assert rep.nonfinite_accum == 1 and rep.negative_accum == 1
    healed, n = heal_accumulation(bad)
    assert n == 2
    assert np.isfinite(np.asarray(healed)).all()
    assert (np.asarray(healed) >= 0).all()


def test_session_metrics_and_validation_hook():
    """RenderSession emits structured per-frame metrics and runs the
    validator on schedule."""
    import numpy as np

    from srt_tpu.app import RenderSession
    from srt_tpu.config import CameraConfig, RenderConfig
    from srt_tpu.models import pathtracer
    from srt_tpu.scene import default_sphere_scene, sphere_scene_lights

    logs = []
    session = RenderSession(
        pathtracer.spheres_hit_fn(default_sphere_scene()),
        sphere_scene_lights(),
        CameraConfig(width=16, height=12),
        RenderConfig(max_depth=2, rr_bounces=0),
        validate_every=2, log_fn=logs.append,
    )
    session.run(4)
    assert session.metrics["frames"] == 4
    assert session.metrics["avg_frame_ms"] > 0
    assert len(logs) == 4 and logs[-1]["frame"] == 4
    assert session.metrics["last_report"] is not None
    assert session.metrics["last_report"].ok
    assert session.metrics["healed_texels"] == 0


def test_async_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from srt_tpu.utils import checkpoint as ckpt

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,))}
    path = str(tmp_path / "state.npz")
    fut = ckpt.save_async(path, tree, extra={"step": 7})
    fut.result()
    leaves, extra = ckpt.load(path)
    restored = ckpt.restore_into(tree, leaves)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.asarray(tree["a"]))
    assert extra["step"] == 7


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The orbax backend (ecosystem-standard format) restores the same
    pytree the npz path does; skipped where orbax is absent."""
    import pytest

    from srt_tpu.utils import checkpoint as ckpt

    if not ckpt.have_orbax():
        pytest.skip("orbax not installed")
    import jax.numpy as jnp
    import numpy as np

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,))}
    path = str(tmp_path / "orbax_state")
    ckpt.save_orbax(path, tree)
    restored = ckpt.load_orbax(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]),
                                  np.asarray(tree["b"]))
    assert ckpt.load_orbax(str(tmp_path / "missing"), tree) is None
