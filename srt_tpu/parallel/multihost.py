"""Multi-host tile rendering and image assembly.

The missing top layer of the distribution story (SURVEY.md section 2.3):
after ``init_distributed`` each host sees the global device mesh; this
module gives hosts their ray-tile assignment, runs the normal sharded
trace on host-local rays, and all-gathers the tiles into the full image on
every host.  Single-process runs degrade to the trivial assembly, so the
same driver code works from 1 chip to N hosts.

Reference scale analog: the whole scene is replicated per device
(gpu_loader.cpp:142-176) and pixels are the only distributed axis — here
that axis spans hosts over DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.camera import derive_viewport, generate_rays
from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models.pathtracer import trace_wavefront
from srt_tpu.ops.rng import ArrayStream, total_slots
from srt_tpu.parallel.mesh import RAYS_AXIS, local_shard_bounds


def local_ray_tile(cam: CameraConfig, mesh, uniforms):
    """This process's rays + uniform rows.

    ``uniforms`` is the full-image [N, D] block (drawn identically on every
    host from a shared key, so tiles stay consistent); returns
    (origins [3, n_local], dirs, uniforms_local, (lo, hi))."""
    n = cam.height * cam.width
    lo, hi = local_shard_bounds(n, mesh)
    vp = derive_viewport(cam)
    origins, dirs = generate_rays(vp, cam.width, cam.height,
                                  uniforms[:, 0:2].T)
    return origins[:, lo:hi], dirs[:, lo:hi], uniforms[lo:hi], (lo, hi)


def render_local_tile(make_hit_fn, scene, lights, cam: CameraConfig,
                      cfg: RenderConfig, key, mesh):
    """Trace only this host's tile (host-local rows of the wavefront).

    The per-host computation of a multi-host render: rays are generated
    for the local row range only, so no host materializes the full image.
    Returns (radiance [3, n_local], (lo, hi))."""
    n = cam.height * cam.width
    d = total_slots(lights.count, cfg.max_depth + cfg.rr_bounces)
    uniforms = jax.random.uniform(key, (n, d), dtype=jnp.float32)
    o, dirs, u_local, (lo, hi) = local_ray_tile(cam, mesh, uniforms)
    stream = ArrayStream(u_local)
    stream.take(2)  # jitter rows consumed by local_ray_tile's ray gen
    radiance = trace_wavefront(make_hit_fn(scene), lights, o, dirs,
                               stream, cfg)
    return radiance, (lo, hi)


def assemble_image(local_radiance, bounds, cam: CameraConfig):
    """Gather per-host tiles into the full [H, W, 3] image on every host.

    Multi-process: ``process_allgather`` over DCN (tiles are concatenated
    in process order, which matches the contiguous row ownership checked
    by ``local_shard_bounds``).  Single-process: the tile IS the image.
    """
    lo, hi = bounds
    n = cam.height * cam.width
    if jax.process_count() == 1:
        assert (lo, hi) == (0, n)
        return np.asarray(local_radiance).T.reshape(cam.height, cam.width, 3)
    from jax.experimental import multihost_utils
    tiles = multihost_utils.process_allgather(local_radiance)  # [P, 3, n/P]
    flat = np.concatenate([np.asarray(t) for t in tiles], axis=1)
    return flat.T.reshape(cam.height, cam.width, 3)


def render_multihost(make_hit_fn, scene, lights, cam: CameraConfig,
                     cfg: RenderConfig, key, mesh):
    """Full multi-host render: local tile trace + cross-host assembly."""
    radiance, bounds = render_local_tile(make_hit_fn, scene, lights, cam,
                                         cfg, key, mesh)
    return assemble_image(radiance, bounds, cam)
