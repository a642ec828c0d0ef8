"""Device mesh construction and multi-host initialization."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

RAYS_AXIS = "rays"      # data parallel over pixels/rays
SAMPLES_AXIS = "samples"  # sample parallel over spp


def device_mesh(n_rays_shards: Optional[int] = None,
                n_sample_shards: int = 1,
                devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """Build a (rays, samples) mesh over the available devices.

    Default: all devices on the rays axis — the TPU analog of the
    reference's (W/8)x(H/8) workgroup grid, but across chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_rays_shards is None:
        n_rays_shards = len(devices) // n_sample_shards
    use = n_rays_shards * n_sample_shards
    arr = np.asarray(devices[:use]).reshape(n_rays_shards, n_sample_shards)
    return jax.sharding.Mesh(arr, (RAYS_AXIS, SAMPLES_AXIS))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with explicit or
    env-provided topology.  After this, ``jax.devices()`` spans all hosts
    and meshes built from it shard across DCN/ICI automatically.  No-op if
    already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized or single-process run.
        pass


def local_shard_bounds(n: int, mesh: jax.sharding.Mesh) -> tuple:
    """Row range of ``n`` items owned by this process under rays-sharding —
    used by multi-host drivers to generate only their tile of the image."""
    total = mesh.shape[RAYS_AXIS]
    per = n // total
    # Processes own contiguous blocks of the rays axis in mesh order.
    procs = jax.process_count()
    shards_per_proc = max(1, total // procs)
    lo = jax.process_index() * shards_per_proc * per
    hi = lo + shards_per_proc * per
    return lo, min(hi, n)
