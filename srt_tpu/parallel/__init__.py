"""Device-mesh parallelism: sharded rendering and multi-host scaling.

The reference's only parallelism is SIMT over pixels within one GPU
(8x8 workgroups, src/main.cpp:706); distribution here is a new first-class
capability (SURVEY.md section 2.3): rays/pixels shard over a
``jax.sharding.Mesh`` (data parallel) and samples-per-pixel over a second
axis (sample parallel), the scene is replicated, and scene-parameter
gradients are psum-reduced across the mesh by shard_map's replication
semantics — XLA places the collectives on ICI.
"""

from srt_tpu.parallel.mesh import device_mesh, RAYS_AXIS, SAMPLES_AXIS
from srt_tpu.parallel.render_sharded import (
    render_sharded,
    trace_sharded,
    sharded_loss_and_grad,
)
