"""Host-side utilities: assets, BVH build, images, checkpoints, profiling."""
