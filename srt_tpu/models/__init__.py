"""Renderers: the TPU wavefront path tracer and the CPU oracle."""
