"""Tonemapping, accumulation, and NaN diagnostics.

The display path of the reference megakernel (raytrace_compute.glsl:395-413):
progressive accumulation into an rgba32f buffer, division by the frame count,
linear->sRGB conversion, and NaN pixels flagged bright green.
"""

from __future__ import annotations

import jax.numpy as jnp

NAN_SENTINEL = (0.0, 1.0, 0.0)  # NaN pixels render green (glsl:408-410)


def linear_to_srgb(linear):
    """Piecewise sRGB transfer (``linearToSrgb``, raytrace_utils.glsl:177-184)."""
    lo = linear * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(linear < 0.0031308, lo, hi)


def flag_nans(color):
    """Replace NaN samples with the green sentinel, per pixel ([..., 3])."""
    bad = jnp.any(jnp.isnan(color), axis=-1, keepdims=True)
    return jnp.where(bad, jnp.asarray(NAN_SENTINEL, color.dtype), color)


def accumulate(accum, sample, frames_done):
    """One progressive-accumulation step.

    accum: [..., 3] running linear sum; sample: new frame's linear color;
    frames_done: frames in ``accum`` *before* this one.  Returns
    (new_accum, display) where display is sRGB in [0, 1]
    (raytrace_compute.glsl:404-413).
    """
    new_accum = accum + flag_nans(sample)
    display = jnp.clip(linear_to_srgb(new_accum / (frames_done + 1)), 0.0, 1.0)
    return new_accum, display


def resolve(accum, frames):
    """Final resolve of an accumulation buffer to sRGB."""
    return jnp.clip(linear_to_srgb(accum / jnp.maximum(frames, 1)), 0.0, 1.0)
