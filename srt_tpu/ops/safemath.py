"""Gradient-safe math helpers.

Masked-lane hygiene for differentiable rendering: ops like sqrt/rsqrt/norm
have unbounded derivatives at 0, and ``0 cotangent * inf = NaN`` leaks
through ``jnp.where`` masks (the standard double-where problem).  Every
normalize/sqrt on data that can be degenerate in masked lanes goes through
these helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_sqrt(x, guard=1.0):
    """sqrt with a finite derivative everywhere: masked lanes (x <= 0) see
    ``guard`` inside and return 0."""
    ok = x > 0.0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, guard)), 0.0)


def safe_normalize(v, fallback=None):
    """Normalize along the last axis; zero-length inputs pass through
    unchanged (like the reference's guarded ``getLightData``, brdf.glsl:2-5)
    and contribute no NaN to gradients."""
    s = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = s > 0.0
    inv = jax.lax.rsqrt(jnp.where(ok, s, 1.0))
    out = v * jnp.where(ok, inv, 1.0)
    if fallback is not None:
        out = jnp.where(ok, out, fallback)
    return out


def safe_rcp(x, eps=0.0, guard=1.0):
    """1/x with masked-lane protection for |x| <= eps."""
    ok = jnp.abs(x) > eps
    return jnp.where(ok, 1.0 / jnp.where(ok, x, guard), 0.0)
