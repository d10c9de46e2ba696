"""HDR tonemapping + quantization (reference: samples/shader.cl:47-87, 283-305)."""

from __future__ import annotations

import jax.numpy as jnp


def aces_approx(v):
    """Narkowicz ACES approximation (reference: shader.cl:47-56)."""
    v = v * 0.6
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((v * (a * v + b)) / (v * (c * v + d) + e), 0.0, 1.0)


def _uncharted2_partial(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def uncharted2_filmic(v):
    """reference: shader.cl:58-77."""
    exposure_bias = 2.0
    curr = _uncharted2_partial(v * exposure_bias)
    white_scale = 1.0 / _uncharted2_partial(jnp.float32(11.2))
    return jnp.clip(curr * white_scale, 0.0, 1.0)


def reinhard(v):
    """reference: shader.cl:84-87."""
    return v / (v + 1.0)


def clamping(v):
    return jnp.clip(v, 0.0, 1.0)


def gamma(v, g):
    return jnp.power(jnp.maximum(v, 0.0), g)


def quantize_rgba8(rgb):
    """float [..., 3] -> uint8 [..., 4] with alpha 255.

    Matches the reference's (int)(c * 255) truncation (shader.cl:301-304).
    """
    q = jnp.clip(jnp.floor(rgb * 255.0), 0.0, 255.0).astype(jnp.uint8)
    alpha = jnp.full(q.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([q, alpha], axis=-1)


def tonemap_sample1(rgb):
    """sample1's pipeline: ACES then gamma 0.7 (shader.cl:294-298)."""
    return gamma(aces_approx(rgb), 0.7)


def tonemap_sample2(rgb):
    """sample2's pipeline: Reinhard then gamma 0.4545 (shader2.cl:171-174)."""
    return gamma(reinhard(rgb), 0.4545)
