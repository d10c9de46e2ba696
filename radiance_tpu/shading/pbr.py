"""PBR material library: GGX microfacet BRDF eval + importance sampling.

Capability port of the reference's device PBR library
(reference: radiance/shader/pbr.cl), batched over shading wavefronts.
Every function takes [..., 3] / [...] arrays and returns the same.

The reference's branchy samplers (diffuse-vs-specular split on random.z,
transmission branch) become computed-everywhere-then-select, which is the
natural wavefront form on a vector machine.
"""

from __future__ import annotations

import jax.numpy as jnp

from radiance_tpu.core import math as rmath

PI = 3.14159265359


def d_ggx(dot_nh, roughness):
    """GGX normal distribution (reference: pbr.cl:6-13)."""
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    denom = dot_nh * dot_nh * (alpha2 - 1.0) + 1.0
    return alpha2 / (PI * denom * denom)


def g1_ggx_schlick(n_dot_v, roughness):
    """Disney-remapped Schlick G1 (reference: pbr.cl:16-22)."""
    r = 0.5 + 0.5 * roughness
    k = (r * r) / 2.0
    denom = n_dot_v * (1.0 - k) + k
    return n_dot_v / denom


def g_smith_disney(n_dot_l, n_dot_v, roughness):
    """reference: pbr.cl:24-28."""
    return g1_ggx_schlick(n_dot_l, roughness) * g1_ggx_schlick(n_dot_v, roughness)


def f_schlick(cos_theta, metallic, albedo):
    """Schlick Fresnel with 0.04 dielectric base (reference: pbr.cl:31-37).

    cos_theta/metallic: [...]; albedo: [..., 3] -> [..., 3].
    """
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    p = jnp.power(jnp.maximum(1.0 - cos_theta, 0.0), 5.0)
    return f0 + (1.0 - f0) * p[..., None]


def _local_frame_coords(w, n):
    """Coordinates of w in the tangent frame of n.

    The reference builds GetNormalSpace(N) and inverts the 4x4 per call
    (pbr.cl:87-90); the frame is orthonormal so the inverse is three dots.
    """
    some_vec = jnp.zeros_like(n).at[..., 0].set(1.0)
    dd = rmath.dot(some_vec, n)
    default_tangent = jnp.zeros_like(n).at[..., 1].set(1.0)
    crossed = rmath.cross(some_vec, n)
    use_cross = (1.0 - jnp.abs(dd)) > 1e-6
    tangent = jnp.where(use_cross[..., None],
                        rmath.normalize(crossed, eps=1e-30), default_tangent)
    bitangent = rmath.cross(n, tangent)
    return rmath.dot(w, tangent), rmath.dot(w, bitangent), rmath.dot(w, n)


def _lambda_ggx(x, y, z, a):
    """pbrt Smith Lambda on local coords (reference: pbr.cl:66-73)."""
    cos2 = z * z
    sin2 = jnp.maximum(0.0, 1.0 - cos2)
    tan2 = sin2 / cos2
    sin_theta = jnp.sqrt(sin2)
    cos_phi = jnp.where(sin_theta == 0.0, 1.0, jnp.clip(x / jnp.where(sin_theta == 0.0, 1.0, sin_theta), -1.0, 1.0))
    sin_phi = jnp.where(sin_theta == 0.0, 0.0, jnp.clip(y / jnp.where(sin_theta == 0.0, 1.0, sin_theta), -1.0, 1.0))
    alpha2 = (cos_phi * a) ** 2 + (sin_phi * a) ** 2
    lam = (jnp.sqrt(1.0 + alpha2 * tan2) - 1.0) / 2.0
    return jnp.where(jnp.isinf(tan2), 0.0, lam)


def g_pbrt(wo, wi, n, roughness):
    """pbrt-style Smith G via local-frame Lambda (reference: pbr.cl:76-96)."""
    ox, oy, oz = _local_frame_coords(wo, n)
    ix, iy, iz = _local_frame_coords(wi, n)
    g = 1.0 / (1.0 + _lambda_ggx(ix, iy, iz, roughness) + _lambda_ggx(ox, oy, oz, roughness))
    return jnp.where((iz < 0.0) | (oz < 0.0), 0.0, g)


def g_schlick_smith_ggx(dot_nl, dot_nv, roughness):
    """UE4-style Schlick-Smith (reference: pbr.cl:99-106)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    gl = dot_nl / (dot_nl * (1.0 - k) + k)
    gv = dot_nv / (dot_nv * (1.0 - k) + k)
    return gl * gv


def g_smith_ggx_correlated(n_dot_l, n_dot_v, roughness):
    """Filament height-correlated Smith (reference: pbr.cl:126-132)."""
    a2 = roughness * roughness
    ggxl = n_dot_v * jnp.sqrt((-n_dot_l * a2 + n_dot_l) * n_dot_l + a2)
    ggxv = n_dot_l * jnp.sqrt((-n_dot_v * a2 + n_dot_v) * n_dot_v + a2)
    return 0.5 / (ggxv + ggxl)


def brdf(l, v, n, metallic, roughness, albedo):
    """Direct-light BRDF (reference: pbr.cl:147-169, used by shader2).

    Returns (f_diffuse + f_specular) * NdotL, G term = g_pbrt.
    """
    roughness = jnp.maximum(0.05, roughness)
    h = rmath.normalize(v + l, eps=1e-30)
    dot_nv = jnp.clip(rmath.dot(n, v), 0.0, 1.0)
    dot_nl = jnp.clip(rmath.dot(n, l), 0.0, 1.0)
    dot_nh = jnp.clip(rmath.dot(n, h), 0.0, 1.0)
    dot_vh = jnp.clip(rmath.dot(v, h), 0.0, 1.0)

    d = d_ggx(dot_nh, roughness)
    g = g_pbrt(v, l, n, roughness)
    f = f_schlick(dot_vh, metallic, albedo)

    c_diff = albedo * (1.0 - metallic[..., None])
    f_diffuse = (1.0 - f) * (1.0 / PI) * c_diff
    f_specular = f * (d * g / jnp.maximum(4.0 * dot_nl * dot_nv, 0.001))[..., None]
    return (f_diffuse + f_specular) * dot_nl[..., None]


def microfacet_brdf(l, v, n, albedo, metallic, roughness, transmission, ior):
    """Transmission-weighted eval BRDF (reference: pbr.cl:268-287, sample1)."""
    h = rmath.normalize(v + l, eps=1e-30)
    dot_nv = jnp.clip(rmath.dot(n, v), 0.0, 1.0)
    dot_nl = jnp.clip(rmath.dot(n, l), 0.0, 1.0)
    dot_nh = jnp.clip(rmath.dot(n, h), 0.0, 1.0)
    dot_vh = jnp.clip(rmath.dot(v, h), 0.0, 1.0)

    f = f_schlick(dot_vh, metallic, albedo)
    d = d_ggx(dot_nh, roughness)
    g = g_pbrt(v, l, n, roughness)

    f_specular = f * (d * g / jnp.maximum(4.0 * dot_nv * dot_nl, 0.001))[..., None]
    not_spec = (1.0 - f) * (1.0 - metallic[..., None]) * (1.0 - transmission[..., None])
    f_diffuse = not_spec * (albedo / PI)
    return (f_diffuse + f_specular) * dot_nl[..., None]


def _diffuse_dir(n, rx, ry):
    """Cosine-importance-sampled diffuse direction (pbr.cl:210-217)."""
    theta = jnp.arccos(jnp.sqrt(ry))
    phi = 2.0 * PI * rx
    st, ct = jnp.sin(theta), jnp.cos(theta)
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    return rmath.transform_local_dir(n, local)


def _ggx_half_dir(n, roughness, rx, ry):
    """GGX-importance-sampled half vector (pbr.cl:236-244)."""
    a = roughness * roughness
    theta = jnp.arccos(jnp.sqrt((1.0 - ry) / (1.0 + (a * a - 1.0) * ry)))
    phi = 2.0 * PI * rx
    st, ct = jnp.sin(theta), jnp.cos(theta)
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    return rmath.transform_local_dir(n, local)


def sample_microfacet_brdf(v, n, base_color, metallic, roughness, random):
    """Split diffuse/specular importance sampler (reference: pbr.cl:199-266).

    random: [..., 3] in [0,1].  Returns (L [...,3], next_factor [...,3]).
    """
    rx, ry, rz = random[..., 0], random[..., 1], random[..., 2]

    # diffuse branch (rz > 0.5)
    l_diff = _diffuse_dir(n, rx, ry)
    h_d = rmath.normalize(v + l_diff, eps=1e-30)
    dot_vh_d = jnp.clip(rmath.dot(v, h_d), 0.0, 1.0)
    f_d = f_schlick(dot_vh_d, metallic, base_color)
    reflectance = base_color * (1.0 - metallic[..., None])
    factor_diff = reflectance * (1.0 - f_d) * 2.0

    # specular branch
    h_s = _ggx_half_dir(n, roughness, rx, ry)
    l_spec = rmath.reflect(v, h_s)
    no_v = jnp.clip(rmath.dot(n, v), 0.0, 1.0)
    no_h = jnp.clip(rmath.dot(n, h_s), 0.0, 1.0)
    vo_h = jnp.clip(rmath.dot(v, h_s), 0.0, 1.0)
    rr = jnp.maximum(0.05, roughness)
    g = g_pbrt(v, l_spec, n, rr)
    f_s = f_schlick(vo_h, metallic, base_color)
    factor_spec = f_s * (g * vo_h / jnp.maximum(no_h * no_v, 0.001))[..., None] * 2.0

    use_diff = (rz > 0.5)[..., None]
    return (jnp.where(use_diff, l_diff, l_spec),
            jnp.where(use_diff, factor_diff, factor_spec))


def sample_microfacet_brdf_transm(v, n, base_color, metallic, roughness,
                                  transmission, ior, random):
    """Transmission-aware sampler (reference: pbr.cl:289-385).

    Branch layout matches the reference: rz >= 0.5 -> specular;
    rz < 0.5 and 2*rz < transmission -> refracted; else diffuse.
    Returns (L [...,3], next_factor [...,3]).
    """
    rx, ry, rz = random[..., 0], random[..., 1], random[..., 2]

    # ---- transmitted branch ----
    front = rmath.dot(v, n)
    fwd_n = jnp.where((front < 0.0)[..., None], -n, n)
    eta = jnp.where(front < 0.0, 1.0 / ior, ior)
    h_t = _ggx_half_dir(fwd_n, roughness, rx, ry)
    l_t = rmath.refract(v, h_t, eta)
    no_v_t = jnp.clip(rmath.dot(fwd_n, v), 0.0, 1.0)
    no_h_t = jnp.clip(rmath.dot(fwd_n, h_t), 0.0, 1.0)
    vo_h_t = jnp.clip(rmath.dot(v, h_t), 0.0, 1.0)
    f_t = f_schlick(vo_h_t, metallic, base_color)
    g_t = g_pbrt(v, -l_t, fwd_n, roughness)
    factor_t = base_color * (1.0 - f_t) * (g_t * vo_h_t / jnp.maximum(no_h_t * no_v_t, 0.001))[..., None] * 2.0

    # ---- diffuse branch ----
    l_d = _diffuse_dir(n, rx, ry)
    h_d = rmath.normalize(v + l_d, eps=1e-30)
    vo_h_d = jnp.clip(rmath.dot(v, h_d), 0.0, 1.0)
    f_d = f_schlick(vo_h_d, metallic, base_color)
    factor_d = (1.0 - f_d) * (1.0 - metallic[..., None]) * base_color * 2.0

    # ---- specular branch ----
    h_s = _ggx_half_dir(n, roughness, rx, ry)
    l_s = rmath.reflect(v, h_s)
    no_v_s = jnp.clip(rmath.dot(n, v), 0.0, 1.0)
    no_h_s = jnp.clip(rmath.dot(n, h_s), 0.0, 1.0)
    vo_h_s = jnp.clip(rmath.dot(v, h_s), 0.0, 1.0)
    d_unused = d_ggx(no_h_s, roughness)  # the reference computes D but the factor omits it
    del d_unused
    g_s = g_pbrt(v, l_s, n, roughness)
    f_s = f_schlick(vo_h_s, metallic, base_color)
    factor_s = f_s * (g_s * vo_h_s / jnp.maximum(no_h_s * no_v_s, 0.001))[..., None] * 2.0

    is_spec = (rz >= 0.5)
    is_transm = (~is_spec) & (2.0 * rz < transmission)
    l_out = jnp.where(is_spec[..., None], l_s,
                      jnp.where(is_transm[..., None], l_t, l_d))
    f_out = jnp.where(is_spec[..., None], factor_s,
                      jnp.where(is_transm[..., None], factor_t, factor_d))
    return l_out, f_out
