"""Built-in PBR shader set: the sample1 megakernel's user shaders, batched.

Wavefront ports of the reference's user shaders (reference:
samples/shader.cl:482-572): `material` (direct light + shadow ray + GGX
importance-sampled GI with transmission), `environment`, `shadow`,
`shadowMiss`, `anyShadow`.  Registered into a ShaderBindingTable under the
same names so the reference's sbt.json drives the same dispatch.

Debug render modes 1..17 follow the reference's probe set
(shader2.cl:333-372 live / shader.cl:607-714): 1 normal, 2 L, 3 V,
4 NdotL, 5 BRDF, 6 shadow, 7 barycentrics, 8 albedo, 9 metallic,
10 roughness, 11 diffuse term, 12 Fresnel, 13 GGX D, 14 Smith-Disney G,
15 Schlick-Smith G, 16 height-correlated Smith G, 17 pbrt G.
"""

from __future__ import annotations

import jax.numpy as jnp

from radiance_tpu.core import math as rmath
from radiance_tpu.engine import context as ctx_mod
from radiance_tpu.engine.context import Payload, ShadeContext
from radiance_tpu.shading import pbr


def material(ctx: ShadeContext, payload: Payload) -> Payload:
    """Closest-hit PBR shader (reference: shader.cl:482-541)."""
    res = ctx.resources
    n = ctx.ray_origin.shape[0]

    face_n = ctx_mod.get_face_normal(ctx, res)
    hit_pos = ctx_mod.get_hit_position(ctx, face_n)
    nrm = ctx_mod.get_mat_normal(ctx, res, face_n)
    light = ctx_mod.get_light_direction(res)
    l = jnp.broadcast_to(light, (n, 3))
    v = ctx_mod.get_view_direction(ctx)

    mat = ctx_mod.get_material_prop(ctx, res)
    metallic, roughness = mat[:, 0], mat[:, 1]
    transmission, ior = mat[:, 2], mat[:, 3]
    albedo = ctx_mod.get_albedo(ctx, res)

    # shadow ray (shader.cl:499-501): occlusion query with any-hit
    # terminate; dead dispatch lanes park instead of tracing
    occluded = ctx.trace_occlusion(hit_pos, l, 0.001, 1000.0,
                                   active=ctx.active)

    radiance = res["light_color"][0, :3]
    direct = pbr.microfacet_brdf(l, v, nrm, albedo, metallic, roughness,
                                 transmission, ior) * radiance
    color = jnp.where(occluded[:, None], 0.0, direct)
    color = color + albedo * 0.1  # ambient (shader.cl:512)

    # --- global illumination (shader.cl:518-540) ---
    rand_input = jnp.stack([
        jnp.broadcast_to(ctx.frame_id, (n,)).astype(jnp.uint32),
        ctx.pixel_index.astype(jnp.uint32),
        jnp.broadcast_to(ctx.depth, (n,)).astype(jnp.uint32),
    ], axis=-1)
    random = rmath.pcg3d(rand_input)
    next_dir, next_factor = pbr.sample_microfacet_brdf_transm(
        v, nrm, albedo, metallic, roughness, transmission, ior, random)
    # transmitted rays restart from the far side (shader.cl:530-531)
    below = rmath.dot(next_dir, nrm) < 0.0
    hit_pos_out = jnp.where(below[:, None],
                            ctx_mod.get_hit_position(ctx, -face_n), hit_pos)

    if ctx.debug:
        color = _debug_color(ctx, res, color, nrm, l, v, albedo,
                             metallic, roughness, occluded)

    return payload.replace(
        color=color,
        hit=jnp.ones(n, bool),
        next_origin=hit_pos_out,
        next_dir=next_dir,
        next_factor=next_factor,
    )


def _debug_color(ctx, res, color, nrm, l, v, albedo, metallic, roughness,
                 occluded):
    d = ctx.debug
    if d == 1:
        return nrm / 2.0 + 0.5
    if d == 2:
        return l / 2.0 + 0.5
    if d == 3:
        return v / 2.0 + 0.5
    if d == 4:
        return jnp.broadcast_to((rmath.dot(nrm, l) / 2.0 + 0.5)[:, None], albedo.shape)
    if d == 5:
        a = pbr.brdf(l, v, nrm, metallic, roughness, albedo)
        return a / (a + 1.0)
    if d == 6:
        return jnp.broadcast_to(jnp.where(occluded, 0.0, 1.0)[:, None], albedo.shape)
    if d == 7:
        return ctx.bary
    if d == 8:
        return albedo
    if d == 9:
        return jnp.broadcast_to(metallic[:, None], albedo.shape)
    if d == 10:
        return jnp.broadcast_to(roughness[:, None], albedo.shape)
    # BRDF term probes (reference: shader.cl:663-714)
    h = rmath.normalize(v + l, eps=1e-30)
    dot_vh = jnp.clip(rmath.dot(v, h), 0.0, 1.0)
    dot_nh = jnp.clip(rmath.dot(nrm, h), 0.0, 1.0)
    dot_nv = jnp.clip(rmath.dot(nrm, v), 0.0, 1.0)
    dot_nl = jnp.clip(rmath.dot(nrm, l), 0.0, 1.0)
    if d == 11:  # diffuse component
        f = pbr.f_schlick(dot_vh, metallic, albedo)
        c_diff = albedo * (1.0 - metallic[:, None])
        return (1.0 - f) * (1.0 / 3.1415) * c_diff
    if d == 12:  # Fresnel reflection
        return pbr.f_schlick(dot_vh, metallic, albedo)
    if d == 13:  # GGX NDF
        dd = jnp.clip(pbr.d_ggx(dot_nh, roughness), 0.0, 1.0)
        return jnp.broadcast_to(dd[:, None], albedo.shape)
    if d == 14:  # Smith-Disney geometry
        g = pbr.g_smith_disney(dot_nl, dot_nv, roughness)
        return jnp.broadcast_to(g[:, None], albedo.shape)
    if d == 15:  # Schlick-Smith GGX geometry
        g = pbr.g_schlick_smith_ggx(dot_nl, dot_nv, roughness)
        return jnp.broadcast_to(g[:, None], albedo.shape)
    if d == 16:  # height-correlated Smith (displayed via x/(x+1))
        g = pbr.g_smith_ggx_correlated(dot_nl, dot_nv, roughness)
        x = 1.0 / g
        return jnp.broadcast_to((x / (x + 1.0))[:, None], albedo.shape)
    if d == 17:  # pbrt Smith-Lambda geometry
        g = pbr.g_pbrt(v, l, nrm, roughness)
        return jnp.broadcast_to(g[:, None], albedo.shape)
    return color


def environment(ctx: ShadeContext, payload: Payload) -> Payload:
    """Primary miss shader (reference: shader.cl:550-557)."""
    n = ctx.ray_origin.shape[0]
    bg = jnp.broadcast_to(jnp.asarray([0.2, 0.2, 0.5], jnp.float32), (n, 3))
    return payload.replace(color=bg, hit=jnp.zeros(n, bool))


def shadow(ctx: ShadeContext, payload: Payload) -> Payload:
    """Shadow-ray closest hit (reference: shader.cl:559-565)."""
    n = ctx.ray_origin.shape[0]
    return payload.replace(color=jnp.zeros((n, 3), jnp.float32),
                           hit=jnp.ones(n, bool))


def shadow_miss(ctx: ShadeContext, payload: Payload) -> Payload:
    """Shadow-ray miss (reference: shader.cl:543-548)."""
    n = ctx.ray_origin.shape[0]
    return payload.replace(color=jnp.ones((n, 3), jnp.float32),
                           hit=jnp.zeros(n, bool))


def any_shadow(cand, res):
    """anyShadow: accept every candidate and stop the walk at the first
    (reference: shader.cl:567-572, cont=false).  Marked canonical so the
    SBT routes occlusion traces through the traversal's built-in
    any_hit_terminate flag (identical semantics, no shader evaluation)."""
    accept = jnp.ones_like(cand.valid)
    return accept, accept


any_shadow.terminate_on_first = True


SHADER_REGISTRY = {
    "material": material,
    "environment": environment,
    "shadow": shadow,
    "shadowMiss": shadow_miss,
    "anyShadow": any_shadow,
}

# the reference's SBT layout (samples/sbt.json)
DEFAULT_SBT_RECORDS = [
    {"raygen": "raygen", "closestHit": "", "anyHit": "", "miss": ""},
    {"raygen": "", "closestHit": "material", "anyHit": "", "miss": ""},
    {"raygen": "", "closestHit": "shadow", "anyHit": "anyShadow", "miss": ""},
    {"raygen": "", "closestHit": "", "anyHit": "", "miss": "environment"},
    {"raygen": "", "closestHit": "", "anyHit": "", "miss": "shadowMiss"},
]
