"""Physical thin-lens camera with PCG3D-jittered ray generation.

Capability port of the reference's generateRay/sampleUniformDisk
(reference: samples/shader.cl:89-173), batched over all pixels: identical
jitter sequence ({frameID, totalSamples, index} PCG3D input,
shader.cl:205), identical rotation order (X*Y*Z, shader.cl:140-146), and
the same pinhole shortcut when fStop == 0 (shader.cl:149-153).
"""

from __future__ import annotations

import jax.numpy as jnp

from radiance_tpu.core import math as rmath

PI = 3.14159265359


def sample_uniform_disk(u):
    """Concentric disk mapping (reference: shader.cl:89-109).  u: [..., 2]."""
    uo = 2.0 * u - 1.0
    ux, uy = uo[..., 0], uo[..., 1]
    x_major = jnp.abs(ux) > jnp.abs(uy)
    # guard the divisions; degenerate origin handled by the zero mask below
    safe_ux = jnp.where(ux == 0.0, 1.0, ux)
    safe_uy = jnp.where(uy == 0.0, 1.0, uy)
    r = jnp.where(x_major, ux, uy)
    theta = jnp.where(
        x_major,
        (PI / 4.0) * (uy / safe_ux),
        (PI / 2.0) - (PI / 4.0) * (ux / safe_uy),
    )
    out = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    zero = (ux == 0.0) & (uy == 0.0)
    return jnp.where(zero[..., None], 0.0, out)


def generate_rays(cam: dict, pixel_index, rand_input):
    """Generate camera rays for a batch of pixels.

    cam: dict of scalars with the PhysicalCamera fields (width_pixel,
    height_pixel, focal_length, sensor_width, focal_distance, f_stop,
    x, y, z, wx, wy, wz) -- rotations in radians like the reference's usage.
    pixel_index: [N] int32 flat pixel index (row major).
    rand_input: [N, 3] uint32 PCG3D input.
    Returns (origin [N,3], direction [N,3]).
    """
    w = cam["width_pixel"]
    h = cam["height_pixel"]
    xi = (pixel_index % w.astype(jnp.int32)).astype(jnp.float32)
    yi = (pixel_index // w.astype(jnp.int32)).astype(jnp.float32)

    random = rmath.pcg3d(rand_input)

    fx = (xi + random[..., 0]) / w - 0.5
    fy = 0.5 - (yi + random[..., 1]) / h

    aspect = h / w
    pin_dir = jnp.stack([
        fx * cam["sensor_width"],
        fy * cam["sensor_width"] * aspect,
        jnp.broadcast_to(-cam["focal_length"], fx.shape),
    ], axis=-1)
    pin_dir = rmath.normalize(pin_dir)
    pin_origin = jnp.stack([cam["x"], cam["y"], cam["z"]])
    # time uses the *unrotated* direction z (shader.cl:135)
    time = -cam["focal_distance"] / pin_dir[..., 2]

    rot_x = rmath.euler_x(cam["wx"])
    rot_y = rmath.euler_y(cam["wy"])
    rot_z = rmath.euler_z(cam["wz"])
    rot = rmath.mat4_mat4(rot_x, rmath.mat4_mat4(rot_y, rot_z))
    pin_dir = rmath.normalize(rmath.mat4_transform_dir(rot, pin_dir))

    # pinhole shortcut (shader.cl:149-153)
    pinhole = cam["f_stop"] == 0.0

    lens_radius = (cam["focal_length"] / jnp.where(pinhole, 1.0, cam["f_stop"])) / 2.0
    lens_pos = lens_radius * sample_uniform_disk(random[..., 1:3])
    hit_point = pin_origin + pin_dir * time[..., None]
    lens_local = jnp.stack(
        [lens_pos[..., 0], lens_pos[..., 1], jnp.zeros_like(lens_pos[..., 0])],
        axis=-1)
    lens_origin = pin_origin + rmath.mat4_transform_dir(rot, lens_local)
    lens_dir = rmath.normalize(hit_point - lens_origin)

    origin = jnp.where(pinhole, jnp.broadcast_to(pin_origin, lens_origin.shape), lens_origin)
    direction = jnp.where(pinhole, pin_dir, lens_dir)
    return origin, direction


def physical_camera_raygen(resources, pixel_index, rand_input):
    """Ray-generator for WavefrontPathTracer reading res["camera"]
    (the sample1 raygen's camera stage, shader.cl:203-206)."""
    return generate_rays(resources["camera"], pixel_index, rand_input)


def camera_params(cam) -> dict:
    """PhysicalCamera dataclass/struct-array -> dict of f32 scalars."""
    if hasattr(cam, "width_pixel"):
        fields = dict(
            width_pixel=cam.width_pixel, height_pixel=cam.height_pixel,
            focal_length=cam.focal_length, sensor_width=cam.sensor_width,
            focal_distance=cam.focal_distance, f_stop=cam.f_stop,
            x=cam.x, y=cam.y, z=cam.z, wx=cam.wx, wy=cam.wy, wz=cam.wz)
    else:  # structured numpy record
        fields = dict(
            width_pixel=cam["widthPixel"], height_pixel=cam["heightPixel"],
            focal_length=cam["focalLength"], sensor_width=cam["sensorWidth"],
            focal_distance=cam["focalDistance"], f_stop=cam["fStop"],
            x=cam["x"], y=cam["y"], z=cam["z"],
            wx=cam["wx"], wy=cam["wy"], wz=cam["wz"])
    return {k: jnp.float32(v) for k, v in fields.items()}
