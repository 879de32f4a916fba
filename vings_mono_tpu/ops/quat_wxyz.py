"""3DGS-convention quaternion helpers (wxyz layout), pure JAX.

The mapper stores Gaussian rotations as **wxyz** quaternions like the
reference (/root/reference/scripts/gaussian/normal_utils.py:23-43); the
tracker/lie code uses xyzw (lietorch layout). Keep the two worlds separate and
convert explicitly at boundaries.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def normalize(q):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def to_matrix(q):
    """Unit wxyz quaternion -> rotation matrix (..., 3, 3) whose COLUMNS are
    the rotated basis axes (t_u, t_v, t_w for a 2D surfel)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def from_xyzw(q):
    return jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def to_xyzw(q):
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def normal_to_quat(normals):
    """Unit normal -> wxyz quaternion whose third rotation column (t_w, the
    surfel normal axis) aligns with it.

    The reference has a closed form for this (normal_utils.py:66-84) that is
    numerically wrong and unused in its main path (Gaussians are initialized
    with *random* quats, gaussian_utils.py:48); here we use the exact
    shortest-arc rotation taking e_z to the normal.
    """
    a, b, c = jnp.moveaxis(normals, -1, 0)
    w = 1.0 + c
    x = -b
    y = a
    z = jnp.zeros_like(a)
    q = jnp.stack([w, x, y, z], axis=-1)
    # n ~ -e_z is degenerate; fall back to a 180-degree flip about x
    flip = jnp.stack([jnp.zeros_like(a), jnp.ones_like(a),
                      jnp.zeros_like(a), jnp.zeros_like(a)], axis=-1)
    q = jnp.where((w < 1e-6)[..., None], flip, q)
    return normalize(q)
