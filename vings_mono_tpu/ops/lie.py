"""Pure-JAX SE(3)/SO(3) Lie-group math.

TPU-native replacement for the `lietorch` CUDA extension used throughout the
reference (e.g. /root/reference/scripts/frontend/dbaf.py:11,
/root/reference/scripts/gaussian/gaussian_base.py:7). No kernels are needed:
everything is small elementwise math that XLA fuses.

Conventions (matching lietorch so DROID-style BA math carries over):
  * quaternions are stored **xyzw** (last component = scalar) unless a
    function name says `wxyz` (3DGS-convention helpers for the mapper live in
    `vings_mono_tpu.ops.quat_wxyz`).
  * an SE3 element is a 7-vector ``[tx ty tz qx qy qz qw]``; acting on a point
    is ``R @ p + t``.
  * tangent vectors are ``[tau(3), phi(3)]`` (translation first), and
    retraction is **left**-multiplicative: ``retr(X, xi) = exp(xi) * X``
    (matches lietorch's ``SE3.retr`` used by the reference BA at
    /root/reference/scripts/frontend/geom/ba.py:27).

All functions broadcast over leading batch dims and work in the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternions (xyzw)
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product, xyzw layout."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q, v):
    """Rotate 3-vectors v by unit quaternions q (xyzw)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """Unit quaternion (xyzw) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix -> unit quaternion (xyzw). Branchless Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # four candidate constructions; pick the numerically best
    q0 = mk(m21 - m12, m02 - m20, m10 - m01, 1 + tr)
    q1 = mk(1 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    q2 = mk(m01 + m10, 1 - m00 + m11 - m22, m12 + m21, m02 - m20)
    q3 = mk(m02 + m20, m12 + m21, 1 - m00 - m11 + m22, m10 - m01)
    # squared 4*w^2, 4*x^2, 4*y^2, 4*z^2
    vals = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                      1 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(vals, axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def _skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp(phi):
    """Axis-angle (3,) -> quaternion (xyzw), Taylor-safe near 0.

    NB: the large-angle branch is evaluated at a *safe* theta so reverse-mode
    autodiff through the unselected branch cannot produce 0 * inf = NaN
    (the classic double-where pitfall)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0,
                          jnp.sin(half) / theta)
    cos_half = jnp.where(small[..., 0], 1.0 - theta_sq[..., 0] / 8.0,
                         jnp.cos(half[..., 0]))
    return jnp.concatenate([phi * sinc_half, cos_half[..., None]], axis=-1)


def so3_log(q):
    """Quaternion (xyzw) -> axis-angle, Taylor-safe near identity."""
    q = q * jnp.sign(jnp.where(q[..., 3:4] == 0, 1.0, q[..., 3:4]))  # w >= 0
    qv = q[..., :3]
    qw = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_sq = jnp.sum(qv * qv, axis=-1)
    small = sin_sq < 1e-12
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sin_sq))
    theta = 2.0 * jnp.arctan2(sin_half, qw)
    scale = jnp.where(small, 2.0 / jnp.clip(qw, _EPS), theta / sin_half)
    return qv * scale[..., None]


def _so3_left_jacobian(phi):
    """V matrix such that exp([tau,phi]).t = V @ tau (autodiff-safe at 0)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    K = _skew(phi)
    KK = K @ K
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (safe_sq * theta))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def _so3_left_jacobian_inv(phi):
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    K = _skew(phi)
    KK = K @ K
    half = 0.5 * theta
    cot = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                    (1.0 - half * jnp.cos(half)
                     / jnp.where(small, 1.0, jnp.sin(half))) / safe_sq)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * K + cot[..., None, None] * KK


# ---------------------------------------------------------------------------
# SE(3): 7-vectors [t(3), q_xyzw(4)]
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32):
    p = jnp.zeros(shape + (7,), dtype)
    return p.at[..., 6].set(1.0)


def se3_mul(a, b):
    """Compose: (a * b) acts as a(b(x))."""
    t = quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(p):
    qinv = quat_conj(p[..., 3:7])
    t = -quat_rotate(qinv, p[..., :3])
    return jnp.concatenate([t, qinv], axis=-1)


def se3_act(p, x):
    """Apply pose to points x (..., 3)."""
    return quat_rotate(p[..., 3:7], x) + p[..., :3]


def se3_exp(xi):
    """Tangent [tau, phi] -> SE3 7-vector."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(p):
    phi = so3_log(p[..., 3:7])
    Vinv = _so3_left_jacobian_inv(phi)
    tau = jnp.einsum("...ij,...j->...i", Vinv, p[..., :3])
    return jnp.concatenate([tau, phi], axis=-1)


def se3_retr(p, xi):
    """Left-multiplicative retraction: exp(xi) * p (lietorch convention)."""
    return se3_mul(se3_exp(xi), p)


def se3_matrix(p):
    """7-vector -> homogeneous (..., 4, 4)."""
    R = quat_to_matrix(quat_normalize(p[..., 3:7]))
    t = p[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M):
    q = matrix_to_quat(M[..., :3, :3])
    t = M[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def se3_adjoint(p):
    """Adjoint matrix (..., 6, 6): Adj(X) [tau,phi] with translation-first
    tangent layout — [[R, skew(t) R], [0, R]]."""
    R = quat_to_matrix(quat_normalize(p[..., 3:7]))
    tR = _skew(p[..., :3]) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_adjT_apply(p, J):
    """Row-jacobian through the adjoint: J @ Adj(p).

    Mirrors lietorch's ``Gij.adjT(Jj)`` as used to get Ji from Jj in
    /root/reference/scripts/frontend/geom/projective_ops.py:118.
    J has shape (..., k, 6); returns (..., k, 6).
    """
    return J @ se3_adjoint(p)
