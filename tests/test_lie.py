import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vings_mono_tpu.ops import lie, quat_wxyz


def random_se3(rng, n):
    phi = rng.normal(size=(n, 3)) * 0.8
    t = rng.normal(size=(n, 3))
    q = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
    return jnp.asarray(np.concatenate([t.astype(np.float32), q], axis=-1))


def test_quat_roundtrip(rng):
    p = random_se3(rng, 32)
    R = lie.quat_to_matrix(p[..., 3:7])
    q2 = lie.matrix_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(p[..., 3:7] * q2, axis=-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 6)) * 0.5, jnp.float32)
    p = lie.se3_exp(xi)
    xi2 = lie.se3_log(p)
    # exact in f64 (checked separately); tolerance here is f32 roundoff
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2),
                               rtol=1e-2, atol=1e-3)


def test_exp_log_small_angle():
    xi = jnp.asarray([[1e-9, -2e-9, 1e-9, 1e-10, -1e-10, 2e-10],
                      [0, 0, 0, 0, 0, 0]], jnp.float32)
    p = lie.se3_exp(xi)
    assert np.all(np.isfinite(np.asarray(p)))
    xi2 = lie.se3_log(p)
    assert np.all(np.isfinite(np.asarray(xi2)))


def test_mul_inv_identity(rng):
    p = random_se3(rng, 16)
    e = lie.se3_mul(p, lie.se3_inv(p))
    np.testing.assert_allclose(np.asarray(e[..., :3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(e[..., 6])), 1.0, atol=1e-5)


def test_act_matches_matrix(rng):
    p = random_se3(rng, 8)
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    y1 = lie.se3_act(p, x)
    M = lie.se3_matrix(p)
    xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    y2 = jnp.einsum("nij,nj->ni", M, xh)[..., :3]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_from_matrix_roundtrip(rng):
    p = random_se3(rng, 16)
    M = lie.se3_matrix(p)
    p2 = lie.se3_from_matrix(M)
    M2 = lie.se3_matrix(p2)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M2),
                               rtol=1e-5, atol=1e-5)


def test_retr_small_step_matches_first_order(rng):
    p = random_se3(rng, 4)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 1e-4, jnp.float32)
    p2 = lie.se3_retr(p, xi)
    # log(p2 * p^-1) ~= xi for small xi
    delta = lie.se3_log(lie.se3_mul(p2, lie.se3_inv(p)))
    np.testing.assert_allclose(np.asarray(delta), np.asarray(xi),
                               rtol=1e-2, atol=1e-6)


def test_adjoint_identity(rng):
    """Adj(X) xi == log(X exp(xi) X^-1) — exact for the SE3 adjoint."""
    p = random_se3(rng, 4)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 0.1, jnp.float32)
    lhs = jnp.einsum("nij,nj->ni", lie.se3_adjoint(p), xi)
    rhs = lie.se3_log(lie.se3_mul(p, lie.se3_mul(lie.se3_exp(xi),
                                                 lie.se3_inv(p))))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-3, atol=1e-4)


def test_wxyz_matrix_matches_xyzw(rng):
    p = random_se3(rng, 16)
    q_xyzw = p[..., 3:7]
    q_wxyz = quat_wxyz.from_xyzw(q_xyzw)
    R1 = lie.quat_to_matrix(q_xyzw)
    R2 = quat_wxyz.to_matrix(q_wxyz)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2),
                               rtol=1e-5, atol=1e-5)


def test_normal_to_quat_aligns_third_column(rng):
    n = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    q = quat_wxyz.normalize(quat_wxyz.normal_to_quat(n))
    R = quat_wxyz.to_matrix(q)
    tw = R[..., :, 2]  # third column
    dot = jnp.abs(jnp.sum(tw * n, axis=-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-3)
