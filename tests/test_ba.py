"""Dense BA engine: synthetic two/three-view problems must converge to the
ground-truth relative poses (spec behavior of droid_backends.ba, numeric
reference geom/ba.py)."""

import jax.numpy as jnp
import numpy as np

from vings_mono_tpu.ops import ba, lie, projective as pops


def make_problem(rng, P=3, H=24, W=32, noise=0.0):
    f = 40.0
    intr = jnp.asarray([f, f, W / 2, H / 2], jnp.float32)
    # smooth-ish positive disparities
    disps = jnp.asarray(rng.uniform(0.25, 0.5, size=(P, H, W)), jnp.float32)
    xi = np.zeros((P, 6), np.float32)
    for k in range(1, P):
        xi[k, :3] = rng.normal(size=3) * 0.1
        xi[k, 3:] = rng.normal(size=3) * 0.02
    poses_gt = lie.se3_exp(jnp.asarray(xi))
    ii, jj = [], []
    for a in range(P):
        for b in range(P):
            if a != b:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    coords, valid = pops.projective_transform(poses_gt, disps, intr, ii, jj)
    target = jnp.moveaxis(coords, -1, 1)           # (N, 2, H, W)
    weight = jnp.ones_like(target) * jnp.moveaxis(valid, -1, 1)
    eta = jnp.full((P, H, W), 1e-2, jnp.float32)
    return poses_gt, disps, intr, ii, jj, target, weight, eta


def rel_pose_err(poses, poses_gt):
    rel = lie.se3_mul(poses[1:], lie.se3_inv(poses[:1]))
    rel_gt = lie.se3_mul(poses_gt[1:], lie.se3_inv(poses_gt[:1]))
    d = lie.se3_log(lie.se3_mul(rel, lie.se3_inv(rel_gt)))
    return float(jnp.max(jnp.abs(d)))


def test_ba_converges_to_gt(rng):
    poses_gt, disps, intr, ii, jj, target, weight, eta = make_problem(rng)
    # perturb non-fixed poses
    P = poses_gt.shape[0]
    pert = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, jnp.float32)
    pert = pert.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, pert)
    err0 = rel_pose_err(poses0, poses_gt)

    valid = jnp.ones((ii.shape[0],), bool)
    poses1, disps1 = ba.ba(target, weight, eta, poses0, disps, intr,
                           ii, jj, valid, fixedp=1, iters=6)
    err1 = rel_pose_err(poses1, poses_gt)
    assert err1 < err0 * 0.2, (err0, err1)
    assert np.all(np.asarray(disps1) >= 0)


def test_ba_dead_edges_are_inert(rng):
    poses_gt, disps, intr, ii, jj, target, weight, eta = make_problem(rng)
    pert = jnp.zeros((3, 6)).at[1, 0].set(0.05)
    poses0 = lie.se3_retr(poses_gt, pert)

    valid = jnp.ones((ii.shape[0],), bool)
    p_a, d_a = ba.ba(target, weight, eta, poses0, disps, intr, ii, jj,
                     valid, fixedp=1, iters=2)

    # append garbage edges marked invalid — result must be identical
    ii2 = jnp.concatenate([ii, jnp.asarray([0, 1], jnp.int32)])
    jj2 = jnp.concatenate([jj, jnp.asarray([2, 0], jnp.int32)])
    tg2 = jnp.concatenate([target, 1e6 * jnp.ones_like(target[:2])])
    wg2 = jnp.concatenate([weight, jnp.ones_like(weight[:2])])
    valid2 = jnp.concatenate([valid, jnp.zeros(2, bool)])
    p_b, d_b = ba.ba(tg2, wg2, eta, poses0, disps, intr, ii2, jj2,
                     valid2, fixedp=1, iters=2)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), atol=1e-6)


def test_hessian_retract_roundtrip_matches_full_step(rng):
    """One GN step via (hessian -> external solve -> retract) must equal the
    fused ba() step — this is the contract the VIO fusion relies on."""
    poses_gt, disps, intr, ii, jj, target, weight, eta = make_problem(rng)
    pert = jnp.asarray(rng.normal(size=(3, 6)) * 0.02, jnp.float32)
    pert = pert.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, pert)
    valid = jnp.ones((ii.shape[0],), bool)

    p_full, d_full = ba.ba(target, weight, eta, poses0, disps, intr, ii, jj,
                           valid, fixedp=1, iters=1)

    S, v, aux = ba.ba_hessian(target, weight, eta, poses0, disps, intr,
                              ii, jj, valid, fixedp=1)
    dx = ba.damped_solve(S, v)
    p_half, d_half = ba.ba_retract(poses0, disps, dx, aux, fixedp=1)
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_half),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_half),
                               atol=1e-6)


def _groups(ii, jj, d):
    """Host helper mirroring tracker/backend.py: per-source-frame capped
    edge adjacency for the edge-sparse Schur."""
    ii = np.asarray(ii)
    T = int(max(ii.max(), np.asarray(jj).max())) + 1
    gi = np.zeros((T, d), np.int32)
    gv = np.zeros((T, d), bool)
    for m in range(T):
        es = np.where(ii == m)[0][:d]
        gi[m, :len(es)] = es
        gv[m, :len(es)] = True
    return jnp.asarray(gi), jnp.asarray(gv)


def test_ba_global_matches_dense_window(rng):
    """ba_global (edge-sparse Schur over capped adjacency) must reproduce
    the dense-window ba step for the same edges/fixed pose."""
    poses_gt, disps, intr, ii, jj, target, weight, eta = make_problem(rng)
    P = poses_gt.shape[0]
    pert = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, jnp.float32)
    pert = pert.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, pert)
    valid = jnp.ones((ii.shape[0],), bool)

    p_a, d_a = ba.ba(target, weight, eta, poses0, disps, intr, ii, jj,
                     valid, fixedp=1, iters=3)

    gi, gv = _groups(ii, jj, d=4)
    free = jnp.arange(P) >= 1
    p_b, d_b = ba.ba_global(target, weight, eta, poses0, disps, intr,
                            ii, jj, valid, gi, gv, free, iters=3)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), atol=2e-4)


def test_ba_global_converges_to_gt(rng):
    poses_gt, disps, intr, ii, jj, target, weight, eta = make_problem(
        rng, P=5)
    P = poses_gt.shape[0]
    pert = jnp.asarray(rng.normal(size=(P, 6)) * 0.03, jnp.float32)
    pert = pert.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, pert)
    err0 = rel_pose_err(poses0, poses_gt)
    valid = jnp.ones((ii.shape[0],), bool)
    gi, gv = _groups(ii, jj, d=6)
    free = jnp.arange(P) >= 1
    p1, d1 = ba.ba_global(target, weight, eta, poses0, disps, intr,
                          ii, jj, valid, gi, gv, free, iters=6)
    err1 = rel_pose_err(p1, poses_gt)
    assert err1 < err0 * 0.2, (err0, err1)
    assert np.all(np.asarray(d1) >= 0)
