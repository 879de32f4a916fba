import jax
import jax.numpy as jnp
import numpy as np

from vings_mono_tpu.ops import lie, projective as pops


def make_scene(rng, P=4, H=12, W=16):
    phi = rng.normal(size=(P, 3)) * 0.05
    t = rng.normal(size=(P, 3)) * 0.1
    q = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
    poses = jnp.asarray(np.concatenate([t.astype(np.float32), q], -1))
    disps = jnp.asarray(rng.uniform(0.2, 1.0, size=(P, H, W)), jnp.float32)
    intr = jnp.asarray([20.0, 20.0, W / 2, H / 2], jnp.float32)
    return poses, disps, intr


def test_identity_transform_is_identity(rng):
    poses, disps, intr = make_scene(rng)
    # identical poses, zero relative motion -> coords == pixel grid
    poses = jnp.tile(lie.se3_identity()[None], (4, 1))
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([1, 0])
    coords, valid = pops.projective_transform(poses, disps, intr, ii, jj)
    grid = pops.coords_grid(disps.shape[1], disps.shape[2])
    np.testing.assert_allclose(np.asarray(coords),
                               np.asarray(jnp.broadcast_to(grid, coords.shape)),
                               atol=1e-4)
    assert np.all(np.asarray(valid) > 0)


def test_jacobians_match_finite_differences(rng):
    poses, disps, intr = make_scene(rng, P=3, H=6, W=8)
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([1, 2])
    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)

    eps = 1e-4

    def coords_with_perturbed_pose(xi_flat, which):
        """Perturb pose of frame `which` by retract(xi)."""
        xi = jnp.zeros((3, 6)).at[which].set(xi_flat)
        p2 = lie.se3_retr(poses, xi)
        c, _ = pops.projective_transform(p2, disps, intr, ii, jj)
        return c

    # numeric Jj for edge 0 (jj=1): perturb pose 1
    for k in range(6):
        dxi = jnp.zeros(6).at[k].set(eps)
        cp = coords_with_perturbed_pose(dxi, 1)
        cm = coords_with_perturbed_pose(-dxi, 1)
        num = (cp - cm) / (2 * eps)
        ana_edge0 = Jj[0, ..., k]  # (H, W, 2)
        m = np.asarray(valid[0, ..., 0]) > 0
        np.testing.assert_allclose(np.asarray(num[0])[m],
                                   np.asarray(ana_edge0)[m],
                                   rtol=2e-2, atol=2e-2)
        # numeric Ji for edge 1 (ii=1): perturb pose 1 too
        ana_edge1 = Ji[1, ..., k]
        m1 = np.asarray(valid[1, ..., 0]) > 0
        np.testing.assert_allclose(np.asarray(num[1])[m1],
                                   np.asarray(ana_edge1)[m1],
                                   rtol=2e-2, atol=2e-2)

    # numeric Jz: perturb disparities of source frames
    def coords_with_disp(d):
        c, _ = pops.projective_transform(poses, d, intr, ii, jj)
        return c

    dd = jnp.zeros_like(disps).at[jnp.asarray([0, 1])].add(eps)
    # perturb all source pixels at once (each output pixel depends only on
    # its own source pixel disparity)
    cp = coords_with_disp(disps + eps)
    cm = coords_with_disp(disps - eps)
    num = (cp - cm) / (2 * eps)
    ana = Jz[..., 0]
    m = np.asarray(valid[..., 0]) > 0
    np.testing.assert_allclose(np.asarray(num)[m], np.asarray(ana)[m],
                               rtol=2e-2, atol=2e-2)


def test_induced_flow_zero_for_static(rng):
    poses, disps, intr = make_scene(rng)
    poses = jnp.tile(lie.se3_identity()[None], (4, 1))
    flow, valid = pops.induced_flow(poses, disps, intr,
                                    jnp.asarray([0]), jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def test_frame_distance_monotone_in_translation(rng):
    _, disps, intr = make_scene(rng, P=3)
    ident = lie.se3_identity()
    dists = []
    for tx in [0.0, 0.2, 0.5]:
        poses = jnp.stack([ident, ident.at[0].set(tx), ident])
        d = pops.frame_distance(poses, disps, intr,
                                jnp.asarray([0]), jnp.asarray([1]))
        dists.append(float(d[0]))
    assert dists[0] < dists[1] < dists[2]
