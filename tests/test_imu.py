"""IMU preintegration + window factor graph: analytic Jacobians vs finite
differences, predict() vs direct integration, LM convergence, and
marginalization consistency."""

import numpy as np
import pytest

from vings_mono_tpu.tracker.imu import (ImuParams, Preintegration, so3_exp,
                                        so3_log)
from vings_mono_tpu.tracker import factor_graph as fg


def simulate(n_steps=100, dt=0.005, bg=None, ba=None, seed=0):
    """Ground-truth trajectory + perfect IMU (body rates), fine Euler."""
    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -9.81])
    R = so3_exp(rng.normal(size=3) * 0.1)
    p = np.zeros(3)
    v = np.array([0.5, -0.2, 0.1])
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba
    states = [(R.copy(), p.copy(), v.copy())]
    meas = []
    for k in range(n_steps):
        w = np.array([0.3 * np.sin(0.05 * k), 0.2, -0.1])
        a_body = np.array([0.5, 0.1 * np.cos(0.05 * k), 9.81]) \
            - R.T @ g - np.array([0, 0, 9.81]) + np.array([0, 0, 9.81])
        a_body = np.array([0.5, 0.1 * np.cos(0.05 * k), 0.3]) - R.T @ g
        # Euler step matching the preintegration convention
        p = p + v * dt + 0.5 * (R @ a_body + g) * dt**2
        v = v + (R @ a_body + g) * dt
        R = R @ so3_exp(w * dt)
        states.append((R.copy(), p.copy(), v.copy()))
        meas.append((a_body + ba, w + bg, dt))
    return states, meas


def test_predict_matches_direct_integration():
    states, meas = simulate()
    pre = Preintegration(ImuParams())
    for a, w, dt in meas:
        pre.integrate(a, w, dt)
    R0, p0, v0 = states[0]
    Rn, pn, vn = states[-1]
    Rp, pp, vp = pre.predict(R0, p0, v0)
    assert np.abs(so3_log(Rp.T @ Rn)).max() < 1e-3
    np.testing.assert_allclose(pp, pn, atol=1e-3)
    np.testing.assert_allclose(vp, vn, atol=1e-3)


def test_residual_zero_at_truth_and_bias_correction():
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.02, -0.03])
    states, meas = simulate(bg=bg, ba=ba)
    # preintegrate at slightly wrong bias, correct via first-order terms
    bg_lin = bg + np.array([2e-3, -1e-3, 1e-3])
    ba_lin = ba + np.array([-5e-3, 2e-3, 4e-3])
    pre = Preintegration(ImuParams(), bg=bg_lin, ba=ba_lin)
    for a, w, dt in meas:
        pre.integrate(a, w, dt)
    R0, p0, v0 = states[0]
    Rn, pn, vn = states[-1]
    r, _ = pre.residual(R0, p0, v0, bg, ba, Rn, pn, vn, bg, ba)
    assert np.abs(r[:9]).max() < 5e-3, r


def test_imu_factor_jacobians_match_fd():
    states, meas = simulate(n_steps=40)
    pre = Preintegration(ImuParams())
    for a, w, dt in meas:
        pre.integrate(a, w, dt)
    R0, p0, v0 = states[0]
    Rn, pn, vn = states[-1]
    rng = np.random.default_rng(1)
    b_i = rng.normal(size=6) * 0.01
    b_j = rng.normal(size=6) * 0.01

    def res(d_i15, d_j15):
        si = fg.FrameState(R0, p0, v0, b_i).retract(d_i15)
        sj = fg.FrameState(Rn, pn, vn, b_j).retract(d_j15)
        r, _ = pre.residual(si.R, si.p, si.v, si.b[:3], si.b[3:],
                            sj.R, sj.p, sj.v, sj.b[:3], sj.b[3:])
        return r

    r0, (Jpi, Jvi, Jbi, Jpj, Jvj, Jbj) = pre.residual(
        R0, p0, v0, b_i[:3], b_i[3:], Rn, pn, vn, b_j[:3], b_j[3:])
    Ji = np.concatenate([Jpi, Jvi, Jbi], axis=1)
    Jj = np.concatenate([Jpj, Jvj, Jbj], axis=1)
    eps = 1e-6
    for k in range(15):
        d = np.zeros(15)
        d[k] = eps
        fd_i = (res(d, np.zeros(15)) - res(-d, np.zeros(15))) / (2 * eps)
        fd_j = (res(np.zeros(15), d) - res(np.zeros(15), -d)) / (2 * eps)
        np.testing.assert_allclose(fd_i, Ji[:, k], atol=2e-4,
                                   err_msg=f"J_i col {k}")
        np.testing.assert_allclose(fd_j, Jj[:, k], atol=2e-4,
                                   err_msg=f"J_j col {k}")


def test_covariance_psd():
    _, meas = simulate(n_steps=60)
    pre = Preintegration(ImuParams())
    for a, w, dt in meas:
        pre.integrate(a, w, dt)
    ev = np.linalg.eigvalsh(pre.cov)
    assert ev.min() > -1e-12
    assert np.isfinite(pre.information()).all()


def test_velbody_and_prior_jacobians_fd():
    rng = np.random.default_rng(2)
    s = fg.FrameState(so3_exp(rng.normal(size=3)), rng.normal(size=3),
                      rng.normal(size=3), rng.normal(size=6) * 0.01)
    for fac in [fg.VelBodyFactor(0, rng.normal(size=3), np.ones(3)),
                fg.PriorPoseFactor(0, so3_exp(rng.normal(size=3) * 0.3),
                                   rng.normal(size=3), np.ones(6))]:
        r0, Js, _ = fac.linearize({0: s})
        J = Js[0]
        eps = 1e-6
        for k in range(15):
            d = np.zeros(15)
            d[k] = eps
            rp, _, _ = fac.linearize({0: s.retract(d)})
            rm, _, _ = fac.linearize({0: s.retract(-d)})
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(fd, J[:, k], atol=1e-4,
                                       err_msg=f"{type(fac).__name__} "
                                               f"col {k}")


def build_graph_problem(n=5):
    states, meas = simulate(n_steps=(n - 1) * 25)
    x_true = {}
    factors = []
    params = ImuParams()
    for i in range(n):
        R, p, v = states[i * 25]
        x_true[i] = fg.FrameState(R, p, v, np.zeros(6))
    for i in range(n - 1):
        pre = Preintegration(params)
        for a, w, dt in meas[i * 25:(i + 1) * 25]:
            pre.integrate(a, w, dt)
        factors.append(fg.ImuFactor(i, i + 1, pre))
    factors.append(fg.PriorPoseFactor(0, x_true[0].R, x_true[0].p,
                                      np.full(6, 1e-3)))
    factors.append(fg.PriorVelFactor(0, x_true[0].v, np.full(3, 1e-3)))
    factors.append(fg.PriorBiasFactor(0, np.zeros(6), np.full(6, 1e-2)))
    factors.append(fg.PriorPoseFactor(n - 1, x_true[n - 1].R,
                                      x_true[n - 1].p, np.full(6, 1e-3)))
    return x_true, factors


def test_lm_recovers_perturbed_window():
    x_true, factors = build_graph_problem()
    rng = np.random.default_rng(3)
    x0 = {k: s.retract(np.concatenate(
        [rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.02,
         rng.normal(size=3) * 0.05, np.zeros(6)]))
        for k, s in x_true.items()}
    x = fg.optimize(x0, factors, sorted(x_true), iters=10)
    for k in x_true:
        err = x_true[k].local(x[k])
        assert np.abs(err[:9]).max() < 5e-3, (k, err)


def test_marginalization_consistency():
    x_true, factors = build_graph_problem()
    # marginalize frame 0: prior over frame 1 (and its bias/vel coupling)
    marg_factors = [f for f in factors
                    if 0 in f.keys()]
    keep_factors = [f for f in factors if 0 not in f.keys()]
    prior = fg.marginalize(x_true, marg_factors, [0])
    assert 1 in prior.frames
    x = fg.optimize(x_true, keep_factors + [prior],
                    [k for k in sorted(x_true) if k != 0], iters=5)
    for k in [1, 2, 3, 4]:
        err = x_true[k].local(x[k])
        assert np.abs(err[:9]).max() < 1e-2, (k, err)


def test_native_preintegration_matches_numpy():
    """The C++ core (csrc/preintegrate.cpp) must reproduce the numpy
    reference bit-closely over a full measurement batch."""
    from vings_mono_tpu.tracker import imu_native
    lib = imu_native.get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain")
    _, meas = simulate(n_steps=80)
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.03, 0.01, -0.02])
    rows = np.asarray([[dt, *(a + ba), *(w + bg)] for a, w, dt in meas])

    ref = Preintegration(ImuParams(), bg=bg, ba=ba)
    for row in rows:
        ref.integrate(row[1:4], row[4:7], row[0])

    nat = Preintegration(ImuParams(), bg=bg, ba=ba)
    assert imu_native.integrate_batch(nat, rows)

    np.testing.assert_allclose(nat.dR, ref.dR, atol=1e-12)
    np.testing.assert_allclose(nat.dv, ref.dv, atol=1e-12)
    np.testing.assert_allclose(nat.dp, ref.dp, atol=1e-12)
    np.testing.assert_allclose(nat.J_Rbg, ref.J_Rbg, atol=1e-12)
    np.testing.assert_allclose(nat.J_vba, ref.J_vba, atol=1e-12)
    np.testing.assert_allclose(nat.J_pbg, ref.J_pbg, atol=1e-10)
    np.testing.assert_allclose(nat.cov, ref.cov, rtol=1e-8, atol=1e-14)
    assert abs(nat.dt - ref.dt) < 1e-12
