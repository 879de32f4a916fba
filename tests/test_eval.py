"""Eval harness with committed fixtures (VERDICT r1 item 6):
  * tests/fixtures/viz_out_golden.npz — a recorded 2-window viz_out replay
    with a golden PSNR bar the mapper must clear,
  * a synthetic noisy trajectory with an ATE bound through
    runners/evaluate.eval_trajectory (droid_c2w txt surface).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vings_mono_tpu.utils.config import load_config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "viz_out_golden.npz")

# golden bar: recorded on the committed fixture with the settings below
# (see git history of this file); regressions in the rasterizer, losses,
# densification or optimizer show up as PSNR drops
GOLDEN_PSNR = 24.0


def _load_windows():
    z = np.load(FIXTURE)
    wins = []
    for w in range(2):
        intr = {k.split("_")[-1]: (int(z[f"w{w}_intr_{k.split('_')[-1]}"])
                                   if k.split("_")[-1] in ("H", "W")
                                   else float(
                                       z[f"w{w}_intr_{k.split('_')[-1]}"]))
                for k in z.files if k.startswith(f"w{w}_intr_")}
        win = {k[len(f"w{w}_"):]: z[k] for k in z.files
               if k.startswith(f"w{w}_") and "_intr_" not in k}
        win["intrinsic"] = intr
        wins.append(win)
    return wins


@pytest.mark.slow
def test_golden_replay_psnr():
    """run_mapping-style replay on the committed fixture clears the golden
    PSNR bar (the reference's de-facto integration harness, SURVEY §3.5)."""
    from vings_mono_tpu.mapper.mapper import GaussianMapper
    from vings_mono_tpu.mapper.losses import psnr

    wins = _load_windows()
    cfg = load_config(overrides={
        "mapper": {"capacity": 8192, "pair_capacity": 16384, "chunk": 64,
                   "side": 5, "kf_capacity": 4, "points_per_frame": 1024,
                   "points_first_frame": 1024, "impl": "naive"},
        "training_args": {"iters": 60, "num_keyframe": 2},
    })
    m = GaussianMapper(cfg)
    for win in wins:
        m.run(win)

    vals = []
    for kf in range(4):
        w2c = np.linalg.inv(wins[0]["poses"][kf])
        rets = m.render_at(w2c, wins[0]["intrinsic"])
        gt = jnp.moveaxis(jnp.asarray(wins[0]["images"][kf]), -1, 0)
        mask = jnp.asarray(wins[0]["depths"][kf][..., 0] > 0)
        vals.append(float(psnr(rets["rgb"], gt, mask)))
    mean_psnr = float(np.mean(vals))
    assert mean_psnr > GOLDEN_PSNR, vals


def test_evaluate_trajectory_ate(tmp_path):
    """runners/evaluate.eval_trajectory over the droid_c2w txt surface:
    a noisy estimate of a synthetic GT trajectory lands within the ATE
    bound; a corrupted one exceeds it (the metric discriminates)."""
    from vings_mono_tpu.runners.evaluate import eval_trajectory

    rng = np.random.default_rng(0)
    n = 40
    ts = np.arange(n, dtype=np.float64)
    gt_c2ws = []
    p = np.zeros(3)
    for k in range(n):
        p = p + np.array([0.5, 0.02 * np.sin(k / 5), 0.0])
        m = np.eye(4)
        m[:3, 3] = p
        gt_c2ws.append(m.copy())

    run_dir = tmp_path / "run"
    (run_dir / "droid_c2w").mkdir(parents=True)
    for k in range(n):
        est = gt_c2ws[k].copy()
        est[:3, 3] += rng.normal(size=3) * 0.03
        np.savetxt(run_dir / "droid_c2w" / f"{ts[k]:.6f}.txt", est)

    class DS:
        def load_gt_dict(self):
            return {"timestamps": ts, "c2ws": np.stack(gt_c2ws)}

    ate = eval_trajectory(str(run_dir), DS())
    assert ate is not None and ate < 0.08, ate

    # corrupt half the trajectory -> bound must break
    for k in range(n // 2, n):
        bad = gt_c2ws[k].copy()
        bad[:3, 3] += 5.0
        np.savetxt(run_dir / "droid_c2w" / f"{ts[k]:.6f}.txt", bad)
    ate2 = eval_trajectory(str(run_dir), DS())
    assert ate2 > 0.5, ate2
