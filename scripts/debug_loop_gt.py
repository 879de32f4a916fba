"""GT-instrumented loop-closure debug: at every accepted closure, snapshot
the keyframe trajectory before/after rectification and score both against
ground truth (Umeyama-aligned, like the eval), to localize whether the
e2e ATE regression (loops close but ATE 0.98 -> 1.40) comes from

  (a) a bad PnP measurement / correction target,
  (b) a bad distribution of the correction (rectify_poses), or
  (c) downstream tracking/BA interaction after the writeback.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_loop_gt.py
"""

import json

import numpy as np


def main():
    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import scripts.eval_loop_e2e as e2e
    import vings_mono_tpu.loop.loop_model as lm
    from vings_mono_tpu.utils.trajectory import ate_rmse

    records = []
    orig_rp = lm.rectify_poses

    def spy_rectify(c2ws, a, b, target, **kw):
        new = orig_rp(c2ws, a, b, target, **kw)
        records.append(dict(a=int(a), b=int(b),
                            old=np.asarray(c2ws).copy(),
                            new=np.asarray(new).copy(),
                            target=np.asarray(target).copy()))
        return new

    lm.rectify_poses = spy_rectify

    # capture tracker/dataset from the builder for gid->tstamp + GT
    from vings_mono_tpu.runners import run as runmod
    captured = {}
    orig_build = runmod.build

    def spy_build(cfg):
        out = orig_build(cfg)
        if "tracker" not in captured:
            captured["dataset"], captured["tracker"] = out[0], out[1]
        return out

    runmod.build = spy_build
    e2e.build = spy_build

    import sys
    out = e2e.main(["--skip-baseline"] + sys.argv[1:])

    tracker = captured["tracker"]
    dataset = captured["dataset"]
    video = tracker.video
    n_save = video.count_save
    ts = list(video.tstamp_save[:n_save])
    ts += list(np.asarray(video.bufs.tstamp[:video.counter]))
    ts = np.asarray(ts, np.float64)
    gt = dataset.load_gt_dict()

    def score(c2ws):
        n = len(c2ws)
        return ate_rmse(ts[:n], list(c2ws), gt["timestamps"], gt["c2ws"])

    diag = []
    for r in records:
        a, b = r["a"], r["b"]
        ate_old = score(r["old"])
        ate_new = score(r["new"])
        # per-frame error at the loop endpoint, aligned on the trusted
        # history [0..a] (sim3 from history -> GT), then compare cur pose
        # under that alignment: how good is the correction TARGET itself?
        gt_ts = np.asarray(gt["timestamps"])
        gidx = [int(np.argmin(np.abs(gt_ts - t))) for t in ts[:len(r["old"])]]
        gt_pos = np.asarray([np.asarray(gt["c2ws"][k])[:3, 3] for k in gidx])
        P = r["old"][:a + 1, :3, 3].T
        Q = gt_pos[:a + 1].T
        mp, mq = P.mean(1, keepdims=True), Q.mean(1, keepdims=True)
        Pc, Qc = P - mp, Q - mq
        U, S, Vt = np.linalg.svd(Qc @ Pc.T)
        D = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            D[2, 2] = -1
        R = U @ D @ Vt
        s = (S * D.diagonal()).sum() / (Pc * Pc).sum()
        t = (mq - s * R @ mp)[:, 0]

        def to_gt(p):
            return s * R @ p + t

        err_cur_old = np.linalg.norm(to_gt(r["old"][b, :3, 3]) - gt_pos[b])
        err_cur_tgt = np.linalg.norm(to_gt(r["target"][:3, 3]) - gt_pos[b])
        err_cur_new = np.linalg.norm(to_gt(r["new"][b, :3, 3]) - gt_pos[b])
        # mean per-frame error across the chain
        err_chain_old = float(np.mean([np.linalg.norm(
            to_gt(r["old"][i, :3, 3]) - gt_pos[i]) for i in range(a, b + 1)]))
        err_chain_new = float(np.mean([np.linalg.norm(
            to_gt(r["new"][i, :3, 3]) - gt_pos[i]) for i in range(a, b + 1)]))
        diag.append(dict(a=a, b=b, n_kf=len(r["old"]),
                         ate_old=ate_old, ate_new=ate_new,
                         err_cur_old=float(err_cur_old),
                         err_cur_target=float(err_cur_tgt),
                         err_cur_new=float(err_cur_new),
                         err_chain_old=err_chain_old,
                         err_chain_new=err_chain_new))

    final = dict(final_ate=out["ate_rmse_m"], closures=diag)
    print("DIAG " + json.dumps(final, indent=2))


if __name__ == "__main__":
    main()
