"""MFU (model FLOP utilization) accounting.

The reference publishes no FLOP numbers (its perf story is CUDA kernel
wall-time, e.g. gaussian_base.py:343-434); on TPU the honest single-chip
metric is achieved FLOP/s over the chip's peak. FLOP counts come from XLA
cost analysis of the *compiled* flagship programs (mapper train_loop,
tracker fused GRU+BA update), re-lowered from abstract shape signatures
recorded at their real call sites (mapper.py / graph.py `_mfu_sig`), so
the counted program is exactly the one the pipeline executes.

Peak: TPU v5e 197 TFLOP/s bf16. Most of these programs run f32, which the
MXU executes through bf16 passes, so the bf16 peak is the one honest
denominator — the reported MFU is a *lower bound* on how well the chip is
used. The headline MFU is dominated by structure, not matmuls: the
rasterizer is a scan-and-gather workload (alpha compositing over depth-
sorted pairs), so low MFU here means "HBM/issue-bound", not "idle chip".
"""

from __future__ import annotations

from .profiling import TPU_V5E_PEAK_FLOPS, compiled_flops


def sig_flops(jitfn, sig):
    """FLOPs of `jitfn` lowered at a recorded (args, kwargs) abstract
    signature. Returns 0.0 when the signature is missing (program never
    ran) or the backend reports no cost model."""
    if sig is None:
        return 0.0
    args, kw = sig[0], sig[1]
    try:
        return compiled_flops(jitfn, *args, **kw)
    except Exception:
        return 0.0


def bench_mfu(tracker, mapper, n_frames, n_kf, wall_s):
    """Achieved-FLOP/s / peak for a measured bench section.

    Counts the two dominant programs: the mapper train_loop (one per
    keyframe, `iters` rasterize+Adam iterations inside) and the tracker's
    fused GRU+BA update (iters1+iters2 graph updates per frame). Binning,
    add_frame, storage control and host glue are excluded, so this is a
    conservative lower bound on executed FLOPs.
    """
    from ..mapper.train import train_loop
    from ..tracker.graph import _fused_update

    sig = getattr(mapper, "_mfu_sig", None)
    flops_train = sig_flops(train_loop, sig)
    if sig is not None:
        # XLA cost analysis excludes Pallas custom calls; add the analytic
        # rasterizer kernel count (constants documented in scripts/mfu.py)
        p_cap = int(mapper.bin_kwargs["p_cap"])
        flops_train += p_cap * 256 * 45 * 3.5 * int(sig[2])
    gsig = getattr(getattr(tracker, "graph", None), "_mfu_sig", None)
    flops_upd = sig_flops(_fused_update, gsig)
    upd_per_frame = int(tracker.cfg["frontend"].get("iters1", 2)) + \
        int(tracker.cfg["frontend"].get("iters2", 1))
    total = flops_train * n_kf + flops_upd * upd_per_frame * n_frames
    achieved = total / max(wall_s, 1e-9)
    return {
        "total_flops": total,
        "achieved_flops_per_s": achieved,
        "mfu": achieved / TPU_V5E_PEAK_FLOPS,
        "flops_train_loop": flops_train,
        "flops_fused_update": flops_upd,
    }
