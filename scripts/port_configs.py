"""Port the reference sequence configs (/root/reference/configs/**) into
the repo's TPU-stack schema, mirroring the directory tree.

Field mapping (reference -> repo):
  use_pose_refine -> use_refine; datasets.<m> -> <m>; middleware.max_cov
  dropped (the TPU middleware gates on cov_times * median only);
  frontend gains the repo's fixed-capacity knobs (edge/inactive caps,
  ba_window, rollup, save_buffer) which the reference sizes in code
  (depth_video.py:93-107, dbaf_frontend.py:63-70); mapper gains the
  on-chip-tuned rasterizer knobs. image_size is rounded up to /8.

Run:  python scripts/port_configs.py        (writes configs/**)
"""

import os
import sys

import yaml

REF = "/root/reference/configs"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

SKIP = {"rtg/hotel.yaml"}          # hand-written already

FRONTEND_KEYS = [
    "image_size", "buffer", "filter_thresh", "warm_up", "beta",
    "frontend_nms", "keyframe_thresh", "frontend_window", "frontend_thresh",
    "frontend_radius", "active_window", "max_factors", "far_threshold",
    "inac_range", "mask_threshold", "skip_edge", "translation_threshold",
    "show_plot",
]


def _round8(x):
    return int((int(x) + 7) // 8 * 8)


def port(ref_path, rel):
    with open(ref_path) as f:
        ref = yaml.safe_load(f)

    name = os.path.splitext(os.path.basename(rel))[0]
    is_kitti360 = "kitti360" in rel
    mode = str(ref.get("mode", "vo"))

    out = {
        "mode": mode,
        "use_sky": bool(ref.get("use_sky", False)),
        "use_dynamic": bool(ref.get("use_dynamic", False)),
        "use_loop": bool(ref.get("use_loop", False)),
        "use_metric": bool(ref.get("use_metric", False)),
        "use_refine": bool(ref.get("use_refine",
                                   ref.get("use_pose_refine", False))),
        "use_storage_manager": bool(ref.get("use_storage_manager", False)),
        "use_vis": bool(ref.get("use_vis", False)),
        "debug_mode": False,
    }

    ds = dict(ref.get("dataset", {}))
    ds["module"] = str(ds.get("module", "")).split(".")[-1]
    out["dataset"] = ds

    mw = ref.get("middleware", {})
    out["middleware"] = {
        "max_depth": float(mw.get("max_depth", 30.0)),
        "cov_times": float(mw.get("cov_times", 5.0)),
    }
    if is_kitti360:
        # KITTI-360 uses the save-buffer + sky-crop packaging
        # (middleware_utils.py:51-92); new_H scales the crop
        out["middleware"]["variant"] = "v0_kitti360"

    intr = ref.get("intrinsic", {})
    out["intrinsic"] = {k: intr[k] for k in
                        ("fu", "fv", "cu", "cv", "H", "W", "new_H")
                        if k in intr}
    if "distortion_coeffs" in intr:
        out["intrinsic"]["distortion_coeffs"] = intr["distortion_coeffs"]

    fe_ref = ref.get("frontend", {})
    fe = {"weight": "checkpoints/droid.pth"}
    for k in FRONTEND_KEYS:
        if k in fe_ref:
            fe[k] = fe_ref[k]
    if "image_size" in fe:
        fe["image_size"] = [_round8(v) for v in fe["image_size"]]
    # repo fixed-capacity knobs (reference sizes these in code)
    fe.update({
        "edge_capacity": 72,
        "inactive_capacity": 192,
        "ba_window": 34,
        "rollup_at": 65,
        "rollup_n": 30,
        "save_buffer": 8000 if is_kitti360 else 2500,
    })
    if mode == "vio":
        fe.setdefault("iters1", 2)
        fe.setdefault("iters2", 1)
        fe.setdefault("vi_warmup", 12)
    else:
        fe.setdefault("iters1", 4)
        fe.setdefault("iters2", 2)
    out["frontend"] = fe

    for k in ("adc_args", "training_args"):
        if k in ref:
            out[k] = ref[k]

    outdoor = any(s in rel for s in
                  ("kitti", "waymo", "hierarchical", "meganerf"))
    out["mapper"] = {
        "capacity": 524288 if outdoor else 262144,
        "pair_capacity": 524288,
        "chunk": 128,
        "side": 3,
        "visible_capacity": 131072,
        "rebin_rows": 3,
        "kf_capacity": 16,
        "points_per_frame": 40000,
        "points_first_frame": 50000,
    }

    if out["use_metric"]:
        # npz (precomputed depth maps) is the validated backend in this
        # container; 'flax' DPT needs a converted checkpoint
        out["metric"] = {"backend": "npz",
                         "root": ds.get("root", "") + "/metric_depth",
                         "d_max": 80.0}

    if out["use_storage_manager"]:
        sm = ref.get("storage_manager", {})
        out["storage_manager"] = {
            "distance_threshold": float(sm.get("distance_threshold", 65.0)),
            "every": 10,
        }
    if out["use_loop"]:
        out["looper"] = {"every": 3, "start_after": 10,
                         "min_history": 35, "search_radius": 10.0}
    if "vis" in ref:
        out["vis"] = ref["vis"]

    out["output"] = {"save_dir": f"output/{name}"}
    return out


def main():
    n = 0
    for root, _, files in os.walk(REF):
        for fn in sorted(files):
            if not fn.endswith(".yaml"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), REF)
            if rel in SKIP:
                continue
            cfg = port(os.path.join(root, fn), rel)
            dst = os.path.join(OUT, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "w") as f:
                f.write(f"# ported from /root/reference/configs/{rel} "
                        "by scripts/port_configs.py\n")
                yaml.safe_dump(cfg, f, sort_keys=False,
                               default_flow_style=None)
            n += 1
    print(f"wrote {n} configs under {OUT}")


if __name__ == "__main__":
    sys.exit(main())
