"""Single-process mobile variant (reference scripts/run_mobile.py):
the flagship pipeline with periodic 3DGS ply exports for on-device viewers."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.config import load_config, make_run_dir
    from .run import run

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--prefix", default="mobile_")
    p.add_argument("--ply-every", type=int, default=300)
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    save_dir = make_run_dir(cfg, args.prefix)

    def on_frame(idx, tracker, mapper, viz_out):
        if mapper.initialized and idx % args.ply_every == args.ply_every - 1:
            mapper.save_ply(os.path.join(save_dir, "ply",
                                         f"map_{idx:06d}_3dgs.ply"),
                            mode="3dgs")

    run(cfg, save_dir, args.max_frames, on_frame=on_frame)


if __name__ == "__main__":
    main()
