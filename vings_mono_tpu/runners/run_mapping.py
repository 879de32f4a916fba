"""Mapping-only replay runner (reference scripts/run_mapping.py): feed
recorded viz_out windows straight into the mapper — the deterministic
integration-test harness (SURVEY §3.5)."""

from __future__ import annotations

import argparse
import os


def run(cfg, save_dir, max_windows=None):
    from ..datasets.replay import ReplayDataset
    from ..mapper.mapper import GaussianMapper

    dataset = ReplayDataset(cfg)
    mapper = GaussianMapper(cfg)
    n = len(dataset) if max_windows is None else min(len(dataset),
                                                     max_windows)
    for idx in range(n):
        mapper.run(dataset[idx])
        if (idx + 1) % 50 == 0:
            mapper.save_ply(os.path.join(save_dir, "ply",
                                         f"map_{idx:06d}.ply"))
    mapper.save_ply(os.path.join(save_dir, "ply", "final_2dgs.ply"))
    print(f"mapped {n} windows, {mapper.n_alive} gaussians, "
          f"last metrics: {mapper.last_metrics}")
    return mapper


def main(argv=None):
    from ..utils.config import load_config, make_run_dir
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--prefix", default="")
    p.add_argument("--max-windows", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    save_dir = make_run_dir(cfg, args.prefix)
    run(cfg, save_dir, args.max_windows)


if __name__ == "__main__":
    main()
