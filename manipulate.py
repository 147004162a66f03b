#!/usr/bin/env python
"""CLI: shape manipulation demos from a checkpoint
(replaces `/root/reference/visual.py`'s toggled `draw_*` calls).

    python manipulate.py --log_dir log/run --routine correspondence
Routines: correspondence, interpolate, part_interpolate, style_interpolate,
part_interpolate_detail, part_edit, part_flip, part_exchange,
edit_interpolate, all.
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ema", action="store_true",
                   help="use the EMA generator weights from the checkpoint")
    p.add_argument("--routine", default="correspondence")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args()

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.manipulate import from_checkpoint, region_mask
    from sp_gan_tpu.train.checkpoint import latest_checkpoint
    from sp_gan_tpu.utils import enable_compile_cache
    from sp_gan_tpu.viz import plot_three_views, plot_three_views_color

    enable_compile_cache()
    with open(os.path.join(args.log_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    ckpt = args.ckpt or latest_checkpoint(args.log_dir)
    man = from_checkpoint(ckpt, cfg, use_ema=args.ema)
    out_dir = args.out_dir or os.path.join(args.log_dir, "manipulate")
    os.makedirs(out_dir, exist_ok=True)

    routines = ([args.routine] if args.routine != "all" else
                ["correspondence", "interpolate", "part_interpolate",
                 "style_interpolate", "part_interpolate_detail", "part_edit",
                 "part_flip", "part_exchange", "edit_interpolate"])
    mask = region_mask(man.ball, anchor=0, num=cfg.np // 3)

    for r in routines:
        path = os.path.join(out_dir, f"{r}.png")
        if r == "correspondence":
            pcs, colors = man.correspondence(4, args.seed)
            plot_three_views_color(path, list(pcs), colors=list(colors))
        elif r == "interpolate":
            pcs = man.shape_interpolate(args.seed, args.seed + 1, args.steps)
            plot_three_views(path, list(pcs))
        elif r == "part_interpolate":
            pcs = man.part_interpolate(mask, args.seed, args.seed + 1, args.steps)
            plot_three_views(path, list(pcs))
        elif r == "style_interpolate":
            pcs = man.style_interpolate(mask, args.seed, args.seed + 1,
                                        args.steps)
            plot_three_views(path, list(pcs))
        elif r == "part_interpolate_detail":
            shape_row, grid, _ = man.part_interpolate_detail(
                args.seed, args.seed + 1)
            rows = [shape_row] + [grid[i] for i in range(grid.shape[0])]
            plot_three_views(path, [pc for row in rows for pc in row])
        elif r == "part_edit":
            pcs = man.part_edit(mask, args.seed)
            plot_three_views(path, list(pcs))
        elif r == "part_flip":
            pcs = man.part_flip(seed=args.seed)
            plot_three_views(path, list(pcs))
        elif r == "part_exchange":
            pcs = man.part_exchange(mask, args.seed, args.seed + 1)
            plot_three_views(path, list(pcs))
        elif r == "edit_interpolate":
            pcs = man.edit_interpolate(mask, args.seed, steps=args.steps)
            plot_three_views(path, list(pcs))
        else:
            raise SystemExit(f"unknown routine {r}")
        print("wrote", path)


if __name__ == "__main__":
    main()
