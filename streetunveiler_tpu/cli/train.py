"""Stage-1 training CLI — the reference's ``train.py`` driver.

    python -m streetunveiler_tpu.cli.train --scene synthetic \
        --model_path /tmp/model --iterations 2000

Persists ``cfg_args.json`` into the model dir so later stages re-read it
(the reference's filesystem-IPC protocol, SURVEY.md §1).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="synthetic",
                    choices=["synthetic", "colmap"])
    ap.add_argument("--source_path", default="")
    ap.add_argument("--colmap_path", default="")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=0)
    ap.add_argument("--resolution", type=int, default=-1)
    ap.add_argument("--sky", action="store_true", help="train the env-map sky")
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--save_every", type=int, default=5000)
    ap.add_argument("--log_every", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args, rest = ap.parse_known_args(argv)

    import jax
    from ..config import (ModelParams, OptimizationParams, PipelineParams,
                          apply_overrides, save_config)
    from ..scene.readers import make_synthetic_street, read_colmap_scene
    from ..scene.scene import Scene
    from ..train.checkpoint import save_checkpoint
    from ..train.loop import train_scene
    from ..train.optim import adam_init
    from ..train.step import init_optimizer

    opt, rest = apply_overrides(OptimizationParams(), rest)
    model = ModelParams(source_path=args.source_path,
                        colmap_path=args.colmap_path,
                        model_path=args.model_path,
                        resolution=args.resolution, capacity=args.capacity)
    pipe = PipelineParams()
    save_config(args.model_path, model=model, pipeline=pipe,
                optimization=opt)

    if args.scene == "synthetic":
        info = make_synthetic_street(seed=args.seed)
    else:
        info = read_colmap_scene(args.source_path, args.colmap_path)
    scene = Scene(info, model_path=args.model_path,
                  resolution=args.resolution)
    state = scene.create_state(capacity=args.capacity)
    print(f"scene: {len(scene.train_cameras)} cameras, "
          f"{int(state.num_alive)} init surfels, "
          f"capacity {state.capacity}, extent {scene.cameras_extent:.1f}")

    sky_params = None
    if args.sky:
        from ..models.sky import init_sky
        sky_params = init_sky(jax.random.PRNGKey(args.seed))

    iterations = args.iterations or opt.iterations
    saves = tuple(range(args.save_every, iterations + 1, args.save_every)
                  ) + (iterations,)

    def report(r):
        print(f"[{r.iteration}] loss={r.loss:.5f} psnr={r.psnr:.2f} "
              f"alive={r.n_alive} {r.iters_per_s:.1f} it/s", flush=True)

    state, sky_params, _ = train_scene(
        scene, state, opt, sky_params=sky_params, iterations=iterations,
        save_iterations=saves, log_every=args.log_every,
        use_semantics=args.semantics, seed=args.seed, callback=report)

    ckpt_dir = os.path.join(args.model_path, "checkpoint",
                            f"iteration_{iterations}")
    save_checkpoint(ckpt_dir, state, init_optimizer(state), iterations,
                    sky_params=sky_params)
    print(f"saved {ckpt_dir}")


if __name__ == "__main__":
    main()
