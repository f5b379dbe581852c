"""Stage-1 training CLI — the reference's ``train.py`` driver.

    python -m streetunveiler_tpu.cli.train --scene synthetic \
        --model_path /tmp/model --iterations 2000

    python -m streetunveiler_tpu.cli.train --scene waymo \
        --source_path /data/segment --model_path /tmp/waymo --sky --semantics

Persists ``cfg_args.json`` into the model dir so later stages re-read it
(the reference's filesystem-IPC protocol, SURVEY.md §1). Resume with
``--start_iteration N`` (reference ``--continue_model_path``/
``--start_iteration``, train.py:38-47). ``--tile_devices``/``--data_devices``
shard the step over a device mesh (SURVEY.md §2.4); ``--multihost``
bootstraps ``jax.distributed`` for multi-host pods.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="synthetic",
                    choices=["synthetic", "colmap", "blender", "waymo",
                             "kitti", "pandaset", "nuscenes"])
    ap.add_argument("--source_path", default="")
    ap.add_argument("--colmap_path", default="")
    ap.add_argument("--model_path", required=True)
    # per-dataset selectors (persisted into cfg_args.json)
    ap.add_argument("--date", default="", help="kitti recording date")
    ap.add_argument("--drive", default="", help="kitti drive number")
    ap.add_argument("--sequence", default="", help="pandaset sequence")
    ap.add_argument("--scene_name", default="", help="nuscenes scene")
    ap.add_argument("--version", default="v1.0-mini", help="nuscenes version")
    ap.add_argument("--start_frame", type=int, default=None)
    ap.add_argument("--end_frame", type=int, default=None)
    ap.add_argument("--eval", action="store_true",
                    help="hold out every llffhold-th view for evaluation")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=0)
    ap.add_argument("--resolution", type=int, default=-1)
    ap.add_argument("--sky", action="store_true", help="train the env-map sky")
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--start_iteration", type=int, default=0,
                    help="resume from checkpoint/iteration_N")
    ap.add_argument("--save_every", type=int, default=5000)
    ap.add_argument("--log_every", type=int, default=200)
    ap.add_argument("--eval_every", type=int, default=1000,
                    help="held-out PSNR/L1 interval (0 = off)")
    ap.add_argument("--duplicate_capacity", type=int, default=0)
    # multi-chip (SURVEY.md §2.4): tile×data mesh over local devices
    ap.add_argument("--tile_devices", type=int, default=1)
    ap.add_argument("--data_devices", type=int, default=1)
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() before device use")
    ap.add_argument("--profile", action="store_true",
                    help="write a jax.profiler trace of 3 warm steps to "
                         "<model_path>/logs/profile before training")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--detect_anomaly", action="store_true",
                    help="raise on NaN in any jitted computation "
                         "(reference train.py:310,325 "
                         "torch.autograd.set_detect_anomaly)")
    args, rest = ap.parse_known_args(argv)

    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)
    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    from ..config import (ModelParams, OptimizationParams, PipelineParams,
                          apply_overrides, save_config)
    from ..scene.scene import Scene
    from ..train.checkpoint import load_checkpoint, save_checkpoint
    from ..train.loop import train_scene
    from ..train.optim import adam_init
    from ..train.step import init_optimizer
    from .common import load_scene_info

    opt, rest = apply_overrides(OptimizationParams(), rest)
    model = ModelParams(source_path=args.source_path,
                        colmap_path=args.colmap_path,
                        model_path=args.model_path,
                        resolution=args.resolution, capacity=args.capacity,
                        scene=args.scene, date=args.date, drive=args.drive,
                        sequence=args.sequence, scene_name=args.scene_name,
                        version=args.version, start_frame=args.start_frame,
                        end_frame=args.end_frame, eval=args.eval)
    # ModelParams fields without dedicated flags (e.g. --synthetic_points)
    # are overridable like the reference's reflected argparse groups
    model, rest = apply_overrides(model, rest)
    pipe, rest = apply_overrides(PipelineParams(
        tile_devices=args.tile_devices,
        duplicate_capacity=args.duplicate_capacity), rest)
    if rest:
        print(f"WARNING: unrecognized arguments {rest}", file=sys.stderr)
    info = load_scene_info(model, seed=args.seed)
    scene = Scene(info, model_path=args.model_path,
                  resolution=args.resolution)
    save_config(args.model_path, model=model, pipeline=pipe,
                optimization=opt,
                scene={"cameras_extent": float(scene.cameras_extent)})
    scene.save_cameras_json()   # reference scene/__init__.py:79-83
    state = scene.create_state(capacity=args.capacity,
                               sh_degree=model.sh_degree)
    print(f"scene: {len(scene.train_cameras)} train / "
          f"{len(scene.test_cameras)} test cameras, "
          f"{int(state.num_alive)} init surfels, "
          f"capacity {state.capacity}, extent {scene.cameras_extent:.1f}")

    # composite on the scene's own GT background (cli/common.py
    # scene_background; white with -w) — a mismatched background makes
    # empty-sky pixels unfittable (round-4 config-2 plateau)
    from .common import scene_background
    bg = scene_background(scene, model.white_background)

    sky_params = None
    if args.sky:
        from ..models.sky import init_sky
        sky_params = init_sky(jax.random.PRNGKey(args.seed))

    opt_state = init_optimizer(state)
    start_iteration = args.start_iteration
    if start_iteration > 0:
        ckpt_dir = os.path.join(args.model_path, "checkpoint",
                                f"iteration_{start_iteration}")
        if sky_params is not None:
            state, opt_state, it, sky_params = load_checkpoint(
                ckpt_dir, state, opt_state, sky_template=sky_params)
        else:
            state, opt_state, it = load_checkpoint(ckpt_dir, state,
                                                   opt_state)
        print(f"resumed from {ckpt_dir} at iteration {it}")

    iterations = args.iterations or opt.iterations
    saves = tuple(range(args.save_every, iterations + 1, args.save_every)
                  ) + (iterations,)
    dup_cap = args.duplicate_capacity or None

    def report(r):
        line = (f"[{r.iteration}] loss={r.loss:.5f} psnr={r.psnr:.2f} "
                f"alive={r.n_alive} {r.iters_per_s:.1f} it/s")
        if np.isfinite(r.test_psnr):
            line += f" test_psnr={r.test_psnr:.2f}"
        print(line, flush=True)

    from ..utils.logging import TrainLogger
    logger = TrainLogger(os.path.join(args.model_path, "logs"))

    if args.profile:
        import jax.numpy as jnp
        from ..train.step import train_step
        from ..utils.logging import profile_trace
        cam0 = scene.train_cameras[0]
        img0 = jnp.asarray(scene.train_images[0])
        bg0 = bg
        s, o = state, opt_state
        s, o, *_ = train_step(s, o, cam0, img0, bg0, jnp.asarray(1), opt,
                              duplicate_capacity=dup_cap)   # compile
        with profile_trace(os.path.join(args.model_path, "logs")):
            for i in range(3):
                s, o, *_ = train_step(s, o, cam0, img0, bg0,
                                      jnp.asarray(2 + i), opt,
                                      duplicate_capacity=dup_cap)
            jax.block_until_ready(s.params.xyz)
        del s, o

    n_mesh = args.tile_devices * args.data_devices
    if n_mesh > 1:
        from ..train.loop import train_scene_sharded
        state, sky_params, _ = train_scene_sharded(
            scene, state, opt, n_tile=args.tile_devices,
            n_data=args.data_devices, sky_params=sky_params, bg=bg,
            iterations=iterations, start_iteration=start_iteration,
            save_iterations=saves, log_every=args.log_every,
            duplicate_capacity=dup_cap, use_semantics=args.semantics,
            seed=args.seed, callback=report,
            logger=logger, opt_state=opt_state)
    else:
        state, sky_params, _ = train_scene(
            scene, state, opt, sky_params=sky_params, bg=bg,
            iterations=iterations, start_iteration=start_iteration,
            save_iterations=saves, log_every=args.log_every,
            eval_every=args.eval_every, duplicate_capacity=dup_cap,
            use_semantics=args.semantics, seed=args.seed, callback=report,
            logger=logger, opt_state=opt_state)

    ckpt_dir = os.path.join(args.model_path, "checkpoint",
                            f"iteration_{iterations}")
    save_checkpoint(ckpt_dir, state, init_optimizer(state), iterations,
                    sky_params=sky_params)
    print(f"saved {ckpt_dir}")


if __name__ == "__main__":
    main()
