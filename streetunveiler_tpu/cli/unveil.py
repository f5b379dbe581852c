"""Unveiling CLI — the reference's ``unveil_preprocess.sh`` + ``unveil.sh``
four-stage chain in one driver (each stage remains independently re-runnable
from the filesystem artifacts, SURVEY.md §3.3/3.4).

    python -m streetunveiler_tpu.cli.unveil --model_path /tmp/model \
        --semantic_class vehicle --all

Stages: A select instances (cluster + per-instance preview renders) →
B masks + per-frame inpaint-condition artifacts → C inpaint + delta
re-optimization → final renders into ``instance_workspace_<round>/``.

``--inpainter`` selects the 2D model: ``diffuse`` (hermetic fallback),
``dir:<path>`` — the out-of-band file-exchange protocol where a GPU host
running the real ZITS++/LeftRefill answers requests (``pipeline/inpaint.py``)
— or ``zits:<repo>:<ckpt>`` / ``leftrefill:<repo>`` to run those adapters
in-process when the external checkouts live on this host
(``pipeline/zits.py``, ``pipeline/leftrefill.py``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_inpainter(spec: str, timeout: float = 600.0):
    from ..pipeline.inpaint import DiffuseFillInpainter, DirectoryInpainter
    if spec == "diffuse":
        return DiffuseFillInpainter()
    if spec.startswith("dir:"):
        return DirectoryInpainter(spec[4:], timeout=timeout,
                                  fallback=DiffuseFillInpainter())
    if spec.startswith("zits:"):
        # in-process ZITS++ on this host: zits:<repo>:<ckpt_root>
        from ..pipeline.zits import ZitsInpainter
        repo, _, ckpt = spec[5:].partition(":")
        return ZitsInpainter(repo, ckpt or os.path.join(repo, "ckpts"))
    if spec.startswith("leftrefill:"):
        # in-process LeftRefill: leftrefill:<repo>[:<ckpt_dir>]
        from ..pipeline.leftrefill import LeftRefillInpainter
        repo, _, ckpt = spec[11:].partition(":")
        return LeftRefillInpainter(
            repo, ckpt or "check_points/ref_guided_inpainting")
    raise ValueError(f"unknown inpainter spec {spec!r} (expected 'diffuse', "
                     "'dir:<path>', 'zits:<repo>:<ckpt>' or "
                     "'leftrefill:<repo>[:<ckpt_dir>]')")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--semantic_class", default="vehicle")
    ap.add_argument("--instances", type=int, nargs="*", default=None,
                    help="instance ids to remove (pick from the stage-A "
                         "instance_render previews); omit with --all")
    ap.add_argument("--all", action="store_true",
                    help="remove every solid cluster (reference --all)")
    ap.add_argument("--cluster_threshold", type=float, default=None,
                    help="instance clustering distance (defaults to the "
                         "reference 7e-2, which assumes normalized scene "
                         "units; scale to ~1%% of scene extent otherwise)")
    ap.add_argument("--min_cluster_size", type=int, default=None,
                    help="clusters below this many surfels are not solid "
                         "(default: pipeline/select.MIN_SOLID_CLUSTER)")
    ap.add_argument("--key_stride", type=int, default=4,
                    help="every k-th frame is a key frame")
    ap.add_argument("--reopt_iterations", type=int, default=1000)
    ap.add_argument("--inpainter", default="diffuse",
                    help="'diffuse', 'dir:<exchange-dir>', "
                         "'zits:<repo>:<ckpt>' or 'leftrefill:<repo>'")
    ap.add_argument("--inpaint_timeout", type=float, default=600.0)
    ap.add_argument("--select_only", action="store_true",
                    help="stop after stage A so instance ids can be chosen "
                         "from the preview renders")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ..config import ReOptimizationParams, load_config
    from ..pipeline.masks import (include_neighbor_pcd,
                                  write_inpaint_conditions)
    from ..pipeline.reoptimize import unveil
    from ..pipeline.select import (cluster_semantic_instance,
                                   removal_mask_for_instances,
                                   render_instance_previews)
    from ..scene.scene import Scene
    from ..train.checkpoint import (latest_unveiled_checkpoint,
                                    load_sky_for_iteration,
                                    search_max_inpaint_round,
                                    search_max_iteration)
    from ..utils.ply import state_to_ply
    from ..utils.semantics import CONCERNED_IND
    from .common import load_scene_info

    cfg = load_config(args.model_path)
    model = cfg["model"]
    info = load_scene_info(model, seed=args.seed)
    scene = Scene(info, model_path=args.model_path,
                  resolution=model.resolution)

    iteration = args.iteration
    if iteration < 0:
        iteration = search_max_iteration(
            os.path.join(args.model_path, "point_cloud"))

    # Round chaining: stage A of round r starts from round r−1's unveiled
    # checkpoint when one exists (reference
    # 1_instance_visualization.py:39-47) — so a second unveil run removes
    # its class FROM the already-unveiled scene, not the original.
    prev_ply = latest_unveiled_checkpoint(args.model_path)
    if prev_ply is not None:
        from ..utils.ply import state_from_ply
        # the PLY carries no spatial scale; guard against a re-run with a
        # different resolution/config silently changing it (the persisted
        # cfg records the training-time cameras_extent)
        saved_extent = cfg.get("scene", {}).get("cameras_extent")
        if saved_extent is not None:
            assert abs(scene.cameras_extent - saved_extent) <= (
                1e-4 * abs(saved_extent)), (
                f"scene cameras_extent {scene.cameras_extent} differs from "
                f"the training-time value {saved_extent} persisted in "
                f"cfg_args.json — rerun with the training resolution/config "
                f"or retrain before chaining unveil rounds")
        state = state_from_ply(prev_ply, spatial_scale=scene.cameras_extent)
        print(f"chaining from unveiled checkpoint {prev_ply}")
    else:
        state = scene.load(iteration)

    rnd = search_max_inpaint_round(args.model_path) + 1
    ws = os.path.join(args.model_path, f"instance_workspace_{rnd}")
    os.makedirs(ws, exist_ok=True)

    # demand-measured duplicate capacity: trained/densified states far
    # exceed the 4.5-tiles/surfel default — a truncated stream silently
    # drops the farthest surfels from every stage render/mask/re-opt
    from ..renderer import measure_duplicate_capacity
    dup_cap = measure_duplicate_capacity(scene.train_cameras, state)
    print(f"duplicate capacity (measured): {dup_cap}")

    # sky composite for conditions/final renders (train.py:114-115)
    sky_params = load_sky_for_iteration(args.model_path, iteration, state)
    sky_images = None
    if sky_params is not None:
        import jax
        from ..models.sky import render_sky
        sky_fn = jax.jit(lambda w2c, K, h, w: render_sky(
            sky_params, h, w, K, jnp.linalg.inv(w2c)),
            static_argnums=(2, 3))
        sky_images = [np.asarray(sky_fn(c.w2c, c.K, c.height, c.width))
                      for c in scene.train_cameras]

    # ---- stage A: selection + per-instance previews
    class_bit = 1 << CONCERNED_IND[args.semantic_class]
    from ..pipeline.select import MIN_SOLID_CLUSTER
    min_size = args.min_cluster_size or MIN_SOLID_CLUSTER
    cl = cluster_semantic_instance(state, class_bit,
                                   threshold=args.cluster_threshold)
    np.save(os.path.join(ws, "cluster_labels.npy"), cl.labels)
    solid = render_instance_previews(
        scene, state, cl, ws, min_size=min_size,
        close_depth=max(4.0, 0.3 * scene.cameras_extent),
        duplicate_capacity=dup_cap)
    print(f"stage A: {len(cl.cluster_sizes)} clusters "
          f"(top sizes {cl.cluster_sizes[:5]}), "
          f"{int(solid.sum())} surfels in solid clusters; previews in "
          f"{os.path.join(ws, 'instance_render')}")
    if args.select_only:
        print("stage A only (--select_only): rerun with --instances <ids> "
              "or --all")
        return

    # ---- stage B: removal + neighborhood masks + condition artifacts
    removal = removal_mask_for_instances(
        cl, args.instances or [], all_solid=args.all or not args.instances,
        min_size=min_size)
    masks = include_neighbor_pcd(state, removal)
    np.save(os.path.join(ws, "removed_pcd_mask.npy"), masks.removed)
    np.save(os.path.join(ws, "trainable_pcd_mask.npy"), masks.trainable)
    np.save(os.path.join(ws, "editable_pcd_mask.npy"), masks.editable)
    # reference stages B/C touch only the FRONT cameras
    # (2_generate_inpainted_mask.py:174 slices
    # [front_start:front_end]; 1_optimization.py:81-92,510 keyframes and
    # valid frames within the same range) — on a multi-camera rig the
    # side cameras are never inpainted
    n_cams = len(scene.train_cameras)
    fs = int(scene.camera_frame_dict.get("front_start", 0))
    fe = int(scene.camera_frame_dict.get("front_end", n_cams))
    front_frames = list(range(fs, fe))

    from .common import scene_background
    bg = scene_background(scene)
    frame_masks = write_inpaint_conditions(scene, state, masks.removed, ws,
                                           bg, sky_images=sky_images,
                                           frames=front_frames,
                                           duplicate_capacity=dup_cap)
    print(f"stage B: removing {int(removal.sum())} surfels, "
          f"{int(masks.trainable.sum())} trainable; conditions in {ws} "
          f"(front frames {fs}..{fe - 1})")

    # ---- stage C: inpaint + delta re-optimization (front range only,
    # with the last front frame as the propagation boundary — the
    # reference appends camera_frame_dict['front_end'],
    # 1_optimization.py:81-83)
    key_frames = list(range(fs, fe, args.key_stride))
    if key_frames and key_frames[-1] != fe - 1:
        key_frames.append(fe - 1)
    opt = ReOptimizationParams(iterations=args.reopt_iterations)
    inpainter = make_inpainter(args.inpainter, timeout=args.inpaint_timeout)
    final, _, targets = unveil(scene, state, masks, key_frames, inpainter,
                               opt=opt, sky_images=sky_images,
                               frame_masks=frame_masks, seed=args.seed,
                               duplicate_capacity=dup_cap)

    out = os.path.join(ws, "checkpoint")
    state_to_ply(os.path.join(out, "point_cloud.ply"), final)

    # final renders for eval (stage C2), sky composited like the reference
    import jax
    from PIL import Image
    from ..renderer import render
    rd = os.path.join(ws, "final_renders")
    gtd = os.path.join(ws, "gt")
    os.makedirs(rd, exist_ok=True)
    os.makedirs(gtd, exist_ok=True)

    # jit over the Camera pytree: per-view w2c/K are traced arrays and
    # width/height are static aux — correct for multi-camera rigs with
    # distinct intrinsics (one compile per distinct image size)
    @jax.jit
    def render_final(cam):
        res = render(cam, final, bg, duplicate_capacity=dup_cap)
        return res.render, res.rend_alpha

    for i, cam in enumerate(scene.train_cameras):
        img, alpha = render_final(cam)
        img = np.asarray(img)
        if sky_images is not None:
            img = img + sky_images[i] * (1.0 - np.asarray(alpha))[..., None]
        img = np.clip(img, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(rd, f"{i:05d}.png"))
        if scene.train_images[i] is not None:
            Image.fromarray((np.asarray(scene.train_images[i]) * 255
                             ).astype(np.uint8)).save(
                os.path.join(gtd, f"{i:05d}.png"))
    print(f"stage C: unveiled state at {out}; renders in {rd}")


if __name__ == "__main__":
    main()
