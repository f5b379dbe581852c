"""Unveiling CLI — the reference's ``unveil_preprocess.sh`` + ``unveil.sh``
four-stage chain in one driver (each stage remains independently re-runnable
from the filesystem artifacts, SURVEY.md §3.3/3.4).

    python -m streetunveiler_tpu.cli.unveil --model_path /tmp/model \
        --semantic_class vehicle --all

Stages: A select instances (cluster + artifact dump) → B masks →
C inpaint + delta re-optimization → final renders into
``instance_workspace_<round>/``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--semantic_class", default="vehicle")
    ap.add_argument("--instances", type=int, nargs="*", default=None,
                    help="instance ids to remove; omit with --all")
    ap.add_argument("--all", action="store_true",
                    help="remove every solid cluster (reference --all)")
    ap.add_argument("--cluster_threshold", type=float, default=None,
                    help="instance clustering distance (defaults to the "
                         "reference 7e-2, which assumes normalized scene "
                         "units; scale to ~1%% of scene extent otherwise)")
    ap.add_argument("--key_stride", type=int, default=4,
                    help="every k-th frame is a key frame")
    ap.add_argument("--reopt_iterations", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ..config import ReOptimizationParams, load_config
    from ..pipeline.inpaint import DiffuseFillInpainter
    from ..pipeline.masks import include_neighbor_pcd
    from ..pipeline.reoptimize import unveil
    from ..pipeline.select import (cluster_semantic_instance,
                                   removal_mask_for_instances)
    from ..scene.readers import make_synthetic_street, read_colmap_scene
    from ..scene.scene import Scene
    from ..train.checkpoint import (search_max_inpaint_round,
                                    search_max_iteration)
    from ..utils.ply import state_to_ply
    from ..utils.semantics import CONCERNED_IND

    cfg = load_config(args.model_path)
    model = cfg["model"]
    if model.source_path:
        info = read_colmap_scene(model.source_path, model.colmap_path)
    else:
        info = make_synthetic_street(seed=args.seed)
    scene = Scene(info, model_path=args.model_path,
                  resolution=model.resolution)

    iteration = args.iteration
    if iteration < 0:
        iteration = search_max_iteration(
            os.path.join(args.model_path, "point_cloud"))
    state = scene.load(iteration)

    rnd = search_max_inpaint_round(args.model_path) + 1
    ws = os.path.join(args.model_path, f"instance_workspace_{rnd}")
    os.makedirs(ws, exist_ok=True)

    # ---- stage A: selection
    class_bit = 1 << CONCERNED_IND[args.semantic_class]
    cl = cluster_semantic_instance(state, class_bit,
                                   threshold=args.cluster_threshold)
    np.save(os.path.join(ws, "cluster_labels.npy"), cl.labels)
    print(f"stage A: {len(cl.cluster_sizes)} clusters "
          f"(top sizes {cl.cluster_sizes[:5]})")

    # ---- stage B: removal + neighborhood masks
    removal = removal_mask_for_instances(
        cl, args.instances or [], all_solid=args.all or not args.instances)
    masks = include_neighbor_pcd(state, removal)
    np.save(os.path.join(ws, "removed_pcd_mask.npy"), masks.removed)
    np.save(os.path.join(ws, "trainable_pcd_mask.npy"), masks.trainable)
    print(f"stage B: removing {int(removal.sum())} surfels, "
          f"{int(masks.trainable.sum())} trainable")

    # ---- stage C: inpaint + delta re-optimization
    n_cams = len(scene.train_cameras)
    key_frames = list(range(0, n_cams, args.key_stride))
    opt = ReOptimizationParams(iterations=args.reopt_iterations)
    final, _, targets = unveil(scene, state, masks, key_frames,
                               DiffuseFillInpainter(), opt=opt)

    out = os.path.join(ws, "checkpoint")
    state_to_ply(os.path.join(out, "point_cloud.ply"), final)

    # final renders for eval (stage C2), sky composited like the reference
    import jax
    from PIL import Image
    from ..renderer import render
    from ..train.checkpoint import load_sky_for_iteration
    rd = os.path.join(ws, "final_renders")
    gtd = os.path.join(ws, "gt")
    os.makedirs(rd, exist_ok=True)
    os.makedirs(gtd, exist_ok=True)
    bg = jnp.zeros(3)
    sky_params = load_sky_for_iteration(args.model_path, iteration, final)

    @jax.jit
    def render_final(w2c, sky_p):
        cam0 = scene.train_cameras[0]
        cam = type(cam0)(w2c=w2c, K=cam0.K, width=cam0.width,
                         height=cam0.height)
        res = render(cam, final, bg)
        img = res.render
        if sky_p is not None:
            from ..models.sky import render_sky
            sky = render_sky(sky_p, cam.height, cam.width, cam.K,
                             jnp.linalg.inv(w2c))
            img = img + sky * (1.0 - res.rend_alpha)[..., None]
        return img

    for i, cam in enumerate(scene.train_cameras):
        img = np.clip(np.array(render_final(cam.w2c, sky_params)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(rd, f"{i:05d}.png"))
        if scene.train_images[i] is not None:
            Image.fromarray((np.asarray(scene.train_images[i]) * 255
                             ).astype(np.uint8)).save(
                os.path.join(gtd, f"{i:05d}.png"))
    print(f"stage C: unveiled state at {out}; renders in {rd}")


if __name__ == "__main__":
    main()
