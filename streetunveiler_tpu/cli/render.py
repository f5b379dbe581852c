"""Render/eval CLI — the reference's ``render.py`` driver.

Renders train and test views from the newest checkpoint: RGB, depth,
normal, semantic argmax visualizations + per-view PSNR, written into
``<model_path>/{train,test}/ours_<iter>/`` like the reference layout, then
TSDF mesh extraction over ⅓ of the train cameras → ``fuse.ply`` +
cluster-filtered ``fuse_post.ply`` (reference ``render.py:118-146``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _save_png(path, img):
    from PIL import Image
    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                    ).save(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_test", action="store_true")
    ap.add_argument("--skip_mesh", action="store_true")
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--voxel_size", type=float, default=0.05,
                    help="TSDF voxel size (scene units)")
    ap.add_argument("--mesh_res", type=int, default=0,
                    help="if >0, derive voxel size from bounds/res")
    ap.add_argument("--depth_ratio", type=float, default=0.0)
    ap.add_argument("--base", action="store_true",
                    help="render the base training checkpoint even when "
                         "unveiled rounds exist")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import load_config
    from ..renderer import render, render_semantic
    from ..scene.scene import Scene
    from ..train.checkpoint import (latest_unveiled_checkpoint,
                                    load_sky_for_iteration,
                                    search_max_iteration)
    from ..train.losses import psnr
    from ..utils.semantics import CONCERNED_COLORS
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
    # like the reference render.py:101-115: when unveiling rounds exist,
    # render the newest unveiled checkpoint (cameras/sky still come from
    # the base model dir); --base opts back into the training checkpoint
    unveiled = None if args.base else \
        latest_unveiled_checkpoint(args.model_path)
    if unveiled is not None:
        from ..utils.ply import state_from_ply
        state = state_from_ply(unveiled,
                               spatial_scale=scene.cameras_extent)
        print(f"loaded unveiled checkpoint {unveiled}: "
              f"{int(state.num_alive)} surfels")
    else:
        state = scene.load(iteration)
        print(f"loaded iteration {iteration}: "
              f"{int(state.num_alive)} surfels")

    # composite the trained env-map sky when the checkpoint carries one
    # (train.py:114-115 semantics: image = render + sky·(1−α))
    sky_params = load_sky_for_iteration(args.model_path, iteration, state)

    # ModelParams.white_background is a real config field persisted in
    # cfg_args.json (reference -w flag); otherwise the scene's own GT
    # background (cli/common.py scene_background)
    from .common import scene_background
    bg = scene_background(scene, model.white_background)

    # demand-measured duplicate capacity: trained/densified states easily
    # exceed the 4.5-tiles/surfel default, which would silently drop the
    # farthest surfels from every render (renderer.py
    # measure_duplicate_capacity)
    from ..renderer import measure_duplicate_capacity
    dup_cap = measure_duplicate_capacity(scene.train_cameras, state)
    print(f"duplicate capacity (measured): {dup_cap}")

    # jit over the Camera pytree: per-view w2c/K are traced arrays,
    # width/height static — correct for multi-camera rigs with distinct
    # intrinsics (one compile per distinct image size)
    @jax.jit
    def render_view(cam, sky_p):
        res = render(cam, state, bg, duplicate_capacity=dup_cap)
        img = res.render
        if sky_p is not None:
            from ..models.sky import render_sky
            c2w = jnp.linalg.inv(cam.w2c)
            sky = render_sky(sky_p, cam.height, cam.width, cam.K, c2w)
            img = img + sky * (1.0 - res.rend_alpha)[..., None]
        nrm = res.rend_normal_world(cam)
        sem = render_semantic(cam, state, duplicate_capacity=dup_cap) \
            if args.semantics else None
        return img, res.surf_depth, nrm, sem

    def render_split(split, cameras, images):
        out_dir = os.path.join(args.model_path, split, f"ours_{iteration}")
        for sub in ["renders", "gt", "depth", "normal", "semantic"]:
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        psnrs = []
        for i, cam in enumerate(cameras):
            img, depth_v, nrm, sem = render_view(cam, sky_params)
            img = np.clip(np.array(img), 0, 1)
            _save_png(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
            gt = images[i] if i < len(images) else None
            if gt is not None:
                _save_png(os.path.join(out_dir, "gt", f"{i:05d}.png"), gt)
                psnrs.append(float(psnr(jnp.asarray(img), jnp.asarray(gt))))
            d = np.array(depth_v)
            _save_png(os.path.join(out_dir, "depth", f"{i:05d}.png"),
                      np.repeat((d / max(d.max(), 1e-6))[..., None], 3, -1))
            _save_png(os.path.join(out_dir, "normal", f"{i:05d}.png"),
                      np.array(nrm) * 0.5 + 0.5)
            if sem is not None:
                sem_rgb = CONCERNED_COLORS[np.array(sem).argmax(-1)] / 255.0
                _save_png(os.path.join(out_dir, "semantic", f"{i:05d}.png"),
                          sem_rgb)
        if psnrs:
            print(f"{split}: mean PSNR over {len(psnrs)} views: "
                  f"{np.mean(psnrs):.2f} dB")
        print(f"wrote {out_dir}")

    if not args.skip_train:
        render_split("train", scene.train_cameras, scene.train_images)
    if not args.skip_test and scene.test_cameras:
        render_split("test", scene.test_cameras,
                     getattr(scene, "test_images", []))

    if not args.skip_mesh:
        from ..mesh import estimate_bounds, extract_mesh
        from ..ops.tsdf import save_mesh_ply
        mesh_dir = os.path.join(args.model_path, "train",
                                f"ours_{iteration}")
        os.makedirs(mesh_dir, exist_ok=True)
        # reference fuses every 3rd train camera (render.py:123-132)
        fuse_cams = scene.train_cameras[::3]
        voxel = args.voxel_size
        if args.mesh_res > 0:
            lo, hi = estimate_bounds(state)
            voxel = float(np.max(hi - lo) / args.mesh_res)
        from ..mesh import keep_large_clusters
        verts, faces, colors = extract_mesh(
            fuse_cams, state, bg=bg, voxel_size=voxel,
            depth_ratio=args.depth_ratio, min_cluster_frac=0.0,
            duplicate_capacity=dup_cap)
        save_mesh_ply(os.path.join(mesh_dir, "fuse.ply"), verts, faces,
                      colors)
        if faces.shape[0]:
            pv, pf, pc = keep_large_clusters(verts, faces, colors, 0.02)
        else:
            pv, pf, pc = verts, faces, colors
        save_mesh_ply(os.path.join(mesh_dir, "fuse_post.ply"), pv, pf, pc)
        print(f"mesh: {verts.shape[0]} verts / {faces.shape[0]} faces → "
              f"{os.path.join(mesh_dir, 'fuse.ply')} (+ fuse_post.ply)")


if __name__ == "__main__":
    main()
