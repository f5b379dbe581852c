"""Render/eval CLI — the reference's ``render.py`` driver.

Renders train (and test) views from the newest checkpoint: RGB, depth,
normal, semantic argmax visualizations + per-view PSNR, written into
``<model_path>/{train,test}/ours_<iter>/`` like the reference layout.
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
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ..config import load_config
    from ..renderer import render, render_semantic
    from ..scene.readers import make_synthetic_street, read_colmap_scene
    from ..scene.scene import Scene
    from ..train.checkpoint import search_max_iteration
    from ..train.losses import psnr
    from ..utils.semantics import CONCERNED_COLORS

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
    print(f"loaded iteration {iteration}: {int(state.num_alive)} surfels")

    # composite the trained env-map sky when the checkpoint carries one
    # (train.py:114-115 semantics: image = render + sky·(1−α))
    from ..train.checkpoint import load_sky_for_iteration
    sky_params = load_sky_for_iteration(args.model_path, iteration, state)

    bg = jnp.array([1.0, 1.0, 1.0]) if getattr(model, "white_background",
                                               False) else jnp.zeros(3)
    out_dir = os.path.join(args.model_path, "train", f"ours_{iteration}")
    for sub in ["renders", "gt", "depth", "normal", "semantic"]:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    import jax

    @jax.jit
    def render_view(w2c, sky_p):
        cam0 = scene.train_cameras[0]
        cam = type(cam0)(w2c=w2c, K=cam0.K, width=cam0.width,
                         height=cam0.height)
        res = render(cam, state, bg)
        img = res.render
        if sky_p is not None:
            from ..models.sky import render_sky
            c2w = jnp.linalg.inv(w2c)
            sky = render_sky(sky_p, cam.height, cam.width, cam.K, c2w)
            img = img + sky * (1.0 - res.rend_alpha)[..., None]
        nrm = res.rend_normal_world(cam)
        sem = render_semantic(cam, state) if args.semantics else None
        return img, res.surf_depth, nrm, sem

    psnrs = []
    for i, cam in enumerate(scene.train_cameras):
        img, depth_v, nrm, sem = render_view(cam.w2c, sky_params)
        img = np.clip(np.array(img), 0, 1)
        _save_png(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
        gt = scene.train_images[i]
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
        print(f"mean PSNR over {len(psnrs)} train views: "
              f"{np.mean(psnrs):.2f} dB")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
