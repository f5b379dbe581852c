"""Evaluation CLI — the reference's ``eval_lpips.py`` / ``eval_lpips_fid.sh``.

    python -m streetunveiler_tpu.cli.evaluate \
        --render_path <dir> --gt_path <dir> \
        [--lpips_weights lpips_vgg.npz] [--fid]

``--fid`` computes Fréchet distance over pooled VGG tap features from the
same weight artifact as LPIPS (``evaluation/lpips.vgg_feature_fn``; the
reference uses pytorch_fid's InceptionV3, ``eval_lpips_fid.sh:5`` — an
external checkpoint this image cannot ship, so the values are
self-consistent rather than Inception-comparable).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--render_path", required=True)
    ap.add_argument("--gt_path", required=True)
    ap.add_argument("--lpips_weights", default="")
    ap.add_argument("--fid", action="store_true",
                    help="also report VGG-feature Fréchet distance "
                         "(requires --lpips_weights)")
    args = ap.parse_args(argv)

    from ..evaluation.metrics import evaluate_dirs, fid_from_dirs
    out = evaluate_dirs(args.render_path, args.gt_path,
                        lpips_weights=args.lpips_weights or None)
    if args.fid:
        if not (args.lpips_weights and os.path.exists(args.lpips_weights)):
            raise SystemExit("--fid needs --lpips_weights <lpips_vgg.npz>")
        from ..evaluation.lpips import vgg_feature_fn
        out["fid_vgg"] = fid_from_dirs(args.render_path, args.gt_path,
                                       vgg_feature_fn(args.lpips_weights))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
