"""Evaluation CLI — the reference's ``eval_lpips.py`` / ``eval_lpips_fid.sh``.

    python -m streetunveiler_tpu.cli.evaluate \
        --render_path <dir> --gt_path <dir> \
        [--lpips_weights lpips_vgg.npz] \
        [--fid --inception_weights inception_fid.npz]

``--fid`` computes the Frechet distance. With ``--inception_weights`` (an
export of pytorch_fid's ``pt_inception-2015-12-05`` checkpoint via
``tools/export_eval_weights.py``) the feature space is the reference
protocol's InceptionV3 pool3 (``eval_lpips_fid.sh:5``) and values are
comparable to pytorch_fid's. Without it, pooled VGG tap features from the
LPIPS artifact are used — self-consistent across runs but NOT
Inception-comparable (reported as ``fid_vgg``).
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
    ap.add_argument("--inception_weights", default="",
                    help="inception_fid.npz (tools/export_eval_weights.py) "
                         "for reference-comparable FID")
    ap.add_argument("--fid", action="store_true",
                    help="also report the Frechet distance (InceptionV3 "
                         "pool3 with --inception_weights, else VGG taps)")
    args = ap.parse_args(argv)

    from ..evaluation.metrics import evaluate_dirs, fid_from_dirs
    out = evaluate_dirs(args.render_path, args.gt_path,
                        lpips_weights=args.lpips_weights or None)
    if args.fid:
        if args.inception_weights and os.path.exists(args.inception_weights):
            from ..evaluation.inception import inception_feature_fn
            out["fid"] = fid_from_dirs(
                args.render_path, args.gt_path,
                inception_feature_fn(args.inception_weights))
        elif args.lpips_weights and os.path.exists(args.lpips_weights):
            from ..evaluation.lpips import vgg_feature_fn
            out["fid_vgg"] = fid_from_dirs(
                args.render_path, args.gt_path,
                vgg_feature_fn(args.lpips_weights))
        else:
            raise SystemExit("--fid needs --inception_weights "
                             "<inception_fid.npz> (reference protocol) or "
                             "--lpips_weights <lpips_vgg.npz> (VGG-tap "
                             "fallback)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
