"""Evaluation CLI — the reference's ``eval_lpips.py`` / ``eval_lpips_fid.sh``.

    python -m streetunveiler_tpu.cli.evaluate \
        --render_path <dir> --gt_path <dir> [--lpips_weights lpips_vgg.npz]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--render_path", required=True)
    ap.add_argument("--gt_path", required=True)
    ap.add_argument("--lpips_weights", default="")
    args = ap.parse_args(argv)

    from ..evaluation.metrics import evaluate_dirs
    out = evaluate_dirs(args.render_path, args.gt_path,
                        lpips_weights=args.lpips_weights or None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
