"""Out-of-band inpainting worker for the DirectoryInpainter protocol.

Run this on a GPU host (where ZITS++ / LeftRefill and their checkpoints
live) against the same ``--root`` directory the TPU-side pipeline uses
(``cli/unveil.py --inpainter dir:<root>``); the TPU pipeline writes
requests and blocks until this worker answers:

    requests/{k:06d}_image.png, _mask.png[, _reference.png], {k:06d}.json
    results/{k:06d}.png

Backends:
  diffuse      hermetic Jacobi diffuse fill (no external models; used by
               the protocol tests and as a smoke backend)
  zits         ZITS++ single-image inpainting — requires the
               ZITS-PlusPlus repo + checkpoints on this host; the adapter
               follows the reference wrapper's call shape
               (/root/reference/utils/zits_utils.py:143 ``ZitsGuidance``)
  leftrefill   LeftRefill reference-guided SD inpainting — requires the
               LeftRefill repo + checkpoints
               (/root/reference/utils/left_refill_utils.py:25,277)
  auto         zits for ``mode=inpaint`` requests, leftrefill for
               ``mode=reference_guided`` (the reference's stage-C split,
               1_optimization.py:127-199)

Usage:
    python tools/inpaint_worker.py --root /shared/inpaint --backend auto \
        --zits_repo ~/ZITS-PlusPlus --zits_ckpt ~/ckpts/zits \
        --leftrefill_repo ~/LeftRefill --leftrefill_ckpt ~/ckpts/lr
    python tools/inpaint_worker.py --root <dir> --backend diffuse --once
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_png(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _read_mask(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), np.float32) > 127


def _write_png_atomic(path, arr):
    from PIL import Image
    a = (np.clip(np.asarray(arr, np.float32), 0, 1) * 255).astype(np.uint8)
    tmp = path + ".tmp"
    Image.fromarray(a).save(tmp, format="PNG")
    os.replace(tmp, path)


def make_backend(name, args):
    if name == "diffuse":
        from streetunveiler_tpu.pipeline.inpaint import DiffuseFillInpainter
        ip = DiffuseFillInpainter()
        return lambda img, mask, ref, mode: ip.inpaint(img, mask,
                                                       reference=ref)
    if name == "zits":
        fn = _load_zits(args)
        return lambda img, mask, ref, mode: fn(img, mask)
    if name == "leftrefill":
        fn = _load_leftrefill(args)
        return lambda img, mask, ref, mode: fn(img, mask, ref)
    if name == "auto":
        zits = _load_zits(args)
        lr = _load_leftrefill(args)
        return lambda img, mask, ref, mode: (
            lr(img, mask, ref) if mode == "reference_guided" and ref is not
            None else zits(img, mask))
    raise SystemExit(f"unknown backend {name!r}")


def _load_zits(args):
    """ZITS++ adapter (pipeline/zits.py implements the reference wrapper's
    full inference flow — masked positional encoding, NMS + structure
    upsampling, FTR run — around the external repo's models,
    zits_utils.py:143)."""
    if not args.zits_repo:
        raise SystemExit("--backend zits requires --zits_repo/--zits_ckpt")
    from streetunveiler_tpu.pipeline.zits import ZitsInpainter
    ip = ZitsInpainter(args.zits_repo, args.zits_ckpt, device=args.device)
    return lambda img, mask: ip.inpaint(img, mask)


def _load_leftrefill(args):
    """LeftRefill adapter (pipeline/leftrefill.py: [reference|source]
    512x1024 canvas, 50-token prompt, DDIM, right-half crop —
    left_refill_utils.py:277-346)."""
    if not args.leftrefill_repo:
        raise SystemExit("--backend leftrefill requires --leftrefill_repo")
    from streetunveiler_tpu.pipeline.leftrefill import LeftRefillInpainter
    ip = LeftRefillInpainter(args.leftrefill_repo,
                             args.leftrefill_ckpt or
                             "check_points/ref_guided_inpainting",
                             device=args.device)
    return lambda img, mask, ref: ip.inpaint(img, mask, reference=ref)


def serve(root, backend, once=False, poll=0.5):
    req_dir = os.path.join(root, "requests")
    res_dir = os.path.join(root, "results")
    os.makedirs(req_dir, exist_ok=True)
    os.makedirs(res_dir, exist_ok=True)
    done = set(f[:-4] for f in os.listdir(res_dir) if f.endswith(".png"))
    print(f"inpaint worker serving {root} ({len(done)} results present)",
          flush=True)
    while True:
        pending = sorted(f[:-5] for f in os.listdir(req_dir)
                         if f.endswith(".json") and f[:-5] not in done)
        for stem in pending:
            with open(os.path.join(req_dir, stem + ".json")) as f:
                meta = json.load(f)
            img = _read_png(os.path.join(req_dir, stem + "_image.png"))
            mask = _read_mask(os.path.join(req_dir, stem + "_mask.png"))
            ref_path = os.path.join(req_dir, stem + "_reference.png")
            ref = _read_png(ref_path) if os.path.exists(ref_path) else None
            t0 = time.monotonic()
            out = backend(img, mask, ref, meta.get("mode", "inpaint"))
            _write_png_atomic(os.path.join(res_dir, stem + ".png"), out)
            done.add(stem)
            print(f"answered {stem} mode={meta.get('mode')} "
                  f"in {time.monotonic() - t0:.1f}s", flush=True)
        if once:
            return len(done)
        time.sleep(poll)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--backend", default="diffuse",
                    choices=["diffuse", "zits", "leftrefill", "auto"])
    ap.add_argument("--zits_repo", default="")
    ap.add_argument("--zits_ckpt", default="")
    ap.add_argument("--leftrefill_repo", default="")
    ap.add_argument("--leftrefill_ckpt", default="")
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--once", action="store_true",
                    help="answer pending requests, then exit")
    args = ap.parse_args()
    serve(args.root, make_backend(args.backend, args), once=args.once)


if __name__ == "__main__":
    main()
