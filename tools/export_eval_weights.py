"""Convert the reference eval protocol's torch checkpoints to .npz weights.

The reference scores unveiling with VGG-LPIPS (``eval_lpips.py:10-29``) and
pytorch_fid's InceptionV3 FID (``eval_lpips_fid.sh:5``). This repo's JAX
implementations (``evaluation/lpips.py``, ``evaluation/inception.py``) load
their weights from ``.npz`` artifacts; this converter produces them from
the torch-side checkpoints on any machine that has them (torch-cpu is
enough — no torchvision/lpips/pytorch_fid packages needed for the .pth
paths, only for ``--lpips-from-package``):

    # LPIPS-VGG from the installed `lpips` package (needs lpips+torchvision)
    python tools/export_eval_weights.py --lpips-from-package lpips_vgg.npz

    # LPIPS-VGG from raw checkpoints (no packages):
    #   vgg16 torchvision weights + lpips repo's vgg.pth linear heads
    python tools/export_eval_weights.py \
        --vgg16 vgg16-397923af.pth --lpips-lins weights/v0.1/vgg.pth \
        --lpips-out lpips_vgg.npz

    # FID InceptionV3 from pytorch_fid's checkpoint
    python tools/export_eval_weights.py \
        --inception pt_inception-2015-12-05-21f595ea.pth \
        --inception-out inception_fid.npz

Artifact contracts:
  lpips_vgg.npz    conv0..conv25 (13 conv w/b pairs of VGG16 features) +
                   lin0..lin4 ([1, C] LPIPS linear heads)
  inception_fid.npz  the torch state_dict tensors under their original
                   names (evaluation/inception.py folds the BatchNorms)
"""

from __future__ import annotations

import argparse

import numpy as np


def _torch_load(path):
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    return blob


def export_lpips_from_package(out: str) -> None:
    import lpips
    m = lpips.LPIPS(net="vgg")
    blob = {f"conv{i}": p.detach().numpy()
            for i, p in enumerate(m.net.parameters())}
    blob.update({f"lin{i}": lin.model[1].weight.detach().numpy()[:, :, 0, 0]
                 for i, lin in enumerate(m.lins)})
    np.savez(out, **blob)
    print(f"wrote {out} ({len(blob)} arrays)")


def export_lpips_from_pth(vgg16_path: str, lins_path: str, out: str) -> None:
    """torchvision vgg16 state_dict + lpips vgg.pth (the `lin{k}.model.1`
    1x1 heads published in the lpips repo) → lpips_vgg.npz."""
    vgg = _torch_load(vgg16_path)
    # torchvision names: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.weight
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    blob = {}
    for i, c in enumerate(conv_ids):
        blob[f"conv{2 * i}"] = np.asarray(vgg[f"features.{c}.weight"])
        blob[f"conv{2 * i + 1}"] = np.asarray(vgg[f"features.{c}.bias"])
    lins = _torch_load(lins_path)
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        blob[f"lin{i}"] = np.asarray(lins[key])[:, :, 0, 0]
    np.savez(out, **blob)
    print(f"wrote {out} ({len(blob)} arrays)")


def export_inception(pth: str, out: str) -> None:
    sd = _torch_load(pth)
    blob = {k: np.asarray(v) for k, v in sd.items()
            if not k.startswith(("AuxLogits", "fc."))}
    np.savez(out, **blob)
    print(f"wrote {out} ({len(blob)} arrays)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lpips-from-package", metavar="OUT",
                    help="export lpips_vgg.npz via the installed lpips pkg")
    ap.add_argument("--vgg16", help="torchvision vgg16 .pth state_dict")
    ap.add_argument("--lpips-lins",
                    help="lpips repo weights/v0.1/vgg.pth (linear heads)")
    ap.add_argument("--lpips-out", default="lpips_vgg.npz")
    ap.add_argument("--inception",
                    help="pytorch_fid pt_inception-2015-12-05-*.pth")
    ap.add_argument("--inception-out", default="inception_fid.npz")
    args = ap.parse_args(argv)

    did = False
    if args.lpips_from_package:
        export_lpips_from_package(args.lpips_from_package)
        did = True
    if args.vgg16 and args.lpips_lins:
        export_lpips_from_pth(args.vgg16, args.lpips_lins, args.lpips_out)
        did = True
    if args.inception:
        export_inception(args.inception, args.inception_out)
        did = True
    if not did:
        ap.error("nothing to do: pass --lpips-from-package, "
                 "--vgg16+--lpips-lins, and/or --inception")


if __name__ == "__main__":
    main()
