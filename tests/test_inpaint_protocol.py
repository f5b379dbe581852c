"""Out-of-band inpainter protocol + stage-B condition artifacts
(reference ``utils/zits_utils.py:143`` / ``left_refill_utils.py:277`` file
contract and ``2_generate_inpainted_mask.py:94-165`` layout)."""

import json
import os
import threading
import time

import numpy as np
import pytest

from streetunveiler_tpu.pipeline.inpaint import (DiffuseFillInpainter,
                                                 DirectoryInpainter)


def _worker(root, stop, fill_value=0.25):
    """Minimal inpaint worker: watches requests/, answers results/ —
    the stand-in for a GPU host running ZITS++/LeftRefill."""
    from PIL import Image
    req = os.path.join(root, "requests")
    res = os.path.join(root, "results")
    seen = set()
    while not stop.is_set():
        for name in sorted(os.listdir(req)):
            if not name.endswith(".json") or name in seen:
                continue
            seen.add(name)
            meta = json.load(open(os.path.join(req, name)))
            k = meta["id"]
            img = np.asarray(Image.open(
                os.path.join(req, f"{k:06d}_image.png")), np.float32) / 255.0
            mask = np.asarray(Image.open(
                os.path.join(req, f"{k:06d}_mask.png"))) > 127
            out = img.copy()
            if meta["mode"] == "reference_guided":
                ref = np.asarray(Image.open(
                    os.path.join(req, f"{k:06d}_reference.png")),
                    np.float32) / 255.0
                out[mask] = ref[mask]
            else:
                out[mask] = fill_value
            tmp = os.path.join(res, f"{k:06d}.tmp.png")
            Image.fromarray((out * 255).astype(np.uint8)).save(tmp)
            os.replace(tmp, os.path.join(res, f"{k:06d}.png"))
        time.sleep(0.02)


def test_directory_inpainter_roundtrip(tmp_path):
    root = str(tmp_path / "exchange")
    inp = DirectoryInpainter(root, poll_interval=0.05, timeout=20.0)
    stop = threading.Event()
    t = threading.Thread(target=_worker, args=(root, stop), daemon=True)
    t.start()
    try:
        img = np.full((16, 24, 3), 0.8, np.float32)
        mask = np.zeros((16, 24), bool)
        mask[4:9, 6:12] = True
        out = inp.inpaint(img, mask)
        assert out.shape == img.shape
        np.testing.assert_allclose(out[mask], 0.25, atol=1 / 255)
        np.testing.assert_allclose(out[~mask], 0.8, atol=1 / 255)

        ref = np.full_like(img, 0.1)
        out2 = inp.inpaint(img, mask, reference=ref)
        np.testing.assert_allclose(out2[mask], 0.1, atol=1 / 255)
    finally:
        stop.set()
        t.join(timeout=2)


def test_directory_inpainter_fallback(tmp_path):
    """No worker attached → the fallback answers after the timeout."""
    inp = DirectoryInpainter(str(tmp_path / "x"), poll_interval=0.05,
                             timeout=0.2,
                             fallback=DiffuseFillInpainter(iterations=10))
    img = np.full((8, 8, 3), 0.5, np.float32)
    mask = np.zeros((8, 8), bool)
    mask[2:5, 2:5] = True
    out = inp.inpaint(img, mask)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[~mask], 0.5, atol=1e-5)


def test_directory_inpainter_timeout_raises(tmp_path):
    inp = DirectoryInpainter(str(tmp_path / "y"), poll_interval=0.05,
                             timeout=0.2)
    with pytest.raises(TimeoutError):
        inp.inpaint(np.zeros((4, 4, 3), np.float32),
                    np.ones((4, 4), bool))


def test_write_inpaint_conditions(tmp_path):
    """Stage-B persistence writes the reference artifact layout."""
    import jax.numpy as jnp
    from streetunveiler_tpu.pipeline.masks import (include_neighbor_pcd,
                                                   write_inpaint_conditions)
    from streetunveiler_tpu.pipeline.select import (
        cluster_semantic_instance, removal_mask_for_instances)
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.utils.semantics import VEHICLE_BIT

    info = make_synthetic_street(n_points=600, n_cameras=3, width=64,
                                 height=48, focal=45.0, seed=3)
    scene = Scene(info)
    state = scene.create_state(capacity=1024)
    cl = cluster_semantic_instance(state, VEHICLE_BIT, threshold=1.5)
    removal = removal_mask_for_instances(cl, [], all_solid=True, min_size=5)
    assert removal.sum() > 0

    ws = str(tmp_path / "ws")
    os.makedirs(ws)
    fm = write_inpaint_conditions(scene, state, removal, ws, jnp.zeros(3))
    assert set(fm.keys()) == {0, 1, 2}
    for sub in ("mask_inpaint", "inpainted_rgb", "inpainted_depth",
                "inpainted_normal", "original_rgb", "empty_opacity"):
        d = os.path.join(ws, sub)
        assert len(os.listdir(d)) >= 3, sub
    # npy masks round-trip and match the returned masks
    m0 = np.load(os.path.join(ws, "mask_inpaint", "00000.npy"))
    np.testing.assert_array_equal(m0, fm[0])
    valid = np.load(os.path.join(ws, "valid_inpaint_frame.npy"))
    assert list(valid) == [0, 1, 2]


def test_inpaint_worker_serves_requests(tmp_path):
    """tools/inpaint_worker.py --once must answer pending protocol
    requests (the GPU-host side of the out-of-band file exchange)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.inpaint_worker import make_backend, serve

    root = str(tmp_path)
    ip = DirectoryInpainter(root, timeout=0.01,
                            fallback=DiffuseFillInpainter(iterations=5))
    img = np.full((16, 16, 3), 0.25, np.float32)
    img[4:12, 4:12] = 0.9
    mask = np.zeros((16, 16), bool)
    mask[6:10, 6:10] = True
    # fallback answers immediately (no worker yet) but the request stays
    ip.inpaint(img, mask)
    ip.inpaint(img, mask, reference=img[::-1])

    class _Args:
        pass
    n = serve(root, make_backend("diffuse", _Args()), once=True)
    assert n == 2
    for k in range(2):
        out_path = os.path.join(root, "results", f"{k:06d}.png")
        assert os.path.exists(out_path)
    # a fresh DirectoryInpainter now gets the worker's answer for id 0
    ip2 = DirectoryInpainter(root, timeout=5.0, poll_interval=0.05)
    res = ip2.inpaint(img, mask)
    assert res.shape == img.shape and np.isfinite(res).all()
