"""Full training-state checkpointing (reference ``capture``/``restore``,
``scene/gaussian_model.py:60-94`` + ``train.py:202-207``, and the artifact
discovery helpers of ``utils/system_utils.py:21-46``).

Two formats, like the reference (SURVEY.md §5 checkpoint/resume):
  * the portable per-surfel PLY (utils/ply.py) — the compatibility bridge;
  * the full resumable state: every pytree leaf of (SurfelState, AdamState,
    optional SkyParams + its AdamState) in one ``.npz`` keyed by tree path
    — the torch ``splatting.pt`` equivalent, restored loss-lessly.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in leaves}


def _unflatten(template, prefix, blob):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + jax.tree_util.keystr(path)
        if key not in blob:
            raise KeyError(f"checkpoint missing leaf {key}")
        leaves.append(jnp.asarray(blob[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, state, opt_state, iteration: int,
                    sky_params=None, sky_opt_state=None) -> None:
    """Write ``<path>/splatting.npz`` (+ sky) for exact resume."""
    os.makedirs(path, exist_ok=True)
    blob = {"iteration": np.asarray(iteration)}
    blob.update(_flatten(state, "state"))
    blob.update(_flatten(opt_state, "opt"))
    if sky_params is not None:
        blob.update(_flatten(sky_params, "sky"))
    if sky_opt_state is not None:
        blob.update(_flatten(sky_opt_state, "skyopt"))
    np.savez(os.path.join(path, "splatting.npz"), **blob)


def load_checkpoint(path: str, state_template, opt_template,
                    sky_template=None, sky_opt_template=None):
    """Restore from ``save_checkpoint`` artifacts; templates supply the
    pytree structure (e.g. a freshly initialized state of equal capacity).
    Returns (state, opt_state, iteration[, sky_params, sky_opt_state])."""
    blob = np.load(os.path.join(path, "splatting.npz"))
    state = _unflatten(state_template, "state", blob)
    opt_state = _unflatten(opt_template, "opt", blob)
    iteration = int(blob["iteration"])
    out = [state, opt_state, iteration]
    if sky_template is not None:
        out.append(_unflatten(sky_template, "sky", blob))
    if sky_opt_template is not None:
        out.append(_unflatten(sky_opt_template, "skyopt", blob))
    return tuple(out)


def load_sky_for_iteration(model_path: str, iteration: int, state,
                           seed: int = 0):
    """Best-effort sky-model restore from ``checkpoint/iteration_N`` —
    returns SkyParams or None (for render/unveil-time compositing)."""
    ckpt = os.path.join(model_path, "checkpoint", f"iteration_{iteration}",
                        "splatting.npz")
    if not os.path.exists(ckpt):
        return None
    blob = np.load(ckpt)
    if not any(k.startswith("sky") for k in blob.files):
        return None
    import jax
    from ..models.sky import init_sky
    from ..train.optim import adam_init
    tmpl = init_sky(jax.random.PRNGKey(seed))
    try:
        return _unflatten(tmpl, "sky", blob)
    except KeyError:
        return None


def search_max_iteration(folder: str) -> Optional[int]:
    """Largest N among ``iteration_N`` children (reference
    ``searchForMaxIteration``)."""
    if not os.path.isdir(folder):
        return None
    iters = [int(m.group(1)) for name in os.listdir(folder)
             if (m := re.fullmatch(r"iteration_(\d+)", name))]
    return max(iters) if iters else None


def search_max_inpaint_round(model_path: str) -> int:
    """Largest N among ``instance_workspace_N`` dirs, 0 if none (reference
    ``searchForMaxInpaintRound``)."""
    if not os.path.isdir(model_path):
        return 0
    rounds = [int(m.group(1)) for name in os.listdir(model_path)
              if (m := re.fullmatch(r"instance_workspace_(\d+)", name))]
    return max(rounds) if rounds else 0


def latest_unveiled_checkpoint(model_path: str) -> Optional[str]:
    """Newest ``instance_workspace_N/checkpoint/point_cloud.ply`` that
    exists, or None. How the reference chains unveiling rounds: stage A of
    round r loads round r−1's unveiled state
    (``1_instance_visualization.py:39-47``) and ``render.py:101-115``
    renders the newest unveiled checkpoint when any round exists. Skips
    workspaces without a checkpoint (``--select_only`` leftovers)."""
    if not os.path.isdir(model_path):
        return None
    rounds = sorted((int(m.group(1)) for name in os.listdir(model_path)
                     if (m := re.fullmatch(r"instance_workspace_(\d+)",
                                           name))), reverse=True)
    for r in rounds:
        ply = os.path.join(model_path, f"instance_workspace_{r}",
                           "checkpoint", "point_cloud.ply")
        if os.path.exists(ply):
            return ply
    return None
