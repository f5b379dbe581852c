"""Multi-chip parallel rendering/training (SURVEY.md §2.4).

The reference is single-GPU; the scaling axes of this workload are pixels
(H×W) and surfels (N). The TPU-native decomposition (BASELINE north star):

* **tile parallelism** — shard the image's row-slabs across the ``tile``
  mesh axis. Each device rasterizes its slab with a principal-point-shifted
  camera (an exact crop), holding the full surfel set; per-surfel gradients
  are ``psum``-reduced over ICI after the backward blend.
* **data parallelism** — a batch of cameras sharded over the ``data`` axis.
* surfel sharding of parameters/optimizer state composes on top for scenes
  past HBM capacity (the parameters enter all-gathered per step).

Everything is ``jax.shard_map`` over a ``Mesh(('data', 'tile'))`` — XLA
inserts the collectives; no NCCL analog exists or is needed.

Deviation by design: windowed SSIM is computed per-slab (windows do not
cross slab boundaries), an O(window/H) approximation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizationParams
from ..models.gaussians import SurfelState, add_densification_stats
from ..renderer import render
from ..scene.cameras import Camera
from ..train.losses import l1_loss, psnr, ssim
from ..train.optim import AdamState, adam_update
from ..train.schedule import expon_lr
from ..train.step import make_lrs
from ..ops.rasterizer.kernel import TILE_H

try:
    shard_map = jax.shard_map
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map  # type: ignore


def surfel_sharding(mesh: Mesh):
    """NamedSharding placing surfel-axis arrays sharded over 'data'
    (use with jax.device_put on params/moments before step_zero)."""
    return NamedSharding(mesh, P("data"))


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_tile, (
        f"need {n_data * n_tile} devices, have {devices.size}")
    return Mesh(devices[:n_data * n_tile].reshape(n_data, n_tile),
                ("data", "tile"))


def make_sharded_train_step(mesh: Mesh, opt: OptimizationParams,
                            width: int, height: int,
                            duplicate_capacity: int | None = None,
                            interpret: bool | None = None,
                            shard_surfels: bool = False):
    """Build the jitted multi-chip training step.

    Step signature:
        step(state, opt_state, w2c [B,4,4], K [B,3,3], gt [B,H,W,3],
             bg [3], iteration) -> (state, opt_state, metrics)
    B must be a multiple of mesh 'data'; H a multiple of 16·'tile'.

    ``shard_surfels``: ZeRO-style memory scaling for 5M+ surfel scenes
    (BASELINE config 5): parameters, Adam moments, and densification stats
    live sharded along the surfel axis over the 'data' axis; each step
    all-gathers the parameters for rendering, reduce-scatters the
    gradients back to shards, and applies Adam on the local shard only.
    Requires capacity % mesh.shape['data'] == 0.
    """
    n_tile = mesh.shape["tile"]
    slab = height // n_tile
    assert slab * n_tile == height and slab % TILE_H == 0, (
        f"height {height} must split into {n_tile} slabs of multiple-of-16")
    def slab_capacity(n_surfels: int) -> int:
        """Per-device static duplicate capacity.

        Each device culls + bins only the surfels its slab crop sees, so
        the per-device duplicate stream (and the sort/gather over it)
        shrinks ~1/n_tile — binning is slab-local, not the full-image
        duplication of round 1. Sized at 2× the even-split share to
        absorb uneven splat density across slabs."""
        if duplicate_capacity is not None:
            return duplicate_capacity
        from ..ops.rasterizer.api import default_duplicate_capacity
        full = default_duplicate_capacity(n_surfels, width, height)
        if n_tile == 1:
            return full
        return -(-(2 * full // n_tile) // 128) * 128

    def local_loss(params, aux_state, w2c, K, gt_slab, bg, iteration, row0,
                   c2d_off):
        state = dataclasses.replace(aux_state, params=params)
        # shifting the principal point by the slab row is an exact crop
        cam = Camera(w2c=w2c, K=K.at[1, 2].add(-row0.astype(jnp.float32)),
                     width=width, height=slab)
        active_sh = jnp.minimum(iteration // 1000, state.sh_degree)
        res = render(cam, state, bg, active_sh_degree=active_sh,
                     center2d_offset=c2d_off, interpret=interpret,
                     duplicate_capacity=slab_capacity(params.xyz.shape[0]))
        image = res.render
        ll1 = l1_loss(image, gt_slab)
        lssim = ssim(image, gt_slab)
        loss = (1 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1 - lssim)
        lambda_normal = jnp.where(iteration > opt.normal_consist_from_iter,
                                  opt.lambda_normal, 0.0)
        normal_err = 1.0 - jnp.sum(res.rend_normal * res.surf_normal, -1)
        loss = loss + lambda_normal * jnp.mean(normal_err)
        lambda_dist = jnp.where(iteration > opt.semantic_dist_from_iter,
                                opt.lambda_dist, 0.0)
        loss = loss + lambda_dist * jnp.mean(res.rend_dist)
        return loss, (image, res.radii)

    def sharded_grads(params, aux_state, w2c_b, k_b, gt_b, bg, iteration):
        """Runs per-device: local camera batch × local slab."""
        row0 = jax.lax.axis_index("tile") * slab
        zeros2d = jnp.zeros((params.xyz.shape[0], 2))

        def one_cam(w2c, K, gt_slab):
            (loss, aux), grads = jax.value_and_grad(
                local_loss, argnums=(0, 8), has_aux=True)(
                params, aux_state, w2c, K, gt_slab, bg, iteration, row0,
                zeros2d)
            return loss, grads, aux

        loss, grads, (img, radii) = jax.vmap(one_cam)(w2c_b, k_b, gt_b)
        nb = w2c_b.shape[0]
        loss = jax.lax.pmean(jnp.mean(loss), ("data", "tile"))
        sum_b = lambda g: jnp.sum(g, axis=0) / nb
        pg, sg = jax.tree.map(sum_b, grads)
        pg = jax.lax.pmean(pg, ("data", "tile"))
        sg = jax.lax.pmean(sg, ("data", "tile"))
        vis = jax.lax.pmax(jnp.max(jnp.where(radii > 0, radii, 0.0), axis=0),
                           ("data", "tile"))
        return loss, pg, sg, vis

    @functools.partial(jax.jit, static_argnames=())
    def step(state: SurfelState, opt_state: AdamState, w2c_b, k_b, gt_b,
             bg, iteration):
        fn = shard_map(
            sharded_grads,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"),
                      P("data", "tile", None, None), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        loss, pgrads, sgrads, radii = fn(
            state.params, state, w2c_b, k_b, gt_b, bg, iteration)

        lrs = make_lrs(opt, iteration, state.spatial_scale)
        new_params, opt_state = adam_update(pgrads, opt_state, state.params,
                                            lrs)
        state = dataclasses.replace(state, params=new_params)
        visible = (radii > 0) & (iteration < opt.densify_until_iter)
        state = add_densification_stats(state, sgrads, radii, visible)
        return state, opt_state, dict(loss=loss)

    def zero_sharded(params_shard, mu_shard, nu_shard, aux_state,
                     w2c_b, k_b, gt_b, bg, iteration, step_count):
        """Per-device body with surfel-sharded parameters/moments."""
        gather = lambda leaf: jax.lax.all_gather(leaf, "data", axis=0,
                                                 tiled=True)
        params = jax.tree.map(gather, params_shard)
        loss, pgrads, sgrads, radii = sharded_grads(
            params, aux_state, w2c_b, k_b, gt_b, bg, iteration)
        # pgrads are identical on every device after the pmean; keep only
        # this device's shard of them (reduce-scatter equivalent)
        nd = jax.lax.axis_size("data")
        me = jax.lax.axis_index("data")
        shard_of = lambda leaf: jax.lax.dynamic_slice_in_dim(
            leaf, me * (leaf.shape[0] // nd), leaf.shape[0] // nd, 0)
        g_shard = jax.tree.map(shard_of, pgrads)

        lrs = make_lrs(opt, iteration, aux_state.spatial_scale)
        new_shard, new_opt = adam_update(
            g_shard, AdamState(step=step_count, mu=mu_shard, nu=nu_shard),
            params_shard, lrs)
        return (loss, new_shard, new_opt.mu, new_opt.nu,
                shard_of(sgrads), shard_of(radii))

    @functools.partial(jax.jit, static_argnames=())
    def step_zero(state: SurfelState, opt_state: AdamState, w2c_b, k_b,
                  gt_b, bg, iteration):
        """state.params / opt moments / densify stats enter SHARDED along
        the surfel axis (place them with surfel_sharding(mesh))."""
        fn = shard_map(
            zero_sharded,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P("data"),
                      P("data"), P("data", "tile", None, None), P(), P(),
                      P()),
            out_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                       P("data")),
            check_vma=False,
        )
        # aux_state carries the non-parameter arrays replicated (semantics/
        # alive are cheap int/bool masks; the heavy f32 state is sharded).
        # Its params leaves are never read — pass empty slices so the
        # sharded parameter arrays aren't re-gathered under the P() spec.
        aux = dataclasses.replace(
            state, params=jax.tree.map(lambda l: l[:0], state.params))
        loss, new_params, mu, nu, sgrads, radii = fn(
            state.params, opt_state.mu, opt_state.nu, aux, w2c_b, k_b,
            gt_b, bg, iteration, opt_state.step)
        opt_state = AdamState(step=opt_state.step + 1, mu=mu, nu=nu)
        state = dataclasses.replace(state, params=new_params)
        visible = (radii > 0) & (iteration < opt.densify_until_iter)
        state = add_densification_stats(state, sgrads, radii, visible)
        return state, opt_state, dict(loss=loss)

    return step_zero if shard_surfels else step
