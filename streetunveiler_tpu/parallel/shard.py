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
from ..renderer import finalize_render, render, surfel_colors
from ..scene.cameras import Camera
from ..train.losses import l1_loss, psnr, ssim
from ..train.optim import AdamState, adam_update
from ..train.schedule import expon_lr
from ..train.step import make_lrs
from ..ops.rasterizer.api import (_gather_records, bin_inputs_for_camera,
                                  bin_slab_from_inputs, encode_extra,
                                  rasterize_stream, shift_packT)
from ..ops.rasterizer.kernel import NQ, TILE_H, pack_geometry_T
from ..ops.rasterizer.preprocess import preprocess_surfels
from ..ops.rasterizer.types import RasterizeSettings

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
                            shard_surfels: bool = False,
                            semantics: bool = False,
                            class_dist: bool = False,
                            sky: bool = False,
                            sky_lr: float = 1e-4,
                            two_phase: bool = True,
                            shard_preprocess: bool = True):
    """Build the jitted multi-chip training step.

    Step signature:
        step(state, opt_state, w2c [B,4,4], K [B,3,3], gt [B,H,W,3],
             bg [3], iteration[, gt_sem [B,H,W] i32 when semantics])
            -> (state, opt_state, metrics)
    B must be a multiple of mesh 'data'; H a multiple of 16·'tile'.

    ``semantics``/``class_dist`` compile the full late-phase stage-1
    executable into the sharded step (semantic CE over fused payload
    channels + the fused per-class gated distortion, train/step.py
    ``stage1_loss``): slab means of CE / per-class distortion equal the
    global means (equal slab sizes), so the sharded losses match the
    single-chip step exactly.

    ``sky`` trains the env-map jointly (train.py:114-115,196-200): the
    step takes/returns (sky_params, sky_opt_state); each slab renders its
    rows of the sky through the same shifted principal point, and the
    replicated sky gradients are pmean'd with the surfel gradients.

    ``shard_surfels``: ZeRO-style memory scaling for 5M+ surfel scenes
    (BASELINE config 5): parameters, Adam moments, and densification stats
    live sharded along the surfel axis over the 'data' axis; each step
    all-gathers the parameters for rendering, reduce-scatters the
    gradients back to shards, and applies Adam on the local shard only.
    Requires capacity % mesh.shape['data'] == 0.

    ``two_phase``: slab binning runs in its OWN jitted executable and the
    visit schedule enters the grad executable as top-level arguments —
    the multi-chip form of the single-chip two-phase step (the blend
    kernels' scalar-prefetch operands computed in the same executable
    cost ~13 ms/direction on TPU, docs/profile.md). The returned callable
    keeps the one-call signature; it chains the two executables
    host-side (dispatch is async). Under ``shard_surfels`` the bin phase
    re-gathers the 4 geometry leaves (xyz/scaling/rotation/opacity —
    NOT the dominant SH features) along 'data', a small added collective.
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

    def _tile_shard(leaf):
        """This tile-device's contiguous surfel-axis slice."""
        nt = jax.lax.axis_size("tile")
        me = jax.lax.axis_index("tile")
        sz = leaf.shape[0] // nt
        return jax.lax.dynamic_slice_in_dim(leaf, me * sz, sz, 0)

    def _use_shard_pre(n_surfels: int) -> bool:
        return (shard_preprocess and n_tile > 1
                and n_surfels % n_tile == 0)

    def _render_shard_pre(params, aux_state, w2c, K, cam_slab, bg,
                          active_sh, row0, c2d_off, extra, gates,
                          binning):
        """Slab render with the per-surfel preprocess SHARDED over 'tile'.

        Each tile device preprocesses + packs N/n_tile surfels with the
        FULL camera, all-gathers the packed records along 'tile', and
        re-expresses them for its slab with the linear ``shift_packT``
        — per-surfel work runs once per data replica instead of once
        per tile device (VERDICT r3 #3). The all_gather's VJP is a
        psum-scatter, so each device's backward runs the preprocess VJP
        on its shard only.
        """
        sl = _tile_shard
        params_s = jax.tree.map(sl, params)
        state_s = dataclasses.replace(aux_state, params=params_s,
                                      alive=sl(aux_state.alive))
        cam_full = Camera(w2c=w2c, K=K, width=width, height=height)
        colors = surfel_colors(state_s, cam_full, active_sh)
        st_full = RasterizeSettings(width=width, height=height,
                                    znear=0.2, zfar=100.0)
        pack_extra, gates_n = encode_extra(extra, gates)
        sur = preprocess_surfels(
            params_s.xyz, state_s.get_scaling(), state_s.get_rotation(),
            state_s.get_opacity()[:, 0], colors, w2c, K, st_full,
            center2d_offset=sl(c2d_off))
        n_s = params_s.xyz.shape[0]
        packT_s = pack_geometry_T(
            sur, n_s, None if pack_extra is None else sl(pack_extra),
            pad_column=False)
        packT = jax.lax.all_gather(packT_s, "tile", axis=1, tiled=True)
        packT = jnp.concatenate(
            [packT, jnp.zeros((packT.shape[0], 1))], axis=1)
        radii = jax.lax.all_gather(sur.radius, "tile", axis=0, tiled=True)
        recT = _gather_records(shift_packT(packT, row0),
                               binning.sorted_surfel)
        st_slab = RasterizeSettings(width=width, height=slab,
                                    znear=0.2, zfar=100.0)
        nq = NQ + (0 if extra is None else extra.shape[1])
        out = rasterize_stream(recT, radii, st_slab, binning,
                               bg=jnp.asarray(bg), nq=nq, gates_n=gates_n,
                               interpret=interpret)
        return finalize_render(out, cam_slab)

    def local_loss(params, aux_state, w2c, K, gt_slab, gt_sem_slab, bg,
                   iteration, row0, c2d_off, sky_p, binning=None):
        state = dataclasses.replace(aux_state, params=params)
        # shifting the principal point by the slab row is an exact crop
        Kslab = K.at[1, 2].add(-row0.astype(jnp.float32))
        cam = Camera(w2c=w2c, K=Kslab, width=width, height=slab)
        active_sh = jnp.minimum(iteration // 1000, state.sh_degree)
        extra = gates = None
        if semantics:
            extra = jax.nn.one_hot(state.semantics, 6, dtype=jnp.float32)
        if semantics and class_dist:
            from ..renderer import semantic_class_mask
            from ..utils.semantics import CONCERNED_IND as _CI
            gates = jnp.stack(
                [semantic_class_mask(state, 1 << ci, reverse=True)
                 for ci in range(6) if ci != _CI["sky"]], axis=1)
        if binning is not None and _use_shard_pre(params.xyz.shape[0]):
            res = _render_shard_pre(params, aux_state, w2c, K, cam, bg,
                                    active_sh, row0, c2d_off, extra,
                                    gates, binning)
        else:
            res = render(cam, state, bg, active_sh_degree=active_sh,
                         center2d_offset=c2d_off, interpret=interpret,
                         duplicate_capacity=slab_capacity(
                             params.xyz.shape[0]),
                         extra_payload=extra, class_gates=gates,
                         binning=binning)
        image = res.render
        if sky:
            from ..models.sky import render_sky
            c2w = jnp.linalg.inv(w2c)
            sky_img = render_sky(sky_p, slab, width, Kslab, c2w)
            image = image + sky_img * (1.0 - res.rend_alpha)[..., None]
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
        sem_loss = jnp.float32(0.0)
        if semantics:
            from ..train.step import semantic_ce_loss
            from ..utils.semantics import CONCERNED_IND as _CI2
            sky_prior = jax.nn.one_hot(_CI2["sky"], 6, dtype=jnp.float32)
            probs = res.extra + sky_prior * (1.0 - res.rend_alpha)[..., None]
            sem_loss = semantic_ce_loss(probs, gt_sem_slab)
            loss = loss + opt.semantic_loss_ratio * sem_loss
            if class_dist:
                loss = loss + opt.lambda_dist * jnp.sum(
                    jnp.mean(res.class_dist, axis=(0, 1)))
        # per-slab stats that reduce EXACTLY over the mesh (equal slabs):
        # mse/l1 are means, overflow is an any(); ssim is the documented
        # per-slab approximation (module docstring). psnr is derived from
        # the pmean'd mse outside the per-device body.
        stats = dict(
            l1=ll1, ssim=lssim, semantic=sem_loss,
            mse=jnp.mean((jnp.clip(image, 0.0, 1.0) - gt_slab) ** 2),
            overflow=jnp.asarray(res.overflow).astype(jnp.float32),
            demand=(jnp.asarray(res.demand).astype(jnp.float32)
                    if res.demand is not None else jnp.float32(0.0)))
        return loss, (image, res.radii, stats)

    def bin_local(params, aux_state, w2c_b, k_b):
        """Per-device phase-1: slab binning for each local camera.

        Returns a StreamBinning pytree with leading [1(tile), B_local]
        axes so the out_spec P('tile', 'data') reassembles the global
        [n_tile, B, ...] arrays (each (data, tile) device bins its OWN
        slab crop — the content varies along both mesh axes).

        With ``shard_preprocess`` the per-surfel binning inputs
        (center2d/ext/depth/valid/cull) are computed for a SHARD of
        surfels per tile device with the FULL camera, all-gathered
        along 'tile', and slab-shifted — only the depth argsort and
        the per-duplicate stream stay per-slab (VERDICT r3 #3)."""
        from ..renderer import bin_camera
        row0 = jax.lax.axis_index("tile") * slab
        state = dataclasses.replace(aux_state, params=params)
        cap = slab_capacity(params.xyz.shape[0])

        if _use_shard_pre(params.xyz.shape[0]):
            sl = _tile_shard
            params_s = jax.tree.map(sl, params)
            state_s = dataclasses.replace(aux_state, params=params_s,
                                          alive=sl(aux_state.alive))
            st_full = RasterizeSettings(width=width, height=height,
                                        znear=0.2, zfar=100.0)

            def one_cam(w2c, K):
                inputs_s = bin_inputs_for_camera(
                    params_s.xyz, state_s.get_scaling(),
                    state_s.get_rotation(), state_s.get_opacity()[:, 0],
                    w2c, K, st_full)
                inputs = jax.tree.map(
                    lambda l: jax.lax.all_gather(l, "tile", axis=0,
                                                 tiled=True), inputs_s)
                return bin_slab_from_inputs(inputs, row0, width, slab,
                                            cap, interpret=interpret)
        else:
            def one_cam(w2c, K):
                Kslab = K.at[1, 2].add(-row0.astype(jnp.float32))
                cam = Camera(w2c=w2c, K=Kslab, width=width, height=slab)
                return bin_camera(cam, state, interpret=interpret,
                                  duplicate_capacity=cap)

        b = jax.vmap(one_cam)(w2c_b, k_b)
        return jax.tree.map(lambda l: l[None], b)

    def sharded_grads(params, aux_state, w2c_b, k_b, gt_b, gt_sem_b, bg,
                      iteration, sky_p=None, binning=None):
        """Runs per-device: local camera batch × local slab."""
        row0 = jax.lax.axis_index("tile") * slab
        zeros2d = jnp.zeros((params.xyz.shape[0], 2))
        argnums = (0, 9, 10) if sky else (0, 9)

        def one_cam(w2c, K, gt_slab, gt_sem_slab, bn=None):
            (loss, aux), grads = jax.value_and_grad(
                local_loss, argnums=argnums, has_aux=True)(
                params, aux_state, w2c, K, gt_slab, gt_sem_slab, bg,
                iteration, row0, zeros2d, sky_p, bn)
            return loss, grads, aux

        if gt_sem_b is None:
            gt_sem_b = jnp.zeros(gt_b.shape[:3], jnp.int32)
        if binning is None:
            loss, grads, (img, radii, stats) = jax.vmap(one_cam)(
                w2c_b, k_b, gt_b, gt_sem_b)
        else:
            bsq = jax.tree.map(lambda l: l[0], binning)  # drop tile axis
            loss, grads, (img, radii, stats) = jax.vmap(one_cam)(
                w2c_b, k_b, gt_b, gt_sem_b, bsq)
        nb = w2c_b.shape[0]
        loss = jax.lax.pmean(jnp.mean(loss), ("data", "tile"))
        sum_b = lambda g: jnp.sum(g, axis=0) / nb
        grads = jax.tree.map(sum_b, grads)
        grads = jax.lax.pmean(grads, ("data", "tile"))
        pg, sg = grads[0], grads[1]
        skg = grads[2] if sky else None
        vis = jax.lax.pmax(jnp.max(jnp.where(radii > 0, radii, 0.0), axis=0),
                           ("data", "tile"))
        # batch-mean then mesh-mean (== global means over equal slabs);
        # overflow is a max (any slab of any camera overflowed its
        # slab-local duplicate capacity — the visible failure mode of the
        # 2x/n_tile heuristic above); demand is the max PER-SLAB demand
        # over the mesh (what an overflow-free slab capacity must cover —
        # drives the loop's auto-bump)
        dem = jax.lax.pmax(jnp.max(stats.pop("demand")), ("data", "tile"))
        stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats)
        ovf = jax.lax.pmax(stats.pop("overflow"), ("data", "tile"))
        stats = jax.lax.pmean(stats, ("data", "tile"))
        stats["overflow"] = ovf > 0.0
        stats["demand"] = dem.astype(jnp.int32)
        stats["psnr"] = 20.0 * jnp.log10(
            1.0 / jnp.sqrt(jnp.maximum(stats.pop("mse"), 1e-12)))
        return loss, pg, sg, vis, skg, stats

    @jax.jit
    def bin_phase(state: SurfelState, w2c_b, k_b):
        fn = shard_map(
            bin_local, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P("tile", "data"),
            check_vma=False,
        )
        return fn(state.params, state, w2c_b, k_b)

    @functools.partial(jax.jit, static_argnames=())
    def step(state: SurfelState, opt_state: AdamState, w2c_b, k_b, gt_b,
             bg, iteration, gt_sem_b=None, sky_params=None,
             sky_opt_state=None, binning=None):
        fn = shard_map(
            sharded_grads,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"),
                      P("data", "tile", None, None),
                      P() if gt_sem_b is None else P("data", "tile", None),
                      P(), P(), P(),
                      P() if binning is None else P("tile", "data")),
            out_specs=(P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        loss, pgrads, sgrads, radii, skg, stats = fn(
            state.params, state, w2c_b, k_b, gt_b, gt_sem_b, bg, iteration,
            sky_params, binning)

        lrs = make_lrs(opt, iteration, state.spatial_scale)
        new_params, opt_state = adam_update(pgrads, opt_state, state.params,
                                            lrs)
        state = dataclasses.replace(state, params=new_params)
        if sky:
            sky_lrs = jax.tree.map(lambda _: jnp.float32(sky_lr),
                                   sky_params)
            sky_params, sky_opt_state = adam_update(
                skg, sky_opt_state, sky_params, sky_lrs, eps=1e-8)
        visible = (radii > 0) & (iteration < opt.densify_until_iter)
        state = add_densification_stats(state, sgrads, radii, visible)
        metrics = dict(loss=loss, n_alive=state.num_alive, **stats)
        if sky:
            return (state, opt_state, sky_params, sky_opt_state, metrics)
        return state, opt_state, metrics

    def bin_local_zero(params_shard, aux_state, w2c_b, k_b):
        """ZeRO phase-1: gather ONLY the geometry leaves binning reads
        (xyz/scaling/rotation/opacity — not the dominant SH features),
        then bin the slab."""
        gather = lambda leaf: jax.lax.all_gather(leaf, "data", axis=0,
                                                 tiled=True)
        params = dataclasses.replace(
            params_shard, xyz=gather(params_shard.xyz),
            scaling=gather(params_shard.scaling),
            rotation=gather(params_shard.rotation),
            opacity=gather(params_shard.opacity))
        return bin_local(params, aux_state, w2c_b, k_b)

    def zero_sharded(params_shard, mu_shard, nu_shard, aux_state,
                     w2c_b, k_b, gt_b, gt_sem_b, bg, iteration, step_count,
                     sky_p, binning=None):
        """Per-device body with surfel-sharded parameters/moments."""
        gather = lambda leaf: jax.lax.all_gather(leaf, "data", axis=0,
                                                 tiled=True)
        params = jax.tree.map(gather, params_shard)
        loss, pgrads, sgrads, radii, skg, stats = sharded_grads(
            params, aux_state, w2c_b, k_b, gt_b, gt_sem_b, bg, iteration,
            sky_p, binning)
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
                shard_of(sgrads), shard_of(radii), skg, stats)

    @jax.jit
    def bin_phase_zero(state: SurfelState, w2c_b, k_b):
        fn = shard_map(
            bin_local_zero, mesh=mesh,
            in_specs=(P("data"), P(), P("data"), P("data")),
            out_specs=P("tile", "data"),
            check_vma=False,
        )
        aux = dataclasses.replace(
            state, params=jax.tree.map(lambda l: l[:0], state.params))
        return fn(state.params, aux, w2c_b, k_b)

    @functools.partial(jax.jit, static_argnames=())
    def step_zero(state: SurfelState, opt_state: AdamState, w2c_b, k_b,
                  gt_b, bg, iteration, gt_sem_b=None, sky_params=None,
                  sky_opt_state=None, binning=None):
        """state.params / opt moments / densify stats enter SHARDED along
        the surfel axis (place them with surfel_sharding(mesh)).

        ``sky``: the sky pytree is tiny, so it stays replicated — its
        pmean'd gradients come back from the sharded body like the surfel
        grads and Adam applies on the replicated copy (BASELINE config 5
        runs the full pipeline incl. the env-map sky)."""
        fn = shard_map(
            zero_sharded,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P("data"),
                      P("data"), P("data", "tile", None, None),
                      P() if gt_sem_b is None else P("data", "tile", None),
                      P(), P(), P(), P(),
                      P() if binning is None else P("tile", "data")),
            out_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                       P("data"), P(), P()),
            check_vma=False,
        )
        # aux_state carries the non-parameter arrays replicated (semantics/
        # alive are cheap int/bool masks; the heavy f32 state is sharded).
        # Its params leaves are never read — pass empty slices so the
        # sharded parameter arrays aren't re-gathered under the P() spec.
        aux = dataclasses.replace(
            state, params=jax.tree.map(lambda l: l[:0], state.params))
        loss, new_params, mu, nu, sgrads, radii, skg, stats = fn(
            state.params, opt_state.mu, opt_state.nu, aux, w2c_b, k_b,
            gt_b, gt_sem_b, bg, iteration, opt_state.step, sky_params,
            binning)
        opt_state = AdamState(step=opt_state.step + 1, mu=mu, nu=nu)
        state = dataclasses.replace(state, params=new_params)
        visible = (radii > 0) & (iteration < opt.densify_until_iter)
        state = add_densification_stats(state, sgrads, radii, visible)
        metrics = dict(loss=loss, n_alive=state.num_alive, **stats)
        if sky:
            sky_lrs = jax.tree.map(lambda _: jnp.float32(sky_lr),
                                   sky_params)
            sky_params, sky_opt_state = adam_update(
                skg, sky_opt_state, sky_params, sky_lrs, eps=1e-8)
            return (state, opt_state, sky_params, sky_opt_state, metrics)
        return state, opt_state, metrics

    inner = step_zero if shard_surfels else step
    if not two_phase:
        return inner
    binner = bin_phase_zero if shard_surfels else bin_phase

    def step_two_phase(state, opt_state, w2c_b, k_b, gt_b, bg, iteration,
                       gt_sem_b=None, sky_params=None, sky_opt_state=None):
        """Same one-call signature; chains the two executables host-side
        (dispatch is async — the bin output never leaves the devices)."""
        binning = binner(state, w2c_b, k_b)
        return inner(state, opt_state, w2c_b, k_b, gt_b, bg, iteration,
                     gt_sem_b, sky_params, sky_opt_state, binning)

    return step_two_phase
