"""Training driver.

One jit-compiled train step covers forward, all six losses, Adam, and the
lr schedule (reference spreads this across train.py:244-385 with a Python
chunk loop and host-side optimizer).  Host work per iteration is just the
ray-id draw and a sharded device_put of the (batch, 6+3) arrays; everything
else runs on device.  On a multi-chip mesh the batch is sharded over
``data`` and XLA inserts the gradient psum.

Dynamic loss weights (the per-step TV/entropy decay, the depth lambda
schedule) are closed-form functions of the iteration index and are
evaluated *inside* the compiled step from a device-resident step counter;
the RNG key likewise advances on device.  A fused chunk of ``steps_per_call``
optimizer steps is therefore exactly ONE launch RPC with zero host->device
transfers — on this host (1 CPU core behind a device tunnel) that makes
training throughput immune to concurrent host load.  Schedule *phase
changes* (resampling warmup end, TV cutoff, entropy start, the L1 switch
after the first alpha-mask update) rebuild the step function — a handful
of retraces per run.
"""
from __future__ import annotations

import datetime
import json
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..coords import coords_from_spec, make_coordinates
from ..data.datasets import dataset_dict
from ..data.samplers import SimpleSampler, ThetaImportanceSampler
from ..models import build_model, model_meta
from ..ops.volrend import ray_entropy
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import (DATA_AXIS, batch_sharding, is_lead_process,
                             make_mesh, put_batch_sharded, put_replicated,
                             replicate_tree, replicated)
from ..render.renderer import Renderer, evaluation
from .checkpoint import latest_checkpoint, restore_params, save_checkpoint
from .config import Config, export_config
from .optim import fast_forward_schedule, make_optimizer

# steady-state iterations the profiler hook traces; tools/profile_step.py
# divides its per-op totals by this — keep them in sync via this constant
PROFILE_TRACE_ITERS = 24


class MetricsLogger:
    """JSONL scalar log + optional TensorBoard (torch SummaryWriter when
    available) — covers the reference's SummaryWriter usage
    (reference: train.py:111,320-321).  ``enabled=False`` (non-lead pod
    processes) turns every call into a no-op so only one process writes."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        self._f = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        if self._f is not None:
            self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=step)

    def flush(self):
        if self._f is not None:
            self._f.flush()
        if self._tb is not None:
            self._tb.flush()


def initial_l1_weight(cfg, start_step: int) -> float:
    """L1 weight at ``start_step``: the initial->rest switch fires at the
    FIRST alpha-mask update (reference: train.py:211,367), so a resumed
    run past that point must start on the rest weight — the same class of
    realignment as the voxel schedule's (a naive resume would keep the
    initial weight for the whole remaining run)."""
    lst = cfg.update_AlphaMask_list or []
    return (cfg.L1_weight_rest if lst and start_step > lst[0]
            else cfg.L1_weight_initial)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        if cfg.coarse_sigma_grid_update_rule == "samp":
            raise NotImplementedError(
                "'samp' coarse-grid updates are not implemented (reference "
                "parity: train.py:139-140); the 'conv' rule runs every step "
                "inside the compiled train step")
        np.random.seed(cfg.seed)

        # -- datasets ---------------------------------------------------
        ds_cls = dataset_dict[cfg.dataset_name]
        common = dict(
            data_dir=cfg.datadir,
            near_far=cfg.near_far,
            roi=cfg.roi,
            localization_method=cfg.localization_method,
            use_gt_depth=cfg.use_gt_depth,
        )
        self.train_dataset = ds_cls(split="train", is_stack=False,
                                    downsample=cfg.downsample_train, **common)
        self.test_dataset = ds_cls(split="test", is_stack=True,
                                   downsample=cfg.downsample_test,
                                   skip=cfg.test_skip, **common)
        if cfg.use_depth and self.train_dataset.all_depths is None:
            # fail loudly: the device path would otherwise read the zero
            # padding as depths (silent no-op supervision) and the host
            # path would IndexError inside jit tracing
            raise ValueError(f"use_depth=True but dataset "
                             f"'{cfg.dataset_name}' provides no depths")
        self.near_far = self.train_dataset.near_far
        self.white_bg = self.train_dataset.white_bg
        aabb = self.train_dataset.scene_bbox

        # -- logdir (file IO is lead-process-only on a pod) --------------
        self.lead = is_lead_process()
        stamp = datetime.datetime.now().strftime("-%Y%m%d-%H%M%S") if cfg.add_timestamp else ""
        self.logdir = os.path.join(cfg.basedir, cfg.expname + stamp)
        if self.lead:
            os.makedirs(os.path.join(self.logdir, "imgs_vis"), exist_ok=True)
            export_config(cfg, self.logdir)
        self.log = MetricsLogger(self.logdir, enabled=self.lead)

        # -- mesh -------------------------------------------------------
        n_dev = cfg.mesh_shape[0] if cfg.mesh_shape else None
        self.mesh = make_mesh(n_dev)
        # TPU_FORCE_SHARDED=1 routes a 1-device mesh through the full
        # sharded machinery (explicit shardings, constraint, replication)
        # so the mesh tax can be measured where hardware exists to measure
        # it (BASELINE.md "single-chip mesh tax"); shardings are trivial on
        # one device so numerics are identical by construction
        self.multi_device = (self.mesh.devices.size > 1
                             or os.environ.get("TPU_FORCE_SHARDED") == "1")

        # -- coordinates + model ---------------------------------------
        self.start_step = 0
        ckpt_path = cfg.ckpt or latest_checkpoint(self.logdir)
        if ckpt_path:
            # auto-resume from the newest checkpoint (reference: train.py:149-160)
            print(f"resuming from {ckpt_path}")
            from .checkpoint import load_checkpoint, unflatten_params

            flat, header, masks = load_checkpoint(ckpt_path)
            self.coords = coords_from_spec(header["coords_spec"])
            reso = self.coords.resolution
            self.model = build_model(cfg, aabb, reso, self.coords, self.near_far,
                                     meta=header.get("model_meta"))
            template = self.model.init_params(jax.random.PRNGKey(cfg.seed))
            self.params = unflatten_params(template, flat)
            self.restore_alpha_mask(self.model, masks)
            self.start_step = int(header["global_step"])
        else:
            self.coords = make_coordinates(
                cfg.coordinates_name, aabb, exp_r=cfg.exp_sampling,
                N_voxel=cfg.N_voxel_init, r0=cfg.r0, interval_th=cfg.interval_th)
            reso = (self.coords.resolution if self.coords.resolution is not None
                    else self.coords.N_to_reso(cfg.N_voxel_init))
            if self.coords.resolution is None:
                self.coords.set_resolution(reso)
            self.model = build_model(cfg, aabb, reso, self.coords, self.near_far)
            self.params = self.model.init_params(jax.random.PRNGKey(cfg.seed))
        self.reso_cur = list(self.coords.resolution)

        if self.multi_device:
            self.params = replicate_tree(self.mesh, self.params)

        # -- optimizer --------------------------------------------------
        # always built at the MAIN-loop envmap lr: pretrain_envmap builds
        # its own pretrain-lr optimizer and rebuilds afterwards, so seeding
        # the pretrain lr here only risked a resumed run (which skips
        # pretraining, and with it the rebuild) training the envmap at the
        # pretrain lr forever
        self.decay_iters = cfg.lr_decay_iters if cfg.lr_decay_iters > 0 else cfg.n_iters
        self._build_optimizer(lr_scale=1.0, lr_envmap=cfg.lr_envmap)
        if self.start_step:
            self.opt_state = fast_forward_schedule(self.opt_state, self.start_step)

        # -- sampler + device-resident training data ---------------------
        self._install_train_data()

        # voxel upsample schedule: log-linear (reference: train.py:189)
        ups = cfg.upsamp_list or []
        self.upsamp_list = [u for u in ups if u < cfg.n_iters]
        n_steps = len(ups) + 1
        self.n_voxel_list = np.round(np.exp(np.linspace(
            np.log(cfg.N_voxel_init), np.log(cfg.N_voxel_final), n_steps))).astype(np.int64).tolist()[1:]
        # keep the voxel schedule aligned when resuming past upsample points
        # (the reference's pop-based schedule silently misaligns here)
        for u in ups:
            if u < self.start_step and self.n_voxel_list:
                self.n_voxel_list.pop(0)

        self.renderer = Renderer.from_config(
            self.model, cfg, self.white_bg,
            mesh=self.mesh if self.multi_device else None)

        self._step_cache = {}
        self.lr_factor = cfg.lr_decay_target_ratio ** (1.0 / self.decay_iters)
        # schedule decay counting restarts at the resume point, matching the
        # reference's process-local mutable TV/entropy weights
        # (reference: train.py:295-310 — not checkpointed there either)
        self._sched_start = self.start_step

    # ------------------------------------------------------------------
    def _build_optimizer(self, lr_scale: float, lr_envmap: Optional[float] = None,
                         decay: bool = True):
        cfg = self.cfg
        # observable record of the group lrs baked into the optax chain
        # (inspection + the resume tests pin the envmap-pretrain handoff)
        self.lr_groups = dict(
            grid=cfg.lr_init * lr_scale, network=cfg.lr_basis * lr_scale,
            envmap=(lr_envmap if lr_envmap is not None else cfg.lr_envmap) * lr_scale,
            decay=decay)
        self.tx = make_optimizer(
            self.params, self.lr_groups["grid"], self.lr_groups["network"],
            self.lr_groups["envmap"],
            decay_target_ratio=cfg.lr_decay_target_ratio if decay else 1.0,
            decay_iters=self.decay_iters)
        self.opt_state = self.tx.init(self.params)
        if self.multi_device:
            self.opt_state = replicate_tree(self.mesh, self.opt_state)
        self._step_cache = {}

    # ------------------------------------------------------------------
    def _make_step(self, *, resampling: bool, tv_on: bool, entropy_on: bool,
                   envmap_pretrain: bool = False, n_steps: int = 1,
                   l1_w: float = 0.0):
        """Build one jitted multi-step for a schedule phase.

        ``n_steps`` consecutive optimizer steps are fused into a single
        dispatch with ``lax.scan``.  The step counter and RNG key live on
        device and advance inside the call; the decaying TV/entropy/depth
        loss weights are closed forms of the iteration index evaluated
        in-jit (reference keeps them as host-side mutable floats,
        train.py:295-310).  One fused chunk is therefore a single launch
        RPC — per-call host/dispatch overhead (substantial through the
        device tunnel, and worse under host CPU contention) amortizes
        across the whole chunk.
        """
        cfg = self.cfg
        model = self.model
        tx = self.tx
        sched_start = int(self._sched_start)
        lr_factor = float(self.lr_factor)

        def dyn_of(it):
            """Loss-schedule weights at (traced) iteration ``it``."""
            dyn = {"l1_w": jnp.float32(l1_w)}
            if tv_on and (cfg.TV_weight_density > 0 or cfg.TV_weight_app > 0):
                # the host loop multiplied tv *= lr_factor once per iteration
                # j in [sched_start, min(it, iter_ignore_TV-1)]
                n_dec = jnp.maximum(
                    jnp.minimum(it, cfg.iter_ignore_TV - 1) - sched_start + 1, 0)
                f = jnp.power(jnp.float32(lr_factor), n_dec.astype(jnp.float32))
                dyn["tv_density_w"] = cfg.TV_weight_density * f
                dyn["tv_app_w"] = cfg.TV_weight_app * f
            if entropy_on and cfg.entropy_weight > 0:
                n_dec = jnp.maximum(
                    it - max(sched_start, cfg.iter_ignore_entropy + 1) + 1, 0)
                dyn["entropy_w"] = cfg.entropy_weight * jnp.power(
                    jnp.float32(lr_factor), n_dec.astype(jnp.float32))
            if cfg.use_depth:
                # reference: depth_lambda * rate^(it // step_size), cut off
                # after depth_end_iter
                w = cfg.depth_lambda * jnp.power(
                    jnp.float32(cfg.depth_rate),
                    (it // cfg.depth_step_size).astype(jnp.float32))
                if cfg.depth_end_iter is not None:
                    w = jnp.where(it > cfg.depth_end_iter, 0.0, w)
                dyn["depth_w"] = w
            return dyn

        def one_step(params, opt_state, row, key, it):
            rays, rgbs = row[:, :6], row[:, 6:9]
            dyn = dyn_of(it)

            def make_loss_fn(keep: int):
                def loss_fn(p):
                    if envmap_pretrain:
                        out = model.forward(p, rays, pretrain_envmap=True)
                        mse = jnp.mean((out["env"] - rgbs) ** 2)
                        return mse, (mse, None)
                    out = model.forward(
                        p, rays, key=key, is_train=True, n_coarse=cfg.n_coarse,
                        n_fine=cfg.n_fine, exp_sampling=cfg.exp_sampling,
                        resampling=resampling, use_coarse_sample=cfg.use_coarse_sample,
                        white_bg=self.white_bg, ndc_ray=bool(cfg.ndc_ray),
                        train_keep=keep, train_cull_tau=cfg.train_cull_tau)
                    mse = jnp.mean((out["rgb"] - rgbs) ** 2)
                    total = mse
                    if cfg.sparsity_lambda > 0:
                        sp = model.sparsity_density(p, key, cfg.N_sparsity_points)
                        loss_sp = 1.0 - jnp.mean(jnp.exp(-cfg.sparsity_length * sp))
                        total = total + cfg.sparsity_lambda * loss_sp
                    if cfg.Ortho_weight > 0:
                        total = total + cfg.Ortho_weight * model.vector_comp_diffs(p)
                    if l1_w > 0:
                        # l1_w is a static per-phase float (the step fn is
                        # rebuilt at the alpha-mask boundary), so zero-L1
                        # configs skip the full abs+mean sweep over every
                        # density plane/line and its VJP entirely
                        total = total + dyn["l1_w"] * model.density_l1(p)
                    if tv_on and cfg.TV_weight_density > 0:
                        total = total + dyn["tv_density_w"] * model.tv_loss_density(p)
                    if tv_on and cfg.TV_weight_app > 0:
                        total = total + dyn["tv_app_w"] * model.tv_loss_app(p)
                    if entropy_on and cfg.entropy_weight > 0:
                        total = total + dyn["entropy_w"] * ray_entropy(out["alpha"])
                    if cfg.use_depth:
                        depth_gt = row[:, 9]
                        mask = (depth_gt != 0).astype(jnp.float32)
                        dloss = jnp.sum(mask * (out["depth"] - depth_gt) ** 2) / (
                            jnp.sum(mask) + 1e-8)
                        total = total + dyn["depth_w"] * dloss
                    return total, (mse, None)
                return loss_fn

            vg_culled = jax.value_and_grad(make_loss_fn(cfg.train_keep),
                                           has_aux=True)
            if (cfg.train_keep and cfg.train_keep_full_every
                    and not envmap_pretrain):
                # hybrid cull: every Mth step runs the reference's full
                # 256-evals/ray forward (train_keep=0) so densities the
                # culled steps never touch — which drift as side effects
                # of the shared VM factorization — get corrective
                # gradient everywhere along every sampled ray.  Both
                # branches compile once; only one executes per step.
                vg_full = jax.value_and_grad(make_loss_fn(0), has_aux=True)
                (loss, (mse, _)), grads = jax.lax.cond(
                    it % cfg.train_keep_full_every == 0,
                    vg_full, vg_culled, params)
            else:
                (loss, (mse, _)), grads = vg_culled(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, mse

        if self.device_data:
            # batches are sampled AND gathered on device from resident
            # buffers: zero training data crosses the host boundary.  Ray
            # ids draw inside the step — uniform with replacement for
            # SimpleSampler (the reference importance sampler is
            # with-replacement too, sampler.py:33-38) or the latitude-
            # weighted inverse-CDF draw for ThetaImportanceSampler; the
            # epoch-permutation host sampler remains available via
            # device_sampling=False.
            n_total = int(self.train_dataset.all_rays.shape[0])
            from ..data.samplers import make_device_id_sampler

            draw_ids = make_device_id_sampler(self.sampler, cfg.batch_size,
                                              n_total)

            batch_sh = (NamedSharding(self.mesh, P(DATA_AXIS, None))
                        if self.multi_device else None)

            def multi_step(params, opt_state, key, step0, train_buf):
                keys = jax.random.split(key, n_steps + 1)
                its = step0 + jnp.arange(n_steps, dtype=jnp.int32)

                def body(carry, xs):
                    p, s = carry
                    k, it = xs
                    k_ids, k_step = jax.random.split(k)
                    ids = draw_ids(k_ids)
                    row = jnp.take(train_buf, ids, axis=0)
                    if batch_sh is not None:
                        # the key/ids are replicated — without this
                        # constraint XLA runs the whole batch on every chip;
                        # sharding the gathered rows splits the step over
                        # the mesh (one gradient psum back to the
                        # replicated params)
                        row = jax.lax.with_sharding_constraint(row, batch_sh)
                    p, s, mse = one_step(p, s, row, k_step, it)
                    return (p, s), mse

                (params, opt_state), mses = jax.lax.scan(
                    body, (params, opt_state), (keys[1:], its))
                return params, opt_state, keys[0], step0 + n_steps, mses

            if self.multi_device:
                rep = replicated(self.mesh)
                return jax.jit(multi_step, donate_argnums=(0, 1),
                               in_shardings=(rep, rep, rep, rep, rep),
                               out_shardings=(rep, rep, rep, rep, rep))
            return jax.jit(multi_step, donate_argnums=(0, 1))

        def multi_step(params, opt_state, batch_k, key, step0):
            keys = jax.random.split(key, n_steps + 1)
            its = step0 + jnp.arange(n_steps, dtype=jnp.int32)

            def body(carry, xs):
                p, s = carry
                row, k, it = xs
                p, s, mse = one_step(p, s, row, k, it)
                return (p, s), mse

            (params, opt_state), mses = jax.lax.scan(
                body, (params, opt_state), (batch_k, keys[1:], its))
            return params, opt_state, keys[0], step0 + n_steps, mses

        if self.multi_device:
            bs = NamedSharding(self.mesh, P(None, DATA_AXIS, None))
            rep = replicated(self.mesh)
            return jax.jit(multi_step, donate_argnums=(0, 1),
                           in_shardings=(rep, rep, bs, rep, rep),
                           out_shardings=(rep, rep, rep, rep, rep))
        return jax.jit(multi_step, donate_argnums=(0, 1))

    def _get_step(self, iteration: int, n_steps: int = 1, envmap_pretrain=False,
                  l1_w: float = 0.0):
        cfg = self.cfg
        phase = (
            envmap_pretrain,
            cfg.resampling and iteration > cfg.iter_ignore_resampling,
            iteration < cfg.iter_ignore_TV,
            iteration > cfg.iter_ignore_entropy,
            n_steps,
            float(l1_w),
        )
        fn = self._step_cache.get(phase)
        if fn is None:
            fn = self._make_step(resampling=phase[1], tv_on=phase[2],
                                 entropy_on=phase[3], envmap_pretrain=phase[0],
                                 n_steps=n_steps, l1_w=float(l1_w))
            self._step_cache[phase] = fn
        return fn

    def _chunk_len(self, iteration: int) -> int:
        """Largest n_steps <= steps_per_call such that no training-state
        event (vis/ckpt/alpha/upsample/phase flip) lands strictly inside
        the fused chunk."""
        cfg = self.cfg
        limit = max(1, int(cfg.steps_per_call))
        events = [cfg.n_iters]
        events += [v - 1 for v in (cfg.vis_list or []) if v - 1 >= iteration]
        if cfg.i_weights > 0:
            nxt = ((iteration // cfg.i_weights) + 1) * cfg.i_weights
            if iteration % cfg.i_weights == 0 and iteration != 0:
                nxt = iteration
            events.append(nxt)
        events += [a for a in (cfg.update_AlphaMask_list or []) if a >= iteration]
        events += [u for u in self.upsamp_list if u >= iteration]
        for flip in (cfg.iter_ignore_resampling + 1, cfg.iter_ignore_TV,
                     cfg.iter_ignore_entropy + 1):
            if flip > iteration:
                events.append(flip - 1)
        first = min(e for e in events if e >= iteration)
        return max(1, min(limit, first - iteration + 1, cfg.n_iters - iteration))

    # ------------------------------------------------------------------
    def _gather_batches(self, n_steps: int):
        """Draw n_steps ray batches.  With device-resident buffers nothing
        crosses the host boundary (ids are drawn inside the step);
        otherwise ONE packed (n_steps, batch, 9|10) host batch is put
        (rays | rgbs | optional depth)."""
        if self.device_data:
            return None
        ids = np.stack([self.sampler.nextids() for _ in range(n_steps)]).astype(np.int32)
        cols = [self.train_dataset.all_rays[ids], self.train_dataset.all_rgbs[ids]]
        if self.cfg.use_depth and self.train_dataset.all_depths is not None:
            cols.append(self.train_dataset.all_depths[ids].reshape(
                n_steps, -1, 1))
        batch = np.concatenate(cols, axis=-1).astype(np.float32)
        if self.multi_device:
            # pod note: the host sampler is seed-identical on every
            # process, so each process materializes the same global batch
            # and contributes the shards it owns
            return put_batch_sharded(self.mesh, batch, P(None, DATA_AXIS, None))
        return jnp.asarray(batch)

    def _install_train_data(self) -> None:
        """(Re)build the sampler + device-resident buffer for the CURRENT
        ``self.train_dataset`` — ONE definition shared by ``__init__`` and
        :meth:`set_datasets`, so the device-vs-host data decision (sized
        against the buffer actually being installed) can never go stale."""
        cfg = self.cfg
        n_rays_total = self.train_dataset.all_rays.shape[0]
        if cfg.sampling_method == "simple":
            self.sampler = SimpleSampler(n_rays_total, cfg.batch_size, seed=cfg.seed)
        elif cfg.sampling_method == "theta_importance":
            # img_wh_origin = full pre-crop dims where the dataset crops by
            # roi (Ricoh/OmniScenes); everywhere else img_wh IS the full
            # size.  The sampler derives the cropped raster + image count
            # itself (see its docstring for the reference's latent bug here)
            full_wh = getattr(self.train_dataset, "img_wh_origin",
                              self.train_dataset.img_wh)
            self.sampler = ThetaImportanceSampler(
                cfg.theta_importance_lambda, n_rays_total, full_wh,
                cfg.batch_size, self.train_dataset.roi, seed=cfg.seed)
        else:
            raise ValueError(f"sampling method {cfg.sampling_method} not supported")

        # optional host-side ray pruning (reference: models/tensorBase.py:381-413)
        if cfg.filter_ray and hasattr(self.model, "filtering_rays"):
            kept = self.model.filtering_rays(
                self.params, self.train_dataset.all_rays,
                self.train_dataset.all_rgbs, bbox_only=True)
            self.train_dataset.all_rays, self.train_dataset.all_rgbs = kept[:2]
            n_rays_total = self.train_dataset.all_rays.shape[0]
            if cfg.sampling_method == "simple":
                self.sampler = SimpleSampler(n_rays_total, cfg.batch_size, seed=cfg.seed)

        # device-resident training data: host->device transfer is expensive
        # (and brutal through a device tunnel), so the flat ray/rgb/depth
        # buffers live on-device and each chunk ships only (n_steps, batch)
        # int32 ids; batches gather inside the compiled step.  Falls back to
        # host gathers for huge datasets.
        n_rays_buf = self.train_dataset.all_rays.shape[0]
        # rows padded to 32 f32 (128 B): TPU gathers of sub-128-byte rows
        # take a ~20x slower path (see ops/vm_lookup.py's cost model)
        buf_bytes = n_rays_buf * 32 * 4
        # theta_importance keeps the zero-host-bytes path too (in-step
        # inverse-CDF row draw) — unless filter_ray compacted the buffer,
        # which breaks its flat (img, row, col) index layout
        self.device_data = (buf_bytes < 6 * 2**30 and cfg.device_sampling
                            and (cfg.sampling_method == "simple"
                                 or (cfg.sampling_method == "theta_importance"
                                     and not cfg.filter_ray)))
        self._train_buf = None  # a huge swapped-in dataset frees the old buffer
        if self.device_data:
            cols = [self.train_dataset.all_rays, self.train_dataset.all_rgbs]
            if cfg.use_depth and self.train_dataset.all_depths is not None:
                cols.append(self.train_dataset.all_depths.reshape(-1, 1))
            packed = np.concatenate(cols, axis=1).astype(np.float32)
            packed = np.pad(packed, ((0, 0), (0, 32 - packed.shape[1])))
            self._train_buf = (put_replicated(self.mesh, packed)
                               if self.multi_device else jax.device_put(packed))

    def set_datasets(self, train_dataset, test_dataset) -> None:
        """Swap datasets after construction (e.g. programmatic experiments):
        rebuilds the sampler, device-resident buffers and compiled steps
        through the same install path as ``__init__`` (including filter_ray
        and the device-vs-host buffer decision).  Scene geometry taken at
        construction (aabb / near_far / white_bg and the model built from
        them) intentionally stays — swap datasets of the same scene setup."""
        cfg = self.cfg
        if cfg.use_depth and train_dataset.all_depths is None:
            raise ValueError(f"use_depth=True but dataset "
                             f"'{cfg.dataset_name}' provides no depths")
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self._install_train_data()
        self._step_cache = {}
        self.renderer._jitted = {}

    def _run_step(self, step_fn, batch, key, step0):
        """Invoke the compiled multi-step; returns the updated
        (params, opt_state, key, step counter, per-step mses)."""
        if self.device_data:
            return step_fn(self.params, self.opt_state, key, step0, self._train_buf)
        return step_fn(self.params, self.opt_state, batch, key, step0)

    def _yield_check(self) -> bool:
        """True when this process holds the chip flock and a lock waiter has
        freshly requested a yield (tools.request_tpu_yield — touched by
        ``acquire_tpu_lock``'s poll loop).  Yielding is opt-in via
        ``$TPU_YIELDABLE=1`` — set by ``tools.require_tpu_relay`` so every
        long experiment driver yields, while bench.py (a short capture that
        must never be interrupted) and plain CLI runs do not.  Only ever
        true on the real TPU; CPU tests never yield."""
        if os.environ.get("TPU_YIELDABLE", "") != "1":
            return False
        if os.environ.get("JAX_PLATFORMS", "") != "axon":
            return False
        if jax.process_count() > 1:
            # the flock is per-host: in a multi-process pod only one
            # process could ever see the request, and its solo exit would
            # wedge the peers in the next collective — pod runs need a
            # collectively-agreed stop, so they simply don't yield
            return False
        from ..tools import holds_tpu_lock, tpu_yield_requested

        return holds_tpu_lock() and tpu_yield_requested()

    def _stop_profile_trace(self, traced_steps: int):
        jax.profiler.stop_trace()
        # chunking rounds the trace window to whole fused chunks — record
        # the ACTUAL traced step count for tools/profile_step.summarize
        with open(os.path.join(self.cfg.profile_dir, "traced_steps.json"),
                  "w") as f:
            json.dump({"steps": int(traced_steps)}, f)
        print(f"profiler trace written to {self.cfg.profile_dir}")

    def _device_counters(self, start: int, key):
        """Device-resident step counter + RNG key (replicated on a mesh)."""
        step0 = np.int32(start)
        if self.multi_device:
            rep = replicated(self.mesh)
            return jax.device_put(step0, rep), jax.device_put(key, rep)
        return jax.device_put(step0), key

    # ------------------------------------------------------------------
    def pretrain_envmap(self):
        """Fit the envmap alone to the training images before volume
        training (reference: train.py:218-242)."""
        cfg = self.cfg
        if not (cfg.use_envmap and cfg.iter_pretrain_envmap > 0):
            return
        if self.start_step > 0:
            # resumed runs skip pretraining (the reference would redo it and
            # perturb the restored envmap — reference: train.py:218-242)
            return
        print(f"pretraining envmap for {cfg.iter_pretrain_envmap} iters")
        # the reference's pretrain loop never touches the lrs
        # (train.py:222-233, no per-iter decay) — hold them CONSTANT here;
        # measured: decaying through pretrain lands the envmap at mse
        # 0.0279 vs the reference's 0.0209 and costs ~1 dB downstream
        self._build_optimizer(lr_scale=1.0, lr_envmap=cfg.lr_envmap_pretrain,
                              decay=False)
        step0, key = self._device_counters(0, jax.random.PRNGKey(cfg.seed + 1))
        it = 0
        while it < cfg.iter_pretrain_envmap:
            k_steps = min(max(1, cfg.steps_per_call), cfg.iter_pretrain_envmap - it)
            step_fn = self._get_step(0, n_steps=k_steps, envmap_pretrain=True)
            batch = self._gather_batches(k_steps)
            self.params, self.opt_state, key, step0, mses = self._run_step(
                step_fn, batch, key, step0)
            it += k_steps
            if it % 200 < k_steps:
                print(f"  envmap pretrain {it}: mse {float(mses[-1]):.5f}")
        evaluation(self.test_dataset, self.model, self.params, self.renderer,
                   save_path=(os.path.join(self.logdir, "imgs_vis")
                              if self.lead else None),
                   envmap_only=True)
        # reset optimizer with the post-pretrain envmap lr (reference: train.py:241-242)
        self._build_optimizer(lr_scale=1.0, lr_envmap=cfg.lr_envmap)

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        self.pretrain_envmap()

        vis_list = set(cfg.vis_list or [])
        update_alpha_list = cfg.update_AlphaMask_list or []
        l1_w = initial_l1_weight(cfg, self.start_step)
        step0, key = self._device_counters(self.start_step,
                                           jax.random.PRNGKey(cfg.seed + 2))
        psnrs, psnrs_test = [], [0.0]
        t_start, rays_done = time.time(), 0

        profile_state = 0  # 0=idle, 1=tracing, 2=done
        iteration = self.start_step
        while iteration < cfg.n_iters:
            # profiler hook: trace a few steady-state chunks
            # (reference has only wall-clock prints, renderer.py:68,75)
            if cfg.profile_dir and profile_state == 0 and iteration >= self.start_step + 16:
                jax.profiler.start_trace(cfg.profile_dir)
                profile_state, profile_end = 1, iteration + PROFILE_TRACE_ITERS
                profile_start_it = iteration
            elif cfg.profile_dir and profile_state == 1 and iteration >= profile_end:
                profile_state = 2
                self._stop_profile_trace(iteration - profile_start_it)

            k_steps = self._chunk_len(iteration)
            iters = list(range(iteration, iteration + k_steps))
            batch = self._gather_batches(k_steps)
            step_fn = self._get_step(iteration, n_steps=k_steps, l1_w=l1_w)
            self.params, self.opt_state, key, step0, mses = self._run_step(
                step_fn, batch, key, step0)

            rays_done += cfg.batch_size * k_steps
            log_offsets = [i for i, it in enumerate(iters)
                           if it % cfg.progress_refresh_rate == 0]
            if log_offsets:
                mses_np = np.asarray(mses)
                for i in log_offsets:
                    mse_v = float(mses_np[i])
                    psnr = -10.0 * np.log(max(mse_v, 1e-12)) / np.log(10.0)
                    psnrs.append(psnr)
                    self.log.scalar("train/PSNR", psnr, iters[i])
                    self.log.scalar("train/mse", mse_v, iters[i])
                elapsed = time.time() - t_start
                print(f"iter {iters[log_offsets[-1]]:06d} psnr {np.mean(psnrs):.2f} "
                      f"test {np.mean(psnrs_test):.2f} mse {mse_v:.6f} "
                      f"rays/s {rays_done / max(elapsed, 1e-9):,.0f}")
                psnrs = []

            iteration = iters[-1]  # events below key off the chunk's last step

            # Cooperative chip yield (VERDICT r4 #1b): when this process
            # holds the TPU flock and a preempting waiter (the driver's
            # bench capture) has touched the yield file, checkpoint and
            # exit resumable instead of holding the chip for hours.  The
            # check costs one getmtime per fused chunk (~6 s at production
            # shape) and runs BEFORE this iteration's vis/save/alpha/
            # upsample events so the checkpoint has the same pre-event
            # state as a periodic i_weights save — on --resume the
            # constructor's schedule realignment re-fires those events
            # exactly once, and a pending request skips a long vis eval
            # rather than running it first.
            if self._yield_check():
                if cfg.profile_dir and profile_state == 1:
                    # close an active trace window before exiting so the
                    # profile capture (minutes of TPU time) isn't abandoned
                    # mid-trace, and the checkpoint write stays outside it.
                    # `iteration` is the last traced step INDEX here (the
                    # +1 to the next step happens at the loop bottom), so
                    # the traced count is inclusive
                    profile_state = 2
                    self._stop_profile_trace(iteration - profile_start_it + 1)
                self.save(os.path.join(
                    self.logdir, f"{cfg.expname}_{iteration:06d}.npz"), iteration)
                self.log.flush()
                print(f"TPU yield requested — checkpointed at iter {iteration}; "
                      f"resume with --resume (same semantics as a periodic "
                      f"checkpoint restart)", flush=True)
                raise SystemExit(3)

            if (iteration + 1) in vis_list and cfg.N_vis != 0:
                psnrs_test = evaluation(
                    self.test_dataset, self.model, self.params, self.renderer,
                    save_path=(os.path.join(self.logdir, "imgs_vis")
                               if self.lead else None),
                    prefix=f"{iteration:06d}_", n_vis=cfg.N_vis,
                    compute_extra_metrics=False)
                if psnrs_test:
                    self.log.scalar("test/psnr", float(np.mean(psnrs_test)), iteration)
                t_start, rays_done = time.time(), 0

            if cfg.i_weights > 0 and iteration % cfg.i_weights == 0 and iteration != 0:
                self.save(os.path.join(self.logdir, f"{cfg.expname}_{iteration:06d}.npz"),
                          iteration)

            if update_alpha_list and iteration in update_alpha_list:
                if hasattr(self.model, "update_alpha_mask"):
                    reso_mask = [min(r, 128) for r in self.reso_cur]
                    self.model.update_alpha_mask(self.params, reso_mask)
                    # the mask is a trace-time constant of the compiled
                    # step/render programs — drop the stale traces
                    self._step_cache = {}
                    self.renderer._jitted = {}
                if iteration == update_alpha_list[0]:
                    l1_w = cfg.L1_weight_rest

            if iteration in self.upsamp_list:
                self._upsample(iteration)

            iteration += 1

        if cfg.profile_dir and profile_state == 1:
            # run ended mid-window (large chunks / short schedules) —
            # flush what was captured instead of dropping the trace
            self._stop_profile_trace(iteration - profile_start_it)

        self.save(os.path.join(self.logdir, f"{cfg.expname}.npz"), cfg.n_iters)
        self.log.flush()

        if cfg.render_train:
            # re-render the training views (reference: train.py:389-396)
            out_dir = os.path.join(self.logdir, "imgs_train_all")
            train_stacked = type(self.train_dataset)(
                data_dir=cfg.datadir, split="train", is_stack=True,
                downsample=cfg.downsample_train, near_far=cfg.near_far,
                roi=cfg.roi, localization_method=cfg.localization_method)
            psnrs_train = evaluation(train_stacked, self.model, self.params,
                                     self.renderer, save_path=out_dir, n_vis=-1,
                                     compute_extra_metrics=False)
            print(f"======> {cfg.expname} train all psnr: {np.mean(psnrs_train)} <====")

        if cfg.render_path and hasattr(self.test_dataset, "render_path"):
            # novel spiral trajectory + video (reference: renderer.py:199-255)
            from ..render.renderer import evaluation_path

            out_dir = os.path.join(self.logdir, "imgs_path_all")
            evaluation_path(self.test_dataset, self.model, self.params,
                            self.test_dataset.render_path, self.renderer,
                            save_path=out_dir)

        if cfg.export_mesh:
            from ..render.export import export_density_mesh

            export_density_mesh(self.model, self.params,
                                os.path.join(self.logdir, f"{cfg.expname}.ply"))

        if cfg.render_test:
            out_dir = os.path.join(self.logdir, "imgs_test_all")
            psnrs_test = evaluation(self.test_dataset, self.model, self.params,
                                    self.renderer, save_path=out_dir, n_vis=-1)
            print(f"======> {cfg.expname} test all psnr: {np.mean(psnrs_test)} <====")
            return psnrs_test
        return psnrs_test

    # ------------------------------------------------------------------
    def _upsample(self, iteration: int):
        """Grid upsample schedule: resample params onto a larger grid,
        reset coords resolution + optimizer (reference: train.py:371-385)."""
        cfg = self.cfg
        n_voxels = self.n_voxel_list.pop(0)
        reso = self.coords.N_to_reso(n_voxels)
        print(f"upsampling grid to {reso} at iter {iteration}")
        self.params = self.model.upsample_params(self.params, reso)
        self.coords.set_resolution(reso)
        self.model.update_step_size(reso)
        self.reso_cur = list(reso)
        if self.multi_device:
            self.params = replicate_tree(self.mesh, self.params)
        lr_scale = (1.0 if cfg.lr_upsample_reset
                    else cfg.lr_decay_target_ratio ** (iteration / cfg.n_iters))
        self._build_optimizer(lr_scale=lr_scale)
        self.renderer._jitted = {}

    # ------------------------------------------------------------------
    def save(self, path: str, global_step: int):
        if not self.lead:
            return  # pod: one writer (params are replicated; shared FS)
        masks = None
        mask = getattr(self.model, "alpha_mask", None)
        if mask is not None:
            vols = np.asarray(mask.volume)[..., 0]  # (S, D, H, W)
            masks = {f"alpha_{i}": vols[i] > 0 for i in range(vols.shape[0])}
        save_checkpoint(
            path, jax.device_get(self.params), global_step=global_step,
            coords_spec=self.coords.to_spec(),
            model_meta=model_meta(self.cfg, self.model),
            alpha_masks=masks)
        print(f"saved checkpoint {path}")

    @staticmethod
    def restore_alpha_mask(model, masks: dict) -> None:
        """Reinstall bit-packed occupancy volumes from a checkpoint
        (reference: models/EgoNeRF.py:174-180)."""
        if not masks:
            return
        from ..models.alphamask import AlphaGridMask, YinYangAlphaGridMask

        vols = [masks[k].astype(np.float32) for k in sorted(masks)]
        if len(vols) == 2:
            model.alpha_mask = YinYangAlphaGridMask(vols[0], vols[1])
        else:
            model.alpha_mask = AlphaGridMask(vols[0])


def render_test(cfg: Config):
    """Evaluation entry: restore the newest/explicit checkpoint and run the
    full test set (reference: train.py:23-69)."""
    if cfg.metric_only:
        raise NotImplementedError(
            "metric_only re-scoring of existing renders is not implemented "
            "(reference parity: train.py:25-26)")
    ds_cls = dataset_dict[cfg.dataset_name]
    test_dataset = ds_cls(
        data_dir=cfg.datadir, split="test", is_stack=True, downsample=1,
        near_far=cfg.near_far, roi=cfg.roi,
        localization_method=cfg.localization_method, skip=1)

    logdir = os.path.join(cfg.basedir, cfg.expname)
    ckpt_path = cfg.ckpt or latest_checkpoint(logdir)
    if not ckpt_path or not os.path.exists(ckpt_path):
        print("the ckpt path does not exist!")
        return None

    from .checkpoint import load_checkpoint, unflatten_params

    flat, header, masks = load_checkpoint(ckpt_path)
    coords = coords_from_spec(header["coords_spec"])
    model = build_model(cfg, test_dataset.scene_bbox, coords.resolution, coords,
                        test_dataset.near_far, meta=header.get("model_meta"))
    template = model.init_params(jax.random.PRNGKey(0))
    params = unflatten_params(template, flat)
    Trainer.restore_alpha_mask(model, masks)

    renderer = Renderer.from_config(model, cfg, test_dataset.white_bg)
    out_dir = os.path.join(logdir, "evaluation")
    return evaluation(test_dataset, model, params, renderer, save_path=out_dir,
                      n_vis=-1, compute_extra_metrics=True)
