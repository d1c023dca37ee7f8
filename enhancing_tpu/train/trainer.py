"""The training loop: GSPMD data-parallel fit with checkpointing and logging.

TPU-native replacement for pl.Trainer (reference: main.py:51-61): a single
process drives jitted train steps over a jax.sharding.Mesh. Batches are
host-loaded, placed with the batch dim sharded on the 'data' axis; XLA inserts
the gradient all-reduces (the DDP/NCCL equivalent, SURVEY §2.9). Checkpoints
go through orbax (every epoch, all kept — reference general.py:49-55);
metrics/image callbacks mirror the reference's Lightning callbacks.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..models.stage1.vitvqgan import ViTVQ, _as_nhwc
from ..models.stage2.transformer import CondTransformer
from ..parallel.mesh import batch_sharding, is_main_process, make_mesh
from ..parallel.sharding import (gpt_param_specs, place_params,
                                 replicated_specs, zero1_specs)
from ..utils.callback import ImageLogger
from .optim import make_ae_optimizer, make_gpt_optimizer
from .steps import (
    GANTrainState,
    TrainState,
    make_cond_transformer_eval_step,
    make_cond_transformer_train_step,
    make_vitvq_eval_step,
    make_vitvq_train_step,
)


class Trainer:
    def __init__(self, max_epochs: int = 100, base_lr: float = 4.5e-6,
                 use_amp: bool = False, accumulate_grad_batches: int = 1,
                 basedir: Optional[str] = None, seed: int = 0,
                 mesh=None, model_parallel: int = 1,
                 checkpoint_every_epochs: int = 1,
                 log_every: int = 50,
                 callbacks: Optional[list] = None,
                 max_steps: Optional[int] = None,
                 split_gan_step: bool = False,
                 reuse_xrec: bool = False,
                 metrics_logger=None,
                 zero1: bool = False,
                 sp: bool = False,
                 pipeline_parallel: int = 1,
                 microbatches: int = 8,
                 resume: bool = False) -> None:
        self.max_epochs = max_epochs
        self.base_lr = base_lr
        self.use_amp = use_amp
        self.accumulate = accumulate_grad_batches
        self.basedir = Path(basedir) if basedir else None
        self.seed = seed
        self.mesh = mesh if mesh is not None else make_mesh(
            model=model_parallel, pipe=pipeline_parallel)
        self.checkpoint_every_epochs = checkpoint_every_epochs
        self.log_every = log_every
        self.callbacks = callbacks or []
        self.max_steps = max_steps
        self.split_gan_step = split_gan_step
        # D trains on the AE phase's reconstruction instead of re-running
        # the generator forward — one SGD step stale; see
        # steps.make_vitvq_train_steps_split. Implies split_gan_step.
        self.reuse_xrec = reuse_xrec
        if reuse_xrec:
            self.split_gan_step = True
        self.metrics_logger = metrics_logger  # e.g. utils.logging.WandbLogger
        # ZeRO-1: shard optimizer moments over the 'data' axis (sharding.py)
        self.zero1 = zero1
        # sequence parallelism for stage-2 priors (Block.sp_mesh)
        self.sp = sp
        # GPipe microbatch count when the mesh has a 'pipe' axis
        self.microbatches = microbatches
        # auto-resume from the latest checkpoint in basedir (preemption
        # recovery; the optimizer step rides the train state so
        # global_step restores exactly)
        self.resume = resume
        self.global_step = 0
        self._ckpt_mgr = None
        if self.basedir is not None:
            # created on EVERY process: orbax save/restore are collective
            # across hosts (StandardSave gathers shards from all of them) —
            # gating on process 0 would deadlock a multi-host run. Orbax
            # itself coordinates who writes what.
            self._ckpt_mgr = ocp.CheckpointManager(
                (self.basedir / "ckpt").absolute(),
                options=ocp.CheckpointManagerOptions(max_to_keep=None))

    # -- state construction -----------------------------------------------------

    def _build_stage1(self, model: ViTVQ):
        loss_obj = model.loss
        if hasattr(loss_obj, "check_trainable"):
            # refuse to train against a randomly-initialized "LPIPS"
            # (losses/vqperceptual.py:check_trainable) — eval-only uses of
            # the same loss object stay allowed
            loss_obj.check_trainable()
        sched = None
        if model.scheduler is not None:
            from ..utils.config import initialize_from_config
            cfg = dict(model.scheduler)
            cfg.setdefault("params", {})
            cfg["params"]["start"] = self.base_lr
            sched = initialize_from_config(cfg)
        ae_tx = make_ae_optimizer(self.base_lr, sched, self.accumulate)
        has_disc = getattr(loss_obj, "has_discriminator", False)
        disc_tx = make_ae_optimizer(self.base_lr, sched, self.accumulate) \
            if has_disc else None

        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            ae_params=model.params,
            ae_opt=ae_tx.init(model.params),
            disc_params=loss_obj.disc_init_params if has_disc else None,
            disc_opt=(disc_tx.init(loss_obj.disc_init_params)
                      if has_disc else None),
            lpips_params=getattr(loss_obj, "lpips_params", None))
        specs = replicated_specs(state)
        if self.zero1:
            # AE moments only: the discriminator's are small and its
            # conv-kernel moment shardings trip GSPMD's conv-grad
            # full-rematerialization fallback (sharding.py:zero1_specs).
            specs = specs.replace(
                ae_opt=zero1_specs(state.ae_opt, self.mesh))
        state = place_params(self.mesh, state, specs)
        if self.split_gan_step:
            from .steps import make_vitvq_train_steps_split
            ae_step, disc_step = make_vitvq_train_steps_split(
                model, loss_obj, ae_tx, disc_tx,
                reuse_xrec=self.reuse_xrec)

            if self.reuse_xrec:
                def train_step(state, x, rng, temp, do_r1=False):
                    r1, r2 = jax.random.split(rng)
                    state, log, xrec = ae_step(state, x, r1, temp)
                    state, d_log = disc_step(state, x, r2, temp,
                                             do_r1=do_r1, xrec=xrec)
                    log.update(d_log)
                    return state, log
            else:
                def train_step(state, x, rng, temp, do_r1=False):
                    r1, r2 = jax.random.split(rng)
                    state, log = ae_step(state, x, r1, temp)
                    state, d_log = disc_step(state, x, r2, temp,
                                             do_r1=do_r1)
                    log.update(d_log)
                    return state, log
        else:
            train_step = make_vitvq_train_step(model, loss_obj, ae_tx,
                                               disc_tx)
        eval_step = make_vitvq_eval_step(model, loss_obj)
        return state, train_step, eval_step

    def _build_stage2(self, model: CondTransformer):
        from ..parallel.mesh import MODEL_AXIS, PIPE_AXIS
        pp = (PIPE_AXIS in self.mesh.axis_names
              and self.mesh.shape[PIPE_AXIS] > 1)
        if self.sp and self.mesh.shape[MODEL_AXIS] > 1:
            # rebind the prior with sequence-parallel residual streams
            # (annotation-only; params/trees are unchanged)
            import dataclasses
            model.transformer = dataclasses.replace(model.transformer,
                                                    sp_mesh=self.mesh)
        sched = None
        if model.scheduler is not None:
            from ..utils.config import initialize_from_config
            cfg = dict(model.scheduler)
            cfg.setdefault("params", {})
            cfg["params"]["start"] = self.base_lr
            sched = initialize_from_config(cfg)
        tx = make_gpt_optimizer(self.base_lr, sched,
                                accumulate=self.accumulate)
        params = model.params
        specs = gpt_param_specs(params, pipe=pp)
        params = place_params(self.mesh, params, specs)
        opt = tx.init(params)   # moments inherit the param shardings
        if self.zero1 and not pp:
            # under pp the block moments are already stage-sharded S ways;
            # re-sharding them over 'data' would fight the pipe placement
            opt = place_params(self.mesh, opt, zero1_specs(opt, self.mesh))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt=opt)
        train_step = make_cond_transformer_train_step(
            model, tx, pp_mesh=self.mesh if pp else None,
            pp_microbatches=self.microbatches)
        return state, train_step

    # -- fit ---------------------------------------------------------------------

    def fit(self, model, data) -> None:
        for cb in self.callbacks:
            if hasattr(cb, "on_fit_start"):
                cb.on_fit_start()
        data.setup()
        if isinstance(model, CondTransformer):
            self._fit_stage2(model, data)
        else:
            self._fit_stage1(model, data)

    def _shard(self, arr):
        return jax.device_put(jnp.asarray(arr), batch_sharding(self.mesh))

    def _fit_stage1(self, model: ViTVQ, data) -> None:
        state, train_step, eval_step = self._build_stage1(model)
        state, start_epoch = self._maybe_resume(state)
        model.params = state.ae_params
        rng = jax.random.PRNGKey(self.seed)
        do_r1_every = getattr(model.loss, "do_r1_every", 0)
        image_loggers = [cb for cb in self.callbacks
                         if isinstance(cb, ImageLogger)]

        for epoch in range(start_epoch, self.max_epochs):
            for batch_idx, batch in enumerate(data.train_dataloader()):
                x = self._shard(_as_nhwc(jnp.asarray(
                    batch[model.image_key], jnp.float32)))
                rng, step_rng = jax.random.split(rng)
                temp = jnp.float32(self._gumbel_temp(model))
                do_r1 = bool(do_r1_every) and batch_idx % do_r1_every == 0
                state, log = train_step(state, x, step_rng, temp, do_r1=do_r1)
                self.last_log = log
                # host-side counter: int(state.step) would force a device
                # sync every step and stall the dispatch pipeline
                self.global_step += 1
                self._maybe_log(log, epoch)
                model.params = state.ae_params  # keep wrapper in sync
                for il in image_loggers:
                    il.log_img(model, batch, self.global_step, "train")
                if self.max_steps and self.global_step >= self.max_steps:
                    break

            self._validate_stage1(model, data, state, eval_step, epoch)
            self._save_ckpt(state, epoch)
            if self.max_steps and self.global_step >= self.max_steps:
                break
        model.params = state.ae_params
        self.final_state = state

    def _validate_stage1(self, model, data, state, eval_step, epoch) -> None:
        if "validation" not in getattr(data, "datasets", {}):
            return
        image_loggers = [cb for cb in self.callbacks
                         if isinstance(cb, ImageLogger)]
        logs = []
        for batch_idx, batch in enumerate(data.val_dataloader()):
            x = self._shard(_as_nhwc(jnp.asarray(
                batch[model.image_key], jnp.float32)))
            logs.append(eval_step(state, x))
            # reference logs reconstruction grids on validation batches too
            # (callback.py:134-141); frequency checked on batch_idx so the
            # first val batch of every epoch logs
            for il in image_loggers:
                il.log_img(model, batch, self.global_step, "val",
                           check_idx=batch_idx)
        if logs:
            mean_log = {k: float(np.mean([float(l[k]) for l in logs]))
                        for k in logs[0]}
            self._print_metrics(mean_log, prefix=f"[epoch {epoch} val]")
            if self.metrics_logger is not None and is_main_process():
                self.metrics_logger.log_metrics(mean_log, self.global_step)

    def _fit_stage2(self, model: CondTransformer, data) -> None:
        state, train_step = self._build_stage2(model)
        eval_step = make_cond_transformer_eval_step(model)
        state, start_epoch = self._maybe_resume(state)
        model.params = state.params
        image_loggers = [cb for cb in self.callbacks
                         if isinstance(cb, ImageLogger)]
        for epoch in range(start_epoch, self.max_epochs):
            for batch_idx, batch in enumerate(data.train_dataloader()):
                images, conds = self._stage2_batch(model, batch)
                state, log = train_step(state, images, conds)
                self.last_log = log
                self.global_step += 1
                self._maybe_log(log, epoch)
                model.params = state.params
                for il in image_loggers:
                    il.log_img(model, batch, self.global_step, "train",
                               top_k=64)
                if self.max_steps and self.global_step >= self.max_steps:
                    break
            self._validate_stage2(model, data, state, eval_step, epoch)
            self._save_ckpt(state, epoch)
            if self.max_steps and self.global_step >= self.max_steps:
                break
        model.params = state.params
        self.final_state = state

    def _stage2_batch(self, model: CondTransformer, batch):
        images = self._shard(_as_nhwc(jnp.asarray(
            batch[model.stage1_model.image_key], jnp.float32)))
        conds = np.asarray(batch[model.cond_key])
        conds = jnp.asarray(
            model.cond_model.encode_codes(conds)).astype(jnp.int32)
        if conds.ndim == 1:
            conds = conds[:, None]
        return images, self._shard(conds)

    def _validate_stage2(self, model, data, state, eval_step, epoch) -> None:
        """Epoch-end validation CE + val sample grids (the reference's
        validation_step + on_validation_batch_end image logging —
        transformer.py:126-129, callback.py:134-141)."""
        if "validation" not in getattr(data, "datasets", {}):
            return
        image_loggers = [cb for cb in self.callbacks
                         if isinstance(cb, ImageLogger)]
        logs = []
        for batch_idx, batch in enumerate(data.val_dataloader()):
            images, conds = self._stage2_batch(model, batch)
            logs.append(eval_step(state, images, conds))
            for il in image_loggers:
                il.log_img(model, batch, self.global_step, "val",
                           check_idx=batch_idx, top_k=64)
        if logs:
            mean_log = {k: float(np.mean([float(l[k]) for l in logs]))
                        for k in logs[0]}
            self._print_metrics(mean_log, prefix=f"[epoch {epoch} val]")
            if self.metrics_logger is not None and is_main_process():
                self.metrics_logger.log_metrics(mean_log, self.global_step)

    # -- misc --------------------------------------------------------------------

    def _gumbel_temp(self, model) -> float:
        ts = getattr(model, "temperature_scheduler", None)
        if ts is not None:
            return float(ts(self.global_step))
        # module.quantizer is the quantizer *config dict* (vitvqgan.py:36),
        # not the flax submodule — read the configured temp_init from it.
        quant_cfg = getattr(model.module, "quantizer", None)
        if isinstance(quant_cfg, dict):
            return float(quant_cfg.get("temp_init", 1.0))
        return 1.0

    def _maybe_log(self, log: Dict[str, Any], epoch: int) -> None:
        if self.global_step % self.log_every == 0 and is_main_process():
            metrics = {k: float(v) for k, v in log.items()}
            self._print_metrics(
                metrics, prefix=f"[epoch {epoch} step {self.global_step}]")
            if self.metrics_logger is not None:
                self.metrics_logger.log_metrics(metrics, self.global_step)

    def _print_metrics(self, metrics: Dict[str, float], prefix: str) -> None:
        parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"{prefix} {parts}", flush=True)

    def _save_ckpt(self, state, epoch: int) -> None:
        if self._ckpt_mgr is None:
            return
        if (epoch + 1) % self.checkpoint_every_epochs:
            return
        if jax.process_count() > 1:
            # multi-host: save the GLOBAL jax arrays directly — orbax
            # coordinates the collective write across hosts (host-local /
            # numpy copies are not serializable there)
            payload = state
        else:
            # single-host: host numpy copies (cheap, avoids holding device
            # buffers through the async save on relay-backed devices)
            payload = jax.tree.map(np.asarray, state)
        self._ckpt_mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._ckpt_mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        assert self._ckpt_mgr is not None
        step = step if step is not None else self._ckpt_mgr.latest_step()
        return self._ckpt_mgr.restore(
            step, args=ocp.args.StandardRestore(state))

    def _maybe_resume(self, state):
        """Preemption recovery: restore the newest checkpoint in basedir
        and continue from the epoch after it. The optimizer step counter
        rides the train state, so ``global_step`` restores exactly."""
        if not self.resume or self._ckpt_mgr is None:
            return state, 0
        latest = self._ckpt_mgr.latest_step()
        if latest is None:
            return state, 0
        state = self.restore(state, latest)
        self.global_step = int(state.step)
        if is_main_process():
            print(f"[resume] epoch-{latest} checkpoint restored "
                  f"(global step {self.global_step})", flush=True)
        return state, latest + 1
