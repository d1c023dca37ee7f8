"""Jitted training steps: stage-1 GAN alternation and stage-2 cross-entropy.

TPU-native redesign of the reference's Lightning optimizer_idx machinery
(reference: enhancing/modules/stage1/vitvqgan.py:101-127,152-178): one jitted
function runs the autoencoder update and then the discriminator update on the
freshly updated AE parameters — the exact sequence Lightning executes with two
optimizers — as a single XLA program over the device mesh. Lazy-R1 steps
(batch_idx % do_r1_every == 0, reference vqperceptual.py:151) compile as a
second static variant.

The adaptive adversarial weight (reference vqperceptual.py:95-103) is computed
without extra full backward passes: the decoder's last layer is linear in its
kernel, so d(loss)/d(W_last) = tokens^T @ d(loss)/d(patches) — two cheap VJPs
w.r.t. the reconstruction plus one einsum each, instead of torch's two
autograd.grad graph traversals.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    ae_params: Any
    ae_opt: Any
    disc_params: Any = None
    disc_opt: Any = None
    # frozen LPIPS (VGG) params: carried in the state so jitted steps receive
    # them as arguments — closing over them bakes ~232MB of weights into the
    # compiled program as literal constants
    lpips_params: Any = None


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt: Any


def make_vitvq_train_step(model, loss_obj, ae_tx, disc_tx=None):
    """Build the jitted stage-1 train step.

    model: ViTVQ wrapper (provides .module and .constants)
    loss_obj: VQLPIPS / VQLPIPSWithDiscriminator / DummyLoss-like
    """
    module = model.module
    constants = model.constants
    has_disc = getattr(loss_obj, "has_discriminator", False)
    is_gumbel = module.quantizer_type == "gumbel"
    use_adaptive = getattr(loss_obj, "use_adaptive_adv", False)

    n_embed = module.quantizer["n_embed"]

    def forward(params, x, temp, rng):
        variables = {"params": params, "constants": constants}
        rngs = {"gumbel": rng} if is_gumbel else None
        return module.apply(variables, x, temp, not is_gumbel,
                            method="forward_training", rngs=rngs)

    def code_perplexity(codes):
        """Codebook-health metric: exp(entropy) of the batch code histogram
        (not in the reference — SURVEY §5 observability gap)."""
        hist = jnp.zeros((n_embed,), jnp.float32).at[codes.reshape(-1)].add(1.0)
        p = hist / jnp.maximum(jnp.sum(hist), 1.0)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
        return jnp.exp(ent), jnp.sum(hist > 0)

    patch = module.patch_size
    ph, pw = (patch, patch) if isinstance(patch, int) else patch

    def _patchify_grad(g):
        from einops import rearrange
        return rearrange(g, "b (h p1) (w p2) c -> b (h w) (c p1 p2)",
                         p1=ph, p2=pw)

    def adaptive_d_weight(disc_params, lpips_params, x, xrec, tokens):
        """||dnll/dW_last|| / ||dg/dW_last|| via VJPs w.r.t. xrec only."""
        nll_fn = lambda r: loss_obj.nll_loss(x, r, lpips_params)[0]
        g_fn = lambda r: loss_obj.disc_loss(
            loss_obj.run_discriminator(disc_params, r))
        g_nll = jax.grad(nll_fn)(xrec)
        g_g = jax.grad(g_fn)(xrec)
        dw_nll = jnp.einsum("bnd,bno->do", tokens, _patchify_grad(g_nll))
        dw_g = jnp.einsum("bnd,bno->do", tokens, _patchify_grad(g_g))
        return loss_obj.adaptive_weight(dw_nll, dw_g)

    @functools.partial(jax.jit, static_argnames=("do_r1",), donate_argnums=(0,))
    def train_step(state: GANTrainState, x: jax.Array, rng: jax.Array,
                   temp: jax.Array, do_r1: bool = False
                   ) -> Tuple[GANTrainState, Dict[str, jax.Array]]:
        rng_ae, rng_d = jax.random.split(rng)
        if has_disc:
            disc_factor = (state.step
                           >= loss_obj.discriminator_iter_start).astype(
                               jnp.float32)
        else:
            disc_factor = jnp.float32(0.0)

        d_weight = None
        if has_disc and use_adaptive:
            xrec0, _, tokens0, _ = forward(state.ae_params, x, temp, rng_ae)
            d_weight = adaptive_d_weight(state.disc_params,
                                         state.lpips_params, x, xrec0,
                                         tokens0)

        # ---- phase 0: autoencoder (reference optimizer_idx == 0) ----------
        def ae_loss_fn(ae_params):
            xrec, qloss, _, codes = forward(ae_params, x, temp, rng_ae)
            if has_disc:
                l, log = loss_obj.generator_loss(
                    qloss, x, xrec, state.disc_params, disc_factor,
                    d_weight=d_weight, lpips_params=state.lpips_params)
            else:
                l, log = loss_obj.generator_loss(
                    qloss, x, xrec, lpips_params=state.lpips_params)
            return l, (log, jax.lax.stop_gradient(codes))

        (ae_loss, (log, codes)), grads = jax.value_and_grad(
            ae_loss_fn, has_aux=True)(state.ae_params)
        updates, ae_opt = ae_tx.update(grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, updates)

        # ---- phase 1: discriminator on the *updated* AE output ------------
        disc_params, disc_opt = state.disc_params, state.disc_opt
        if has_disc:
            xrec2, _, _, _ = forward(ae_params, x, temp, rng_d)
            xrec2 = jax.lax.stop_gradient(xrec2)

            def d_loss_fn(dp):
                return loss_obj.discriminator_loss(dp, x, xrec2, disc_factor,
                                                   do_r1=do_r1)

            (d_loss, d_log), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.disc_params)
            d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                                 state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            log.update(d_log)

        perp, n_used = code_perplexity(codes)
        log["train/code_perplexity"] = perp
        log["train/codes_used"] = n_used

        new_state = state.replace(step=state.step + 1, ae_params=ae_params,
                                  ae_opt=ae_opt, disc_params=disc_params,
                                  disc_opt=disc_opt)
        return new_state, log

    return train_step


def make_vitvq_train_steps_split(model, loss_obj, ae_tx, disc_tx=None,
                                 reuse_xrec: bool = False):
    """Two-program variant of the GAN step: (ae_step, disc_step).

    Identical math to make_vitvq_train_step, but the autoencoder and
    discriminator updates compile as separate (roughly half-size) XLA
    programs. Useful when a single fused program's compile time is the
    bottleneck (e.g. remote-compile tunnels); costs one host round trip per
    step. Select with Trainer(split_gan_step=True).

    ``reuse_xrec=True`` changes the protocol AND the semantics: ae_step
    returns ``(state, log, xrec)`` with the reconstruction it already
    computed, and ``disc_step(..., xrec=...)`` trains D on it instead of
    re-running the generator forward. That saves one full generator
    forward per step (measured, scanned 16-step programs on the v5e:
    197.2 -> 171.5 ms/step at b8 = -13%, `gan_step_scanned` rows), but D
    then sees
    the PRE-update generator's output — the reference recomputes xrec
    after the G optimizer step (vitvqgan.py:101-127, Lightning's
    sequential optimizers), so D there sees a half-step-fresher fake.
    One SGD step of staleness on the fake distribution; opt-in.
    """
    module = model.module
    constants = model.constants
    has_disc = getattr(loss_obj, "has_discriminator", False)
    is_gumbel = module.quantizer_type == "gumbel"
    use_adaptive = getattr(loss_obj, "use_adaptive_adv", False)
    if use_adaptive:
        raise NotImplementedError(
            "use_adaptive_adv requires the fused train step "
            "(Trainer(split_gan_step=False))")
    n_embed = module.quantizer["n_embed"]

    def forward(params, x, temp, rng):
        variables = {"params": params, "constants": constants}
        rngs = {"gumbel": rng} if is_gumbel else None
        return module.apply(variables, x, temp, not is_gumbel,
                            method="forward_training", rngs=rngs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ae_step(state: GANTrainState, x, rng, temp):
        disc_factor = ((state.step >= loss_obj.discriminator_iter_start)
                       .astype(jnp.float32) if has_disc else jnp.float32(0.0))

        def ae_loss_fn(ae_params):
            xrec, qloss, _, codes = forward(ae_params, x, temp, rng)
            if has_disc:
                l, log = loss_obj.generator_loss(
                    qloss, x, xrec, state.disc_params, disc_factor,
                    lpips_params=state.lpips_params)
            else:
                l, log = loss_obj.generator_loss(
                    qloss, x, xrec, lpips_params=state.lpips_params)
            return l, (log, jax.lax.stop_gradient(codes),
                       jax.lax.stop_gradient(xrec) if reuse_xrec else None)

        (_, (log, codes, xrec_out)), grads = jax.value_and_grad(
            ae_loss_fn, has_aux=True)(state.ae_params)
        updates, ae_opt = ae_tx.update(grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, updates)
        hist = jnp.zeros((n_embed,), jnp.float32).at[codes.reshape(-1)].add(1.)
        p = hist / jnp.maximum(jnp.sum(hist), 1.0)
        log["train/code_perplexity"] = jnp.exp(
            -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0)))
        new_state = state.replace(ae_params=ae_params, ae_opt=ae_opt)
        if reuse_xrec:
            return new_state, log, xrec_out
        return new_state, log

    @functools.partial(jax.jit, static_argnames=("do_r1",),
                       donate_argnums=(0,))
    def disc_step(state: GANTrainState, x, rng, temp, do_r1: bool = False,
                  xrec=None):
        if not has_disc:
            return state.replace(step=state.step + 1), {}
        disc_factor = (state.step
                       >= loss_obj.discriminator_iter_start).astype(jnp.float32)
        if xrec is None:
            xrec, _, _, _ = forward(state.ae_params, x, temp, rng)
            xrec = jax.lax.stop_gradient(xrec)

        def d_loss_fn(dp):
            return loss_obj.discriminator_loss(dp, x, xrec, disc_factor,
                                               do_r1=do_r1)

        (_, d_log), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        return state.replace(step=state.step + 1, disc_params=disc_params,
                             disc_opt=disc_opt), d_log

    return ae_step, disc_step


def make_vitvq_eval_step(model, loss_obj):
    """Validation metrics (reference vitvqgan.py:129-150), jitted."""
    module = model.module
    constants = model.constants
    has_disc = getattr(loss_obj, "has_discriminator", False)

    @jax.jit
    def eval_step(state: GANTrainState, x: jax.Array
                  ) -> Dict[str, jax.Array]:
        variables = {"params": state.ae_params, "constants": constants}
        xrec, qloss = module.apply(variables, x)
        if has_disc:
            disc_factor = (state.step
                           >= loss_obj.discriminator_iter_start).astype(
                               jnp.float32)
            _, log = loss_obj.generator_loss(qloss, x, xrec,
                                             state.disc_params, disc_factor,
                                             split="val",
                                             lpips_params=state.lpips_params)
            _, d_log = loss_obj.discriminator_loss(
                state.disc_params, x, xrec, disc_factor, do_r1=False,
                split="val")
            log.update(d_log)
        else:
            _, log = loss_obj.generator_loss(qloss, x, xrec, split="val",
                                             lpips_params=state.lpips_params)
        return log

    return eval_step


def make_cond_transformer_eval_step(cond_model):
    """Stage-2 validation: cross-entropy of the prior on frozen-tokenizer
    codes (reference transformer.py:126-129). The mean reduces over the
    whole sharded batch under jit — XLA inserts the cross-replica reduction,
    the ``sync_dist=True`` equivalent (SURVEY §2.9)."""
    stage1 = cond_model.stage1_model
    transformer = cond_model.transformer
    is_rq = cond_model.is_rq

    @jax.jit
    def encode(stage1_vars, images: jax.Array) -> jax.Array:
        # same executable as the train step's encode (compile-cache reuse)
        return jax.lax.stop_gradient(
            stage1.module.apply(stage1_vars, images, method="encode_codes"))

    @jax.jit
    def ce(params, codes: jax.Array, conds: jax.Array
           ) -> Dict[str, jax.Array]:
        logits = transformer.apply({"params": params}, codes, conds)
        if is_rq:
            targets = codes.reshape(-1, codes.shape[-1])
        else:
            targets = codes.reshape(codes.shape[0], -1)
        logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
        t = targets.reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return {"val/total_loss":
                -jnp.mean(jnp.take_along_axis(logp, t[:, None], axis=1))}

    def eval_step(state: TrainState, images, conds):
        return ce(state.params, encode(stage1.variables, images), conds)

    return eval_step


def make_cond_transformer_train_step(cond_model, tx, pp_mesh=None,
                                     pp_microbatches: int = 8):
    """Stage-2 prior step: frozen encodes + cross-entropy
    (reference transformer.py:107-124).

    The frozen stage-1 encode and the prior update compile as SEPARATE
    programs — the encode graph is the same executable the tokenizer's
    inference path uses (compile-cache reuse), and each program stays small
    (matters on remote-compile backends).

    ``pp_mesh``: a mesh with a 'pipe' axis routes the prior forward (and,
    through AD, its backward) through the GPipe schedule in
    parallel/pipeline.py with ``pp_microbatches`` microbatches.
    """
    stage1 = cond_model.stage1_model
    transformer = cond_model.transformer
    is_rq = cond_model.is_rq
    if pp_mesh is not None:
        assert not is_rq, "pipeline parallelism supports the GPT prior only"
        from ..parallel.pipeline import gpt_apply_pipelined

    @jax.jit
    def encode(stage1_vars, images: jax.Array) -> jax.Array:
        # stage1 weights as an ARGUMENT — a closure would bake ~344MB of
        # frozen tokenizer params into the HLO as constants
        return jax.lax.stop_gradient(
            stage1.module.apply(stage1_vars, images, method="encode_codes"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(state: TrainState, codes: jax.Array, conds: jax.Array
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def loss_fn(params):
            if pp_mesh is not None:
                logits = gpt_apply_pipelined(
                    transformer, {"params": params}, codes, conds,
                    mesh=pp_mesh, n_microbatches=pp_microbatches)
            else:
                logits = transformer.apply({"params": params}, codes, conds)
            if is_rq:
                targets = codes.reshape(-1, codes.shape[-1])
            else:
                targets = codes.reshape(codes.shape[0], -1)
            logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
            t = targets.reshape(-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, t[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params, opt=opt),
                {"train/total_loss": loss})

    def train_step(state, images, conds):
        return update(state, encode(stage1.variables, images), conds)

    return train_step
