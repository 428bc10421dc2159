"""Stage-I training step: optimizer, schedule, pjit-sharded step function.

Replaces the reference Accelerate-DDP trainer internals
(``train_sd15_codec_stage1.py:269-335``): one AdamW over generator+codec
params, constant-with-warmup LR, grad-clip 5.0, loss = pix + LPIPS +
lambda*bpp.

TPU-native: the step is one jitted function; data parallelism comes from
sharding the batch over the mesh ``data`` axis (gradients all-reduce via
XLA — the DDP allreduce equivalent). No per-rank code.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .losses import RDLoss


class TrainState(train_state.TrainState):
    pass


def make_optimizer(lr: float = 5e-5, warmup_steps: int = 500,
                   grad_clip: float = 5.0, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999,
                   optimizer: str = "adamw"):
    """Warmup-to-constant LR + global-norm clip + AdamW or Adafactor.

    AdamW matches the reference trainer (train_sd15_codec_stage1.py:163-180)
    but its f32 moments cost 2x params (~10.6 GB at full size) — more than
    one v5e chip's HBM. ``optimizer="adafactor"`` keeps the same schedule
    with factored second moments (state ~= params), fitting single-chip
    full-size training; on a pod slice, shard the state over the mesh
    instead.
    """
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.constant_schedule(lr)],
        boundaries=[warmup_steps])
    if optimizer == "adafactor":
        opt = optax.adafactor(schedule, multiply_by_parameter_scale=False,
                              weight_decay_rate=weight_decay or None)
    else:
        opt = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(grad_clip), opt)


def make_frozen_labels(params, frozen_paths: Tuple[str, ...] = ("vae",)):
    """Label tree for optax.multi_transform: 'freeze' under the named
    top-level submodules, 'train' elsewhere.

    The VAE is always frozen (ref model_..._stage1.py:42,46); pass
    ``("vae", "codec")`` to freeze the codec too (stage-II behavior).
    """
    def label_tree(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: label_tree(v, prefix + (k,)) for k, v in tree.items()}
        top = prefix[1] if len(prefix) > 1 else ""  # params/<submodule>/...
        return "freeze" if any(top == f for f in frozen_paths) else "train"
    return label_tree(params)


def make_masked_optimizer(params, tx, frozen_paths: Tuple[str, ...]):
    """Apply tx to trainable leaves; hard-zero updates on frozen ones.

    NB: plain ``optax.masked`` passes raw gradients through for masked-out
    leaves (it does NOT freeze them) — multi_transform + set_to_zero is the
    correct freeze.
    """
    labels = make_frozen_labels(params, frozen_paths)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def create_train_state(model, params, lr: float = 5e-5,
                       warmup_steps: int = 500, grad_clip: float = 5.0,
                       frozen: Tuple[str, ...] = ("vae",),
                       optimizer: str = "adamw") -> TrainState:
    tx = make_masked_optimizer(
        params, make_optimizer(lr, warmup_steps, grad_clip,
                               optimizer=optimizer), frozen)
    # jit the whole creation: un-jitted ``tx.init`` dispatches one tiny
    # zeros op per optimizer-state leaf (~10^3 for the composite model),
    # which costs minutes on dispatch-expensive hosts (1-core CPU oracle,
    # remote-compile paths); one fused program is milliseconds. Nested
    # jit is fine for callers already tracing.
    return jax.jit(lambda p: TrainState.create(
        apply_fn=model.apply, params=p, tx=tx))(params)


def grad_accum_scan(grad_fn, params, inputs: Tuple, rng, accum: int,
                    has_extra_aux: bool = False):
    """Mean-accumulate ``grad_fn`` over ``accum`` micro-batches via scan.

    ``grad_fn(params, *micro_inputs, key) -> ((loss, aux), grads)`` where
    ``aux`` is a scalar-metrics pytree, or ``(metrics, extra)`` when
    ``has_extra_aux`` (the extra — e.g. detached latents — is stacked
    along a new leading axis and reshaped back to the full batch).

    Every input's leading dim must be divisible by ``accum``; micro-batch
    i uses ``fold_in(rng, i)`` so the noise stream matches ``accum``
    independent micro-steps. Returns (grads_mean, metrics_mean, extra).
    Peak memory: one micro forward+backward + one grads-sized accumulator.
    """
    b = inputs[0].shape[0]
    if b % accum:
        raise ValueError(f"batch {b} not divisible by grad_accum {accum}")
    micro = tuple(x.reshape(accum, b // accum, *x.shape[1:])
                  for x in inputs)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        jnp.arange(accum))

    def body(carry, xs):
        g_acc, m_acc = carry
        *args, key = xs
        (_, aux), g = grad_fn(params, *args, key)
        metrics, extra = aux if has_extra_aux else (aux, None)
        g_acc = jax.tree.map(jnp.add, g_acc, g)
        m_acc = jax.tree.map(jnp.add, m_acc, metrics)
        return (g_acc, m_acc), extra

    zeros_g = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype,
                                                       jnp.float32)),
        params)
    aux_shape = jax.eval_shape(
        lambda: grad_fn(params, *(m[0] for m in micro), keys[0])[0][1])
    m_shape = aux_shape[0] if has_extra_aux else aux_shape
    zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
    (g_sum, m_sum), extra = jax.lax.scan(body, (zeros_g, zeros_m),
                                         (*micro, keys))
    inv = 1.0 / accum
    grads = jax.tree.map(lambda p, g: (g * inv).astype(p.dtype),
                         params, g_sum)
    metrics = jax.tree.map(lambda m: m * inv, m_sum)
    if extra is not None:
        extra = jax.tree.map(
            lambda x: x.reshape(b, *x.shape[2:]), extra)
    return grads, metrics, extra


def make_train_step(model, loss: Optional[RDLoss] = None,
                    remat: bool = False,
                    codeformer_loss_weight: float = 1e-3,
                    codeformer_mse_weight: float = 1e-2,
                    grad_accum: int = 1) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics). Jittable;
    shard batch over the mesh data axis for DP.

    ``remat=True`` rematerializes the forward during backward (keeping
    matmul outputs, recomputing elementwise) — the reference's
    gradient-checkpointing equivalent (model_..._stage1.py:98-100),
    required to fit full-size 512px training in v5e HBM.

    ``grad_accum > 1``: the batch's leading dim is split into that many
    micro-batches and gradients are mean-accumulated over a ``lax.scan``
    before ONE optimizer update — realizing the reference's effective
    batch (8/GPU, configs stage1 yaml:48-67) on a single chip whose HBM
    only fits the micro-batch. Each micro-batch folds its scan index into
    the noise rng so the noise stream matches what ``grad_accum`` equal
    independent micro-steps would draw. Peak memory is one micro-batch
    forward+backward plus a grads-sized accumulator.

    When the model runs with ``use_codeformer`` the semantic-distillation
    terms are added with the reference weights
    (train_sd15_codec_stage1.py:297-307; config: codeformer_loss_weight
    1e-3, codeformer_mse_weight 1e-2).
    """
    if loss is None:
        loss = RDLoss()
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    loss_fn = _make_stage1_loss_fn(model, loss, remat,
                                   codeformer_loss_weight,
                                   codeformer_mse_weight)

    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        image = batch["image"]

        def bound_loss(params, image, rng):
            return loss_fn(params, state.step, image, rng)

        grad_fn = jax.value_and_grad(bound_loss, has_aux=True)
        if grad_accum == 1:
            (_, metrics), grads = grad_fn(state.params, image, rng)
        else:
            grads, metrics, _ = grad_accum_scan(
                grad_fn, state.params, (image,), rng, grad_accum)

        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def _make_stage1_loss_fn(model, loss, remat: bool,
                         codeformer_loss_weight: float,
                         codeformer_mse_weight: float):
    """loss_fn(params, opt_step, image, rng) -> (total, scalar metrics),
    shared by the fused step and the host-unrolled accumulation step."""
    apply_fn = model.apply
    if remat:
        apply_fn = jax.checkpoint(
            lambda p, img, rng: model.apply(p, img, training=True,
                                            noise_rng=rng),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, opt_step, image, rng):
        if remat:
            enc_dict, pred = apply_fn(params, image, rng)
        else:
            enc_dict, pred = model.apply(params, image, training=True,
                                         noise_rng=rng)
        total, ld = loss(image, pred, enc_dict["bpp"],
                         step=opt_step, training=True)
        ld["bpp_hard_y"] = enc_dict["bpp_hard_y"]
        if "code_ce_loss" in enc_dict:
            ce = enc_dict["code_ce_loss"]
            mse = enc_dict["code_mse_loss"]
            cf = ce + mse * codeformer_mse_weight
            weighted = cf * codeformer_loss_weight
            total = total + weighted
            ld["codeformer_ce_loss"] = ce
            ld["codeformer_mse_loss"] = mse
            ld["codeformer_loss"] = cf
            ld["weighted_codeformer_loss"] = weighted
            ld["total_loss"] = total
        return total, ld

    return loss_fn


def make_unrolled_accum_step(model, loss: Optional[RDLoss] = None,
                             remat: bool = False,
                             codeformer_loss_weight: float = 1e-3,
                             codeformer_mse_weight: float = 1e-2,
                             grad_accum: int = 2,
                             micro_grads_dtype=None,
                             accum_dtype=None,
                             donate_state: bool = False) -> Callable:
    """Host-unrolled gradient accumulation: same math as
    ``make_train_step(grad_accum=N)`` (fold_in micro keys, mean grads,
    mean scalar metrics) but as a SEQUENCE of jitted programs — a
    micro-batch grad program that accumulates into a DONATED running
    sum, and one apply — instead of one scan-fused program.

    Why it exists: every compiled program stays micro-batch sized. The
    scan-fused full-size (1.34B-param, remat) step is rejected outright
    by this image's remote compile service (HTTP 500 at any accum
    count, same class as the round-3 flat-B>=4 rejection — ROADMAP);
    the B=1 grad program compiles fine, so unrolling on the host is the
    way to realize the reference's effective batch 8
    (configs stage1 yaml:48-67) on one chip here. The cost is
    ``grad_accum`` extra grads-sized HBM read/write passes for the
    accumulation (~54 ms per pass for 1.34B f32 grads at 200 GB/s) —
    small next to full-size micro-step time.

    Memory: the accumulate is fused INTO the grad program with the
    running sum donated, so per layer XLA adds the fresh grad leaf into
    the accumulator's buffer as the backward produces it — the full
    micro-grads tree is never live next to the running sum (an earlier
    separate-accumulate design was: params + accumulator + whole
    micro-grads tree = 3 x 5.4 GB f32 at flagship size, measured
    RESOURCE_EXHAUSTED on the 16 GiB chip, round 5). With
    ``donate_state=True`` the apply program also donates the state (old
    + new params would otherwise be 2 x 5.4 GB live at once). Opt-in
    because donation DELETES the caller's input buffers: safe when the
    step exclusively owns its state (the trainer loop, the throughput
    scripts), wrong when the same params tree seeds several states.

    ``micro_grads_dtype`` (e.g. ``jnp.bfloat16``) rounds each
    micro-grad to that dtype before it is added: the RUNNING SUM keeps
    its own dtype, so each micro-grad is bf16-rounded exactly once
    (~0.4% relative, non-compounding). ``accum_dtype`` (e.g.
    ``jnp.bfloat16``) sets the RUNNING SUM dtype itself (None promotes
    to f32); bf16 accumulation rounds at every add (~sqrt(N) x 0.4% at
    accum N). Both exist to shrink the resident set on a 16 GiB chip;
    multi-chip FSDP shards the accumulator and never needs them.

    Returns step(state, batch, rng) -> (state, metrics). NOT jittable
    as a whole; do not wrap in jax.jit.
    """
    if loss is None:
        loss = RDLoss()
    if grad_accum < 2:
        raise ValueError("unrolled accumulation needs grad_accum >= 2")
    loss_fn = _make_stage1_loss_fn(model, loss, remat,
                                   codeformer_loss_weight,
                                   codeformer_mse_weight)

    def _cast_micro(g):
        # one-time micro-grad rounding (see docstring); applied BEFORE
        # the accumulator cast so fused and unfused paths share math
        if micro_grads_dtype is not None:
            g = jax.tree.map(lambda x: x.astype(micro_grads_dtype), g)
        return g

    def _to_acc(x):
        return x.astype(accum_dtype if accum_dtype is not None
                        else jnp.promote_types(x.dtype, jnp.float32))

    # The accumulate is FUSED into the grad program (not a separate
    # jitted add): per layer, XLA adds the fresh grad leaf into the
    # DONATED accumulator leaf as it is produced, so the full
    # micro-grads tree is never materialized alongside the running sum.
    # At flagship size that removes a whole grads-sized buffer (2.7-5.4
    # GB) from the peak live set — the difference between fitting and
    # RESOURCE_EXHAUSTED on a 16 GiB chip.
    def _grad0(p, opt_step, image, rng):
        out, g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, opt_step, image, rng)
        g = jax.tree.map(_to_acc, _cast_micro(g))
        return out, g

    def _grad_acc(a, p, opt_step, image, rng):
        out, g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, opt_step, image, rng)
        g = _cast_micro(g)
        a = jax.tree.map(lambda acc, x: acc + x.astype(acc.dtype), a, g)
        return out, a

    grad0_prog = jax.jit(_grad0)
    gradacc_prog = jax.jit(_grad_acc, donate_argnums=(0,))

    def finish(state, g_sum, m_sum):
        inv = 1.0 / grad_accum
        grads = jax.tree.map(lambda p, g: (g * inv).astype(p.dtype),
                             state.params, g_sum)
        metrics = jax.tree.map(lambda m: m * inv, m_sum)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    # donating the state keeps old + new params (2 x 5.4 GB at flagship
    # size) from being live at once across the update
    fin_prog = jax.jit(finish, donate_argnums=(0, 1) if donate_state
                       else (1,))

    def step(state: TrainState, batch: Dict[str, Any], rng):
        image = batch["image"]
        b = image.shape[0]
        if b % grad_accum:
            raise ValueError(f"batch {b} not divisible by "
                             f"grad_accum {grad_accum}")
        micro = b // grad_accum
        g_sum = m_sum = None
        for i in range(grad_accum):
            key = jax.random.fold_in(rng, i)
            sl = image[i * micro:(i + 1) * micro]
            if g_sum is None:
                (_, m_sum), g_sum = grad0_prog(state.params, state.step,
                                               sl, key)
            else:
                (_, m), g_sum = gradacc_prog(g_sum, state.params,
                                             state.step, sl, key)
                m_sum = jax.tree.map(jnp.add, m_sum, m)
        return fin_prog(state, g_sum, m_sum)

    return step
