"""Alternating G/D adversarial training step, fully jitted, mesh-shardable.

Reconstruction of the unpublished FD-GAN train loop from the shipped parts
(SURVEY.md §3.4): generator FDGAN, fusion-discriminator
NLayerDiscriminator(input_nc=9) over concat[RGB, LF, HF], Adam(2e-4, β1=0.5)
(reference flag defaults demo.py:43-46), linear LR decay (misc.py:164-172).

TPU design notes:
* one `train_step(state, haze, gt, rng)` — both G and D updates inside a
  single jit so XLA overlaps their collectives and reuses the G forward
* data parallelism comes from sharded batch inputs (dist.mesh); gradients
  are averaged implicitly by jit-compiled reduction over the sharded batch
* BatchNorm batch statistics are captured during the G forward and folded
  into running stats torch-style (momentum 0.1), keeping checkpoints
  compatible with eval-mode inference
* all compute can run in bf16 via `compute_dtype`; params and the Adam state
  stay fp32 (mixed-precision policy of BASELINE config 5)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fdgan_tpu.losses.composite import LossWeights, discriminator_loss, generator_loss
from fdgan_tpu.models import fdgan, fdgan_fast
from fdgan_tpu.nn.layers import update_running_stats
from fdgan_tpu.nn.tree import tree_get, tree_set


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


def create_train_state(
    rng: jax.Array,
    lr_g: float = 2e-4,
    lr_d: float = 2e-4,
    beta1: float = 0.5,
    decay_every: int = 0,
    decay_start: int = 0,
    input_nc: int = 9,
    clip_grad: float = 0.0,
) -> Tuple[TrainState, optax.GradientTransformation, optax.GradientTransformation]:
    from fdgan_tpu.models.discriminators import nlayer_init
    from fdgan_tpu.train.schedule import linear_decay_schedule

    g_rng, d_rng = jax.random.split(rng)
    g_params = fdgan.init(g_rng)
    d_params = nlayer_init(d_rng, input_nc=input_nc)

    # decay_every = 0 disables decay; decay_start delays it (the reference's
    # annealStart/annealEvery pair — decay ticks only once annealing starts)
    sched_g = linear_decay_schedule(lr_g, decay_every, decay_start) if decay_every else lr_g
    sched_d = linear_decay_schedule(lr_d, decay_every, decay_start) if decay_every else lr_d
    tx_g = optax.adam(sched_g, b1=beta1, b2=0.999)
    tx_d = optax.adam(sched_d, b1=beta1, b2=0.999)
    if clip_grad > 0:
        # global-norm clip ahead of Adam — the standard GAN stabiliser for
        # the low-precision runs (bf16 grads spike when D saturates)
        tx_g = optax.chain(optax.clip_by_global_norm(clip_grad), tx_g)
        tx_d = optax.chain(optax.clip_by_global_norm(clip_grad), tx_d)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=tx_g.init(g_params),
        d_opt=tx_d.init(d_params),
    )
    return state, tx_g, tx_d


def _fold_bn_stats(params: dict, stats: dict, momentum: float = 0.1) -> dict:
    """Apply captured batch statistics to the running stats at `path`."""
    for path, (mean, var) in stats.items():
        bn = tree_get(params, path)
        tree_set(params, path, update_running_stats(bn, mean, var, momentum))
    return params


def _make_g_forward(compute_dtype, impl: str, interpret: bool, remat: bool):
    """Generator forward returning (x_hat, bn_stats).

    impl='xla' uses the optimised fdgan_fast forward (numerically identical
    to fdgan.apply, captures the same per-BN batch statistics);
    impl='pallas' routes the encoder dense blocks through the fused Pallas
    kernel (differentiable via its custom VJP). `remat` rematerialises
    activations in the backward pass — structured per-layer/per-stage
    checkpoints on the xla path (much lower backward peak than a wholesale
    wrap), a whole-forward jax.checkpoint on the pallas path — the high-res
    memory lever (SURVEY §5 long-context row)."""

    if impl == "pallas" and remat == "stages":
        print(
            "WARNING: --rematStages is an xla-path feature; the pallas path "
            "falls back to a whole-forward jax.checkpoint (higher backward "
            "peak — per-layer/stage checkpoints are not available there)"
        )

    def forward(g_params, haze):
        stats: dict = {}
        if impl == "pallas":
            x_hat = fdgan.apply(
                g_params, haze.astype(compute_dtype),
                stats_out=stats, impl="pallas", interpret=interpret,
            )
        else:
            x_hat = fdgan_fast.apply(
                g_params, haze.astype(compute_dtype), stats_out=stats, remat=remat
            )
        return x_hat, stats

    return jax.checkpoint(forward) if (remat and impl == "pallas") else forward


def make_train_step(
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    vgg_params: Optional[dict] = None,
    compute_dtype=jnp.float32,
    update_bn_stats: bool = True,
    impl: str = "xla",
    interpret: bool = False,
    remat: "bool | str" = False,  # False | True (per-layer) | "stages"
    accum_steps: int = 1,
    real_label: float = 1.0,
):
    """Build the jitted (donated-state) alternating train step.

    ``accum_steps`` > 1 accumulates G gradients over that many microbatches
    via ``lax.scan`` — activation memory drops ~accum_steps× (the lever for
    high-res training, composing with ``remat``). Note the BatchNorm batch
    statistics then cover each microbatch, not the full batch (the same
    virtual-batch semantics torch gradient accumulation has); the folded
    running stats average the per-microbatch moments."""
    g_forward = _make_g_forward(compute_dtype, impl, interpret, remat)

    def g_loss_fn(g_params, d_params, haze, gt):
        x_hat, stats = g_forward(g_params, haze)
        loss, terms = generator_loss(d_params, x_hat, gt.astype(compute_dtype), weights, vgg_params)
        return loss, (terms, stats, x_hat)

    def d_loss_fn(d_params, x_hat, gt):
        loss, terms = discriminator_loss(
            d_params, x_hat, gt.astype(compute_dtype), real_label
        )
        return loss, terms

    def g_value_and_grad(g_params, d_params, haze, gt):
        """(loss, terms, bn_stats, x_hat, grads) — single pass or scan."""
        if accum_steps == 1:
            (loss, (terms, stats, x_hat)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_params, d_params, haze, gt)
            return loss, terms, stats, x_hat, grads

        b = haze.shape[0]
        if b % accum_steps:
            raise ValueError(f"batch {b} not divisible by accum_steps {accum_steps}")
        micro = b // accum_steps
        reshape = lambda x: x.reshape(accum_steps, micro, *x.shape[1:])

        def body(grads_acc, chunk):
            h_c, g_c = chunk
            (loss, (terms, stats, x_hat)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_params, d_params, h_c, g_c)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return grads_acc, (loss, terms, stats, x_hat)

        zeros = jax.tree.map(jnp.zeros_like, g_params)
        grads_sum, (losses, terms_s, stats_s, xh_s) = jax.lax.scan(
            body, zeros, (reshape(haze), reshape(gt))
        )
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads_sum)
        terms = jax.tree.map(lambda t: jnp.mean(t, axis=0), terms_s)
        # per-microbatch BN moments → averaged (equal-size chunks)
        stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats_s)
        x_hat = xh_s.reshape(b, *xh_s.shape[2:])
        return jnp.mean(losses), terms, stats, x_hat, grads

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, haze: jax.Array, gt: jax.Array, rng: jax.Array):
        # --- G update ---
        g_loss, g_terms, bn_stats, x_hat, g_grads = g_value_and_grad(
            state.g_params, state.d_params, haze, gt
        )
        g_updates, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        if update_bn_stats:
            g_params = _fold_bn_stats(g_params, bn_stats)

        # --- D update (on the pre-update G output, detached) ---
        (d_loss_v, d_terms), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, jax.lax.stop_gradient(x_hat), gt
        )
        d_updates, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
        )
        metrics = {f"g_{k}": v for k, v in g_terms.items()}
        metrics.update({k: v for k, v in d_terms.items()})
        return new_state, metrics

    return train_step


def make_device_loop(step, chunk_steps: int):
    """Wrap a ``make_train_step`` step into a device-resident multi-step.

    TPU-native answer to this platform's host-loop tax: a per-step host
    dispatch pays a ~70 ms tunnel floor and each batch upload moves MBs at
    ~4 MB/s (CLAUDE.md), so small-dataset training runs ~50× slower than
    the device can step.  Here the WHOLE dataset lives in HBM —
    ``(n_batches, b, H, W, 3)`` stacks — and ``chunk_steps`` train steps
    run inside one ``lax.scan`` dispatch; the host only supplies a
    shuffled batch-index vector per chunk and fetches per-step scalar
    metrics (KBs).

    Returns ``run(state, haze_all, gt_all, idx, base_step, rng) ->
    (state, metrics)`` where ``idx`` is int32 ``(chunk_steps,)`` batch
    indices and ``metrics`` maps names to ``(chunk_steps,)`` arrays.
    ``base_step`` keeps the per-step RNG folding globally unique across
    chunks. The state is donated — rebind it every call.
    """
    body = getattr(step, "__wrapped__", step)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, haze_all, gt_all, idx, base_step, rng):
        def scan_body(st, t_i):
            t, i = t_i
            h = jax.lax.dynamic_index_in_dim(haze_all, i, 0, keepdims=False)
            g = jax.lax.dynamic_index_in_dim(gt_all, i, 0, keepdims=False)
            st, m = body(st, h, g, jax.random.fold_in(rng, t))
            return st, m

        ts = base_step + jnp.arange(chunk_steps, dtype=jnp.int32)
        return jax.lax.scan(scan_body, state, (ts, idx))

    return run


def make_device_pool_loop(g_step, d_step, chunk_steps: int):
    """Device-resident multi-step WITH the ImagePool (misc.py:140-161).

    The host-side ``ImagePool`` cannot ride inside ``make_device_loop`` —
    its buffer and RNG live on the host — so this variant carries a
    ``(pool_size, b, H, W, C)`` replay buffer through the ``lax.scan``
    (``train/pool.py::device_pool_query``) and runs the split G/D steps
    from ``make_gd_steps``: G update → pool query on the stop-gradient'ed
    fakes → D update on the (possibly historical) fake batch.  This is the
    stabiliser the reference trains with; without it long device-resident
    runs drift toward a saturated D (observed: D(fake)→0.01 after ~3.5k
    steps at 256²).

    Returns ``run(state, pool_buf, n_filled, haze_all, gt_all, idx,
    base_step, rng) -> (state, pool_buf, n_filled, metrics)``; allocate
    ``pool_buf, n_filled`` with ``device_pool_init``.  ``state`` and
    ``pool_buf`` are donated — rebind both every call.
    """
    from fdgan_tpu.train.pool import device_pool_query

    g_body = getattr(g_step, "__wrapped__", g_step)
    d_body = getattr(d_step, "__wrapped__", d_step)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(state, pool_buf, n_filled, haze_all, gt_all, idx, base_step, rng):
        def scan_body(carry, t_i):
            st, buf, n = carry
            t, i = t_i
            h = jax.lax.dynamic_index_in_dim(haze_all, i, 0, keepdims=False)
            g = jax.lax.dynamic_index_in_dim(gt_all, i, 0, keepdims=False)
            st, g_metrics, x_hat = g_body(st, h, g)
            buf, n, fake = device_pool_query(
                buf, n, jax.lax.stop_gradient(x_hat), jax.random.fold_in(rng, t)
            )
            st, d_metrics = d_body(st, fake, g)
            return (st, buf, n), {**g_metrics, **d_metrics}

        ts = base_step + jnp.arange(chunk_steps, dtype=jnp.int32)
        (state, pool_buf, n_filled), ms = jax.lax.scan(
            scan_body, (state, pool_buf, n_filled), (ts, idx)
        )
        return state, pool_buf, n_filled, ms

    return run


def make_device_eval(val_haze, val_gt):
    """Fully on-device val evaluation: ``fn(g_params) -> (psnr, ssim)``.

    The reference's evalIter hook (demo.py:50) fetches every generated val
    image to the host; on this platform that round-trip rides a ~4 MB/s
    tunnel. Here the val set is staged once (``(n, 1, H, W, C)`` stacks,
    the val loader's batch-1 layout) and one jitted dispatch maps the
    generator + PSNR (10·log10(1/MSE) on [0,1], PSNRSSIM.py:201-205) +
    SSIM (ops/ssim.py) over it — only the two mean scalars cross the
    tunnel. Parity with the host-side metric loop is pinned by
    ``tests/test_train.py::test_device_eval_matches_host``.
    """
    from fdgan_tpu.ops.ssim import ssim as ssim_fn

    val_haze = jnp.asarray(val_haze)
    val_gt = jnp.asarray(val_gt)

    @jax.jit
    def evaluate(g_params):
        def per_image(_, pair):
            haze, gt = pair
            x_hat = fdgan_fast.apply(g_params, haze)
            x01 = jnp.clip((x_hat.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
            gt32 = gt.astype(jnp.float32)
            mse = jnp.mean(jnp.square(x01 - gt32))
            p = 10.0 * jnp.log10(1.0 / mse)
            s = ssim_fn(x01, gt32)
            return _, (p, s)

        _, (ps, ss) = jax.lax.scan(per_image, None, (val_haze, val_gt))
        return jnp.mean(ps), jnp.mean(ss)

    return evaluate


def make_gd_steps(
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    vgg_params: Optional[dict] = None,
    compute_dtype=jnp.float32,
    update_bn_stats: bool = True,
    impl: str = "xla",
    interpret: bool = False,
    remat: "bool | str" = False,  # False | True (per-layer) | "stages"
    real_label: float = 1.0,
):
    """Split G/D steps for ImagePool-style training (misc.py:140-161): the
    G step returns the generated batch; the host pools it and feeds a
    (possibly historical) fake batch to the D step."""
    g_forward = _make_g_forward(compute_dtype, impl, interpret, remat)

    def g_loss_fn(g_params, d_params, haze, gt):
        x_hat, stats = g_forward(g_params, haze)
        loss, terms = generator_loss(d_params, x_hat, gt.astype(compute_dtype), weights, vgg_params)
        return loss, (terms, stats, x_hat)

    @jax.jit
    def g_step(state: TrainState, haze: jax.Array, gt: jax.Array):
        (g_loss, (terms, bn_stats, x_hat)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, haze, gt
        )
        updates, g_opt = tx_g.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        if update_bn_stats:
            g_params = _fold_bn_stats(g_params, bn_stats)
        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=state.d_params,
            g_opt=g_opt,
            d_opt=state.d_opt,
        )
        return new_state, {f"g_{k}": v for k, v in terms.items()}, x_hat

    @jax.jit
    def d_step(state: TrainState, fake: jax.Array, gt: jax.Array):
        def loss_fn(d_params):
            return discriminator_loss(d_params, fake, gt.astype(compute_dtype), real_label)

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt = tx_d.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        new_state = TrainState(
            step=state.step,
            g_params=state.g_params,
            d_params=d_params,
            g_opt=state.g_opt,
            d_opt=d_opt,
        )
        return new_state, terms

    return g_step, d_step
