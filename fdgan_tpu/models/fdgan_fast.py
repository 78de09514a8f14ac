"""Inference-optimised FDGAN forward — mathematically identical to
``fdgan.apply`` (tests assert equality), restructured for XLA on TPU:

1. **Incremental BN statistics.** In batch mode every dense layer's norm1
   normalises the growing concat, and the reference path recomputes
   mean/var over all C channels per layer — an extra full read of the
   concat each time. But batch statistics are *data* statistics: channels
   of the concat partition into segments (block input + each layer's 32-ch
   output), so each segment's statistics are computed once when produced
   and reused by every later layer and by the transition BN. Each BN then
   becomes a per-channel affine that XLA folds into the following conv.
2. **Padded stem.** conv_refin1 consumes 3-channel input — a pathological
   lane count (measured 65 GB/s). The input is zero-padded to 8 channels
   with matching zero kernel rows (bit-identical output).

Profiling context in tools/probe_convs.py; the per-layer statistics pass
costs ~1-2.5 ms each across 42 dense layers at 512².
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fdgan_tpu.models.blocks import bottleneck_apply, transition_apply
from fdgan_tpu.nn.layers import avg_pool, conv2d, relu, tanh

_EPS = 1e-5


def _fold(norm: dict, mean: jax.Array, var: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    a = norm["scale"].astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    b = norm["bias"].astype(jnp.float32) - mean.astype(jnp.float32) * a
    return a.astype(dtype), b.astype(dtype)


def _stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    # dtype-split fused statistics — one-pass for bf16 (saves a whole pass
    # over x), two-pass for fp32 parity; see nn.layers._batch_stats
    from fdgan_tpu.nn.layers import _batch_stats

    return _batch_stats(x, axis=(0, 1, 2))


class _SegStats:
    """Per-channel statistics of a concat, maintained segment-wise.

    When `collector`/`prefix` are given in batch mode, every BN's effective
    batch statistics are also recorded under its parameter path (same format
    as nn.layers.batch_norm's stats capture) so the train step can fold them
    into running stats."""

    def __init__(
        self,
        x: jax.Array,
        mode: str,
        collector: Optional[dict] = None,
        prefix: str = "",
    ):
        self.mode = mode
        self.collector = collector
        self.prefix = prefix
        n = x.shape[0] * x.shape[1] * x.shape[2]
        self.correction = n / max(n - 1, 1)  # biased→unbiased for running stats
        if mode == "batch":
            self.mean, self.var = _stats(x)
        else:
            self.mean = self.var = None  # running mode reads per-layer params

    def append(self, f: jax.Array):
        if self.mode == "batch":
            m, v = _stats(f)
            self.mean = jnp.concatenate([self.mean, m])
            self.var = jnp.concatenate([self.var, v])

    def _record(self, name: str, mean, var, n_channels: int):
        if self.collector is not None:
            # torch folds the *unbiased* batch variance into running stats
            # (matches nn.layers.batch_norm's capture)
            self.collector[f"{self.prefix}{name}"] = (
                mean[:n_channels],
                var[:n_channels] * self.correction,
            )

    def fold(self, norm: dict, dtype, name: Optional[str] = None):
        if self.mode == "batch":
            if name is not None:
                self._record(name, self.mean, self.var, norm["scale"].shape[0])
            return _fold(norm, self.mean, self.var, dtype)
        return _fold(norm, norm["mean"], norm["var"], dtype)


def _dense_layer_fast(
    lp: dict, x: jax.Array, stats: _SegStats, name: str = "", remat: bool = False
) -> jax.Array:
    a1, b1 = stats.fold(lp["norm1"], x.dtype, f"{name}.norm1" if name else None)
    mode = stats.mode

    # the heavy compute is a pure core (its batch statistics are returned,
    # not written through the collector closure) so it can be wrapped in
    # jax.checkpoint: under remat the backward stores only the layer inputs
    # (the concat, which is a residual anyway) and recomputes t/h/g — the
    # structured high-res memory lever (layer-level, vs wholesale remat
    # whose backward peak still equals the full unremat backward)
    def core(lp_, x_, a1_, b1_):
        t = relu(x_ * a1_ + b1_)
        h = conv2d(lp_["conv1"], t, padding=0)
        if mode == "batch":
            m2, v2 = _stats(h)
            a2, b2 = _fold(lp_["norm2"], m2, v2, x_.dtype)
        else:
            m2 = v2 = ()
            a2, b2 = _fold(lp_["norm2"], lp_["norm2"]["mean"], lp_["norm2"]["var"], x_.dtype)
        g = relu(h * a2 + b2)
        return conv2d(lp_["conv2"], g, padding=1), (m2, v2)

    if remat:
        core = jax.checkpoint(core)
    f, (m2, v2) = core(lp, x, a1, b1)
    if mode == "batch" and name and stats.collector is not None:
        stats.collector[f"{stats.prefix}{name}.norm2"] = (m2, v2 * stats.correction)
    return f


def _dense_block_fast(
    params: dict, x: jax.Array, stats: _SegStats, remat: bool = False
) -> Tuple[jax.Array, _SegStats]:
    for i in range(len(params)):
        name = f"denselayer{i + 1}"
        f = _dense_layer_fast(params[name], x, stats, name, remat=remat)
        stats.append(f)
        x = jnp.concatenate([x, f], axis=-1)
    return x, stats


def _enc_stage(
    bp: dict,
    tp: dict,
    xin: jax.Array,
    mode: str,
    prefix_block: str,
    prefix_trans: str,
    capture: bool,
    remat: "bool | str",
) -> Tuple[jax.Array, dict]:
    """One encoder stage (dense block + transition) as a pure function whose
    batch statistics are explicit pytree outputs (a local collector dict),
    so the whole stage can sit under an outer jax.checkpoint. Nested with
    the per-layer checkpoints inside, the backward stores only STAGE inputs
    and rematerialises one block's concats at a time — the stored-concat
    term (≈13 GB @1536² across the three blocks) drops to the largest
    single block's."""

    def core(bp_, tp_, xin_):
        col = {} if capture else None
        s = _SegStats(xin_, mode, col, prefix_block)
        xo, s = _dense_block_fast(bp_, xin_, s, remat=bool(remat))
        s.prefix = prefix_trans
        xo = _transition_fast(tp_, xo, s)
        return xo, (col if col is not None else {})

    if remat == "stages":
        core = jax.checkpoint(core)
    return core(bp, tp, xin)


def _dec_stage(pb: dict, pt: dict, v: jax.Array, remat: bool) -> jax.Array:
    """Decoder bottleneck+transition at full/half resolution — checkpointed
    under remat (its activations are the largest of the backward pass)."""

    def core(pb_, pt_, v_):
        y = bottleneck_apply(pb_, v_, use_bn=False)
        return transition_apply(pt_, y, resize="up2", use_bn=False)

    if remat:
        core = jax.checkpoint(core)
    return core(pb, pt, v)


def _transition_fast(params: dict, x: jax.Array, stats: _SegStats) -> jax.Array:
    a, b = stats.fold(params["norm"], x.dtype, "norm")
    # 1×1 conv and 2×2 avg-pool are both linear and act on disjoint axes —
    # they commute exactly; pooling first quarters the conv's FLOPs
    h = avg_pool(relu(x * a + b), 2)
    return conv2d(params["conv"], h, padding=0)


def _stem(params: dict, x: jax.Array) -> jax.Array:
    """conv_refin1 with the input and kernel zero-padded 3→8 channels."""
    k = params["conv_refin1"]["kernel"]  # (3,3,3,64)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    y = jax.lax.conv_general_dilated(
        xp, kp.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return relu(y + params["conv_refin1"]["bias"].astype(y.dtype))


def apply(
    params: dict,
    x: jax.Array,
    bn_mode: str = "batch",
    stats_out: Optional[dict] = None,
    remat=False,
) -> jax.Array:
    """Optimised FDGAN forward; same outputs as fdgan.apply (fp tolerance).
    ``stats_out`` captures per-BN batch statistics under the same paths as
    fdgan.apply, for the train step's running-stat folding.

    ``remat`` (False | True | "stages") — structured rematerialisation,
    values identical in all modes. True checkpoints every dense layer and
    decoder stage (fits 4@1024² training on one v5e, 6 % faster than a
    wholesale wrap); "stages" additionally checkpoints each encoder
    block+transition, so the backward stores one block's concats at a time
    (fits 1@1536²; ~13 % slower at 1024² — use only when memory demands)."""
    if remat not in (False, True, "stages"):
        raise ValueError(f"remat must be False, True or 'stages'; got {remat!r}")
    x0 = _stem(params, x)
    x01 = conv2d(params["conv_refin2"], avg_pool(x0, 2), padding=0)

    capture = stats_out is not None and bn_mode == "batch"

    x1, col1 = _enc_stage(
        params["dense_block1"], params["trans_block1"], x0,
        bn_mode, "dense_block1.", "trans_block1.", capture, remat,
    )
    x10 = conv2d(params["conv_refine4"], jnp.concatenate([x01, x1], axis=-1), padding=1)
    x2, col2 = _enc_stage(
        params["dense_block2"], params["trans_block2"], x10,
        bn_mode, "dense_block2.", "trans_block2.", capture, remat,
    )
    x3, col3 = _enc_stage(
        params["dense_block3"], params["trans_block3"], x2,
        bn_mode, "dense_block3.", "trans_block3.", capture, remat,
    )
    if capture:
        stats_out.update(col1)
        stats_out.update(col2)
        stats_out.update(col3)
    x22 = conv2d(params["conv_refin5"], avg_pool(x2, 2), padding=0)

    x4 = conv2d(params["conv_refin6"], jnp.concatenate([x3, x22], axis=-1), padding=1)
    x4 = _dec_stage(params["dense_block4"], params["trans_block4"], x4, bool(remat))

    x42 = jnp.concatenate([x4, x2], axis=-1)
    x5 = _dec_stage(params["dense_block5"], params["trans_block5"], x42, bool(remat))

    x6 = _dec_stage(params["dense_block6"], params["trans_block6"], x5, bool(remat))

    return tanh(conv2d(params["conv_refin3"], x6, padding=1))
