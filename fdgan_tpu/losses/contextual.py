"""Contextual loss (Mechrez-style CX), parity with the recovered
``ContextualLoss`` in the reference's orphaned ``loss.cpython-36.pyc``
(SURVEY.md §2.9 #20; pyc lines 23-73).

Recovered semantics with defaults sigma=0.1, b=1.0, epsilon=1e-5,
similarity='cos':

* cos_similarity (pyc 31-44): mean-centre target features, L2-normalise
  both sets, distance d = 1 − ⟨î, t̂⟩
* relative_distances (pyc 49-51): d̃ = d / (min_row d + ε)
* weighted_average_distances (pyc 53-57): w = exp((b − d̃)/σ), row-normalised
* CX (pyc 59-68): −log(mean(max w)) averaged over the batch
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def contextual_loss(
    image_features: jax.Array,
    target_features: jax.Array,
    sigma: float = 0.1,
    b: float = 1.0,
    epsilon: float = 1e-5,
) -> jax.Array:
    """CX loss between two NHWC feature maps (each position is a C-vector).

    Quadratic in H·W — intended for downsampled VGG features, as in the
    reference usage.
    """
    B, H, W, C = image_features.shape
    i_feat = image_features.reshape(B, H * W, C).astype(jnp.float32)
    t_feat = target_features.reshape(B, H * W, C).astype(jnp.float32)

    # mean-centre by the target's per-sample channel mean
    t_mean = jnp.mean(t_feat, axis=1, keepdims=True)
    i_cent = i_feat - t_mean
    t_cent = t_feat - t_mean

    i_norm = i_cent / (jnp.linalg.norm(i_cent, axis=-1, keepdims=True) + 1e-12)
    t_norm = t_cent / (jnp.linalg.norm(t_cent, axis=-1, keepdims=True) + 1e-12)

    # cosine distance matrix (B, N_img, N_tgt)
    d = 1.0 - jnp.einsum("bnc,bmc->bnm", i_norm, t_norm)

    # relative distances: normalise each image-position row by its min
    d_min = jnp.min(d, axis=2, keepdims=True)
    d_tilde = d / (d_min + epsilon)

    # softmax-like affinity, row-normalised
    w = jnp.exp((b - d_tilde) / sigma)
    cx_ij = w / jnp.sum(w, axis=2, keepdims=True)

    # for each target position take the best-matching image position
    cx = jnp.mean(jnp.max(cx_ij, axis=1), axis=1)
    return jnp.mean(-jnp.log(cx + 1e-12))
