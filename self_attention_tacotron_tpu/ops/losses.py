"""Masked losses and regularization.

Parity targets: @tacotron2's ``codes_loss`` / ``binary_loss`` /
``classification_loss`` as consumed by the reference
(reference: models/models.py:159-173) and the blacklist L2 regularizer
(reference: modules/regularizers.py:11-18).

Reduction semantics mirror ``tf.losses.*`` SUM_BY_NONZERO_WEIGHTS: the masked
sum divided by the number of (broadcast) elements with nonzero weight.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import jax
import jax.numpy as jnp


def _masked_mean(per_element: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``per_element`` (B, T, C) under mask (B, T) broadcast over C."""
    if mask.ndim == per_element.ndim - 1:
        mask = mask[..., None]
    weighted = per_element * mask
    denom = jnp.sum(mask) * (per_element.size / mask.size)
    return jnp.sum(weighted) / jnp.maximum(denom, 1.0)


def spec_loss(output: jax.Array, targets: jax.Array, mask: jax.Array,
              loss_type: str = "l1") -> jax.Array:
    """Masked L1/MSE over spectrogram or code-logit frames.

    Parity: @tacotron2 codes_loss (reference call: models/models.py:159).
    """
    if loss_type == "l1":
        per = jnp.abs(output - targets)
    elif loss_type == "mse":
        per = jnp.square(output - targets)
    else:
        raise ValueError(f"Unknown loss type: {loss_type}")
    return _masked_mean(per, mask)


codes_loss = spec_loss


def binary_loss(stop_token_logits: jax.Array, done: jax.Array,
                mask: jax.Array) -> jax.Array:
    """Masked sigmoid cross-entropy for the stop token.

    Parity: @tacotron2 binary_loss (reference call: models/models.py:163).
    ``stop_token_logits`` (B, T, 1) or (B, T); ``done``/(B, T) in {0, 1}.
    """
    logits = stop_token_logits.reshape(done.shape)
    ce = jnp.maximum(logits, 0.0) - logits * done + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def classification_loss(logits: jax.Array, onehot_targets: jax.Array,
                        mask: jax.Array) -> jax.Array:
    """Masked softmax cross-entropy over a code vocabulary."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot_targets * logprobs, axis=-1)  # (B, T)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


DEFAULT_L2_BLACKLIST: List[str] = [
    "embedding", "bias", "batch_normalization", "output_projection_wrapper/kernel",
    "lstm_cell", "output_and_stop_token_wrapper/dense/",
    "output_and_stop_token_wrapper/dense_1/", "stop_token_projection/kernel",
]


def l2_regularization_loss(params, weight: float,
                           blacklist: Sequence[str] = ()) -> jax.Array:
    """weight * sum over non-blacklisted params of sum(v^2)/2.

    ``blacklist`` entries are substring-matched against the '/'-joined
    parameter path (reference: modules/regularizers.py:11-18; blacklist at
    models/models.py:165-168).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()
        if any(b.lower() in name for b in blacklist):
            continue
        total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return weight * total


def global_norm_clip(grads, max_norm: float = 1.0):
    """tf.clip_by_global_norm semantics (reference: models/models.py:184)."""
    leaves = jax.tree_util.tree_leaves(grads)
    global_norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = max_norm / jnp.maximum(global_norm, max_norm)
    return jax.tree_util.tree_map(lambda g: g * scale, grads), global_norm


def noam_learning_rate(init_rate: float, global_step: jax.Array,
                       step_factor: int = 1,
                       warmup_steps: float = 4000.0) -> jax.Array:
    """Noam-style warmup decay (reference: models/models.py:283-287)."""
    step = jnp.asarray(global_step * step_factor + 1, dtype=jnp.float32)
    return init_rate * warmup_steps ** 0.5 * jnp.minimum(
        step * warmup_steps ** -1.5, step ** -0.5)
