"""Classification metrics (top-k accuracy), computed on device.

Covers the reference's ``utils.topk_correct`` capability (reference:
utils.py:20-37) with a TPU-friendly formulation: ``jax.lax.top_k`` instead of
a full argsort + per-row isin vmap.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def topk_correct(logits: jax.Array,
                 labels: jax.Array,
                 mask: Optional[jax.Array] = None,
                 prefix: str = '',
                 topk: Tuple[int, ...] = (1, 5)) -> Dict[str, jax.Array]:
    """Per-example 0/1 correctness for each k in ``topk``.

    Args:
      logits: ``[batch, num_classes]``.
      labels: ``[batch]`` integer labels.
      mask: optional ``[batch]`` validity mask.
    """
    num_classes = logits.shape[-1]
    max_k = min(max(topk), num_classes)   # k may exceed tiny class counts
    _, pred = jax.lax.top_k(logits, max_k)  # [batch, max_k], best first
    hits = (pred == labels[..., None].astype(pred.dtype))
    metrics = {}
    for k in topk:
        correct = hits[..., :min(k, num_classes)].any(
            axis=-1).astype(jnp.float32)
        if mask is not None:
            correct = correct * mask
        metrics[f'{prefix}top_{k}_acc'] = correct
    return metrics
