"""Convert between per-layer and scan-stacked parameter layouts.

Models expose ``scan_layers=True`` for O(1)-in-depth compile time: the N
encoder blocks become one ``nn.scan``-ned block whose parameters carry a
leading layer axis. Reference-format checkpoints (one subtree per
``EncoderBlock_i``) convert losslessly in both directions with these
helpers, so drop-in compatibility is preserved.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp


def _layer_index(name: str, prefix: str):
    match = re.fullmatch(re.escape(prefix) + r'_(\d+)', name)
    return int(match.group(1)) if match else None


def stack_layer_params(params: Dict[str, Any], prefix: str = 'EncoderBlock',
                       stacked_name: str = None) -> Dict[str, Any]:
    """{prefix_0: t0, prefix_1: t1, ...} -> {stacked_name: stack([t0, t1])}.

    Non-matching entries pass through unchanged. Works on any subtree level
    (apply to the parent dict holding the numbered blocks).
    """
    stacked_name = stacked_name or prefix
    layers = {}
    out = {}
    for name, subtree in params.items():
        idx = _layer_index(name, prefix)
        if idx is None:
            out[name] = subtree
        else:
            layers[idx] = subtree
    if layers:
        ordered = [layers[i] for i in range(len(layers))]
        out[stacked_name] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *ordered)
    return out


def unstack_layer_params(params: Dict[str, Any],
                         stacked_name: str = 'EncoderBlock',
                         prefix: str = None) -> Dict[str, Any]:
    """Inverse of :func:`stack_layer_params`."""
    prefix = prefix or stacked_name
    out = {}
    for name, subtree in params.items():
        if name != stacked_name:
            out[name] = subtree
            continue
        num_layers = jax.tree_util.tree_leaves(subtree)[0].shape[0]
        for i in range(num_layers):
            out[f'{prefix}_{i}'] = jax.tree_util.tree_map(
                lambda leaf, i=i: leaf[i], subtree)
    return out
