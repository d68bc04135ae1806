"""Fine-tuning: load pretrained params into a different model geometry.

The reference has no fine-tune path at all — its train.py always starts
from random init and never restores (SURVEY §5) — yet its zoo is built
around the pretrain@224 → finetune@384 ViT workflow (the @384 table rows
in every paper the reference reimplements). This module supplies the two
adaptations that workflow needs:

- **Head re-initialisation** when ``num_classes`` changes (transfer to a
  new label set): the classifier Dense keeps the *target* init (zeros,
  matching every model's ``kernel_init=nn.initializers.zeros`` head).
- **Learned position-embedding interpolation** when the token grid
  changes (resolution transfer): bilinear resize over the 2-D patch
  grid, the standard ViT practice (Dosovitskiy et al., app. B.5); the
  cls prefix token, when present, is carried through unchanged. BoTNet's
  1-D relative-position tables are linearly resampled the same way.

Everything else must match exactly; mismatches outside these two
categories raise with the offending path (e.g. MLP-Mixer's token-mixing
Dense is resolution-bound by construction — there is no principled
interpolation, so we refuse rather than guess).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

# Param names produced by AddAbsPosEmbed / BoTNet's relative attention.
_POS_EMBED = 'pos_embed'
_REL_POS = ('rel_pos_emb_w', 'rel_pos_emb_h')


def _square_grid(n: int) -> int | None:
    root = math.isqrt(n)
    return root if root * root == n else None


def _split_prefix(src_len: int, dst_len: int) -> Tuple[int, int, int]:
    """Finds (prefix, src_grid, dst_grid) such that both token counts are
    ``prefix + grid**2`` for the same prefix (0 = no cls token, 1 = cls
    prepended before the embedding, as in ViT/TNT outer)."""
    for prefix in (0, 1):
        src_g = _square_grid(src_len - prefix)
        dst_g = _square_grid(dst_len - prefix)
        if src_g and dst_g:
            return prefix, src_g, dst_g
    raise ValueError(
        f'cannot infer square token grids for pos-embed interpolation '
        f'({src_len} -> {dst_len} tokens; neither a bare nor a '
        f'cls-prefixed length is a perfect square for both)')


def interpolate_pos_embed(pos_embed: jax.Array, target_len: int) -> jax.Array:
    """Resizes a learned ``[1, L, D]`` embedding to ``[1, target_len, D]``.

    Bilinear interpolation over the square patch grid in float32; an
    optional single prefix (cls) token is preserved verbatim.
    """
    assert pos_embed.ndim == 3 and pos_embed.shape[0] == 1, pos_embed.shape
    src_len, dim = pos_embed.shape[1], pos_embed.shape[2]
    if src_len == target_len:
        return pos_embed
    prefix, src_g, dst_g = _split_prefix(src_len, target_len)
    head = pos_embed[:, :prefix]
    grid = pos_embed[:, prefix:].astype(jnp.float32)
    grid = grid.reshape(1, src_g, src_g, dim)
    grid = jax.image.resize(grid, (1, dst_g, dst_g, dim), method='bilinear')
    grid = grid.reshape(1, dst_g * dst_g, dim)
    return jnp.concatenate([head.astype(jnp.float32), grid],
                           axis=1).astype(pos_embed.dtype)


def interpolate_rel_pos_embed(table: jax.Array, target_len: int) -> jax.Array:
    """Linearly resamples a ``[2W-1, d]`` relative-position table along its
    position axis (BoTNet, models/botnet.py rel_pos_emb_{w,h})."""
    assert table.ndim == 2, table.shape
    if table.shape[0] == target_len:
        return table
    out = jax.image.resize(table.astype(jnp.float32),
                           (target_len, table.shape[1]), method='linear')
    return out.astype(table.dtype)


def adapt_tree(restored: Any, target: Any,
               collection: str = 'params',
               allow_head_reinit: bool = True) -> Tuple[Any, List[str]]:
    """Fills the target-shaped tree from restored leaves.

    Returns ``(tree, report)`` where report lists every adapted leaf.
    Raises ValueError on structural mismatch or unadaptable shape changes.
    ``allow_head_reinit=False`` (the inference mode) additionally refuses
    classifier-width changes — re-initialising a head is a fine-tune
    start, not something eval/serving can recover from.
    """
    rflat = traverse_util.flatten_dict(restored or {})
    tflat = traverse_util.flatten_dict(target or {})
    if rflat.keys() != tflat.keys():
        missing = sorted('/'.join(k) for k in tflat.keys() - rflat.keys())
        extra = sorted('/'.join(k) for k in rflat.keys() - tflat.keys())
        raise ValueError(
            f'checkpoint {collection} tree does not match the model: '
            f'missing {missing[:5]}, unexpected {extra[:5]} '
            f'(same model family / scan_layers layout required)')
    out: Dict[Tuple[str, ...], Any] = {}
    report: List[str] = []
    for key, tleaf in tflat.items():
        rleaf = rflat[key]
        path = '/'.join(key)
        if tuple(rleaf.shape) == tuple(tleaf.shape):
            out[key] = jnp.asarray(rleaf, dtype=tleaf.dtype)
            continue
        if (key[-1] == _POS_EMBED and rleaf.ndim == 3
                and rleaf.shape[2] == tleaf.shape[2]):
            out[key] = interpolate_pos_embed(jnp.asarray(rleaf),
                                             tleaf.shape[1])
            report.append(f'{path}: pos-embed interpolated '
                          f'{rleaf.shape[1]} -> {tleaf.shape[1]} tokens')
            continue
        if (key[-1] in _REL_POS and rleaf.ndim == 2
                and rleaf.shape[1] == tleaf.shape[1]):
            out[key] = interpolate_rel_pos_embed(jnp.asarray(rleaf),
                                                 tleaf.shape[0])
            report.append(f'{path}: rel-pos table resampled '
                          f'{rleaf.shape[0]} -> {tleaf.shape[0]}')
            continue
        if (rleaf.shape[:-1] == tleaf.shape[:-1]
                and key[-1] in ('kernel', 'bias')
                and len(key) == 2 and key[-2].startswith('Dense')):
            if not allow_head_reinit:
                raise ValueError(
                    f'checkpoint head is {rleaf.shape[-1]}-way but the '
                    f'model was built for {tleaf.shape[-1]} classes; pass '
                    f'the matching --num_classes (head re-init is a '
                    f'--finetune_from workflow, not an eval/serving one)')
            # classifier head with a new label count (every model's head is
            # a root-level Dense; depth-2 only, so an interior FF Dense can
            # never be silently re-initialised): keep the target init
            out[key] = tleaf
            report.append(f'{path}: head re-initialised for '
                          f'{tleaf.shape[-1]} classes')
            continue
        raise ValueError(
            f'cannot adapt {collection} leaf {path}: checkpoint shape '
            f'{tuple(rleaf.shape)} vs model {tuple(tleaf.shape)} — only '
            f'pos-embed grids, BoTNet rel-pos tables, and the classifier '
            f'head may differ (is this a resolution-bound layer, e.g. '
            f"MLP-Mixer's token-mixing Dense?)")
    return traverse_util.unflatten_dict(out), report


def adapt_restored_for_inference(model, restored: Dict[str, Any],
                                 img_size: int) -> Tuple[Dict[str, Any],
                                                         List[str]]:
    """Resolution-adapts a template-free inference restore in place of the
    serving geometry (``predict.py --img_size`` / ``evaluate.py`` at a
    resolution other than the checkpoint's): pos-embed grids and BoTNet
    rel-pos tables interpolate, everything else — including the classifier
    head — must match exactly.

    Target shapes come from ``jax.eval_shape`` (no compile, no memory);
    when every shape already matches, the restore is returned untouched.
    Returns ``(restored, report)``.
    """
    target = jax.eval_shape(
        lambda rng, x: model.init(rng, x, is_training=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32))

    def shapes(tree):
        return [tuple(leaf.shape)
                for leaf in jax.tree_util.tree_leaves(tree)]

    report: List[str] = []
    out = dict(restored)
    for collection, key in (('params', 'params'),
                            ('params', 'ema_params'),
                            ('batch_stats', 'batch_stats')):
        source = restored.get(key)
        if not source or collection not in target:
            continue
        if shapes(source) == shapes(target[collection]):
            continue
        adapted, rep = adapt_tree(source, target[collection], collection,
                                  allow_head_reinit=False)
        out[key] = adapted
        report += [f'{key}/{line}' for line in rep]
    return out, report


def load_pretrained(checkpoint_dir: str, target_params: Any,
                    target_batch_stats: Any = None, step: int | None = None,
                    use_ema: bool = False) -> Tuple[Any, Any, List[str]]:
    """Loads a checkpoint and adapts it to the target geometry.

    Returns ``(params, batch_stats, report)``. ``use_ema=True`` prefers the
    checkpoint's EMA parameters (the eval-grade weights) when present.
    """
    from sav_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(checkpoint_dir)
    try:
        restored = ckpt.restore_for_inference(step=step)
    finally:
        ckpt.close()
    if restored is None:
        raise ValueError(f'no checkpoint found in {checkpoint_dir}')
    source = restored['params']
    if use_ema and restored.get('ema_params') is not None:
        source = restored['ema_params']
    params, report = adapt_tree(source, target_params, 'params')
    batch_stats = target_batch_stats
    if target_batch_stats:
        batch_stats, bs_report = adapt_tree(restored.get('batch_stats') or {},
                                            target_batch_stats, 'batch_stats')
        report += bs_report
    return params, batch_stats, report
