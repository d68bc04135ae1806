"""Batched on-device mixup / cutmix.

Device-side equivalents of the reference's tf.data batch augmentations
(reference: data/preprocess/augment_ops.py:52-181 and
augment_utils.py:85-136): per-example Beta-distributed mix weights, a
shuffled partner for mixup and a box mask against the reversed batch for
cutmix, with a stateless branch select between them.

Outputs use the trainer batch schema (reference: train.py:84-87):
``labels`` stays integer, plus ``mix_labels`` (partner labels) and ``ratio``
(per-example weight of the original label); the loss blends one-hots. Uses a
true Beta sampler where the reference approximated one
(augment_ops.py:128-131,175).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mixup(rng: jax.Array, images: jax.Array, labels: jax.Array,
          alpha: float = 0.8) -> Dict[str, jax.Array]:
    """Per-example convex blend with a shuffled partner; ratio >= 0.5."""
    rng_beta, rng_perm = jax.random.split(rng)
    batch = images.shape[0]
    mix = jax.random.beta(rng_beta, alpha, alpha, (batch,))
    mix = jnp.maximum(mix, 1.0 - mix)
    index = jax.random.permutation(rng_perm, batch)
    partner = images[index]
    mixed = (images * mix[:, None, None, None]
             + partner * (1.0 - mix)[:, None, None, None])
    return {'images': mixed, 'labels': labels,
            'mix_labels': labels[index], 'ratio': mix}


def cutmix(rng: jax.Array, images: jax.Array, labels: jax.Array,
           alpha: float = 1.0) -> Dict[str, jax.Array]:
    """Pastes a box from the reversed batch; ratio = kept area fraction."""
    rng_beta, rng_y, rng_x = jax.random.split(rng, 3)
    batch, height, width = images.shape[0], images.shape[1], images.shape[2]

    # area fraction given to the *partner* inside the box
    cut = jax.random.beta(rng_beta, alpha, alpha, (batch,))
    cut = jnp.minimum(cut, 1.0 - cut)  # partner share <= 1/2
    ratio = 1.0 - cut

    side = jnp.sqrt(cut)
    box_h = (side * height).astype(jnp.int32)
    box_w = (side * width).astype(jnp.int32)
    y0 = jax.random.randint(rng_y, (batch,), 0, height)
    x0 = jax.random.randint(rng_x, (batch,), 0, width)
    y0 = jnp.minimum(y0, height - box_h)
    x0 = jnp.minimum(x0, width - box_w)

    yy = jax.lax.broadcasted_iota(jnp.int32, (batch, height, width), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (batch, height, width), 2)
    in_box = ((yy >= y0[:, None, None]) & (yy < (y0 + box_h)[:, None, None]) &
              (xx >= x0[:, None, None]) & (xx < (x0 + box_w)[:, None, None]))

    partner = images[::-1]
    mixed = jnp.where(in_box[..., None], partner, images)
    # recompute the exact pasted area (clipping can shrink the box)
    actual = jnp.mean(in_box.astype(jnp.float32), axis=(1, 2))
    ratio = 1.0 - actual
    del cut
    return {'images': mixed, 'labels': labels,
            'mix_labels': labels[::-1], 'ratio': ratio}


def mix_augment(rng: jax.Array, images: jax.Array, labels: jax.Array,
                mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                prob_to_apply: float = 1.0) -> Dict[str, jax.Array]:
    """Randomly applies mixup OR cutmix (50/50), with an apply gate."""
    rng_branch, rng_apply, rng_mix, rng_cut = jax.random.split(rng, 4)

    branches = []
    if mixup_alpha:
        branches.append(lambda: mixup(rng_mix, images, labels, mixup_alpha))
    if cutmix_alpha:
        branches.append(lambda: cutmix(rng_cut, images, labels,
                                       cutmix_alpha))
    if not branches:
        return {'images': images, 'labels': labels}

    use_first = jax.random.bernoulli(rng_branch, 1.0 / len(branches))
    out = branches[0]()
    if len(branches) == 2:
        alt = branches[1]()
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                use_first.reshape((1,) * a.ndim), a, b), out, alt)

    if prob_to_apply < 1.0:
        take = jax.random.bernoulli(rng_apply, prob_to_apply)
        identity = {'images': images, 'labels': labels,
                    'mix_labels': labels, 'ratio': jnp.ones(labels.shape[0])}
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take.reshape((1,) * a.ndim), a, b),
            out, identity)
    return out
