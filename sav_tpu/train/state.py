"""Train state and optimizer construction.

The optimizer chain matches the reference recipe (reference: train.py:25-27):
global-norm clip -> Adam scaling -> additive weight decay -> LR schedule —
with the reference's sign bug fixed (its schedule scaling was positive, which
ascends the loss; simple_train.py:25-27 used the correct negative scale).

Unlike the reference TrainState, batch statistics are first-class state:
the reference dropped BatchNorm updates on the floor (train.py:82 applies
with raw params and no ``mutable=``), which silently broke CvT/CeiT/BoTNet
training (SURVEY §7 hard part 3).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import optax


def build_optimizer(
    learning_rate: Callable[[int], float] | float,
    weight_decay: float = 1e-4,
    clip_grad: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """Reference-recipe optimizer: clip | adam | weight decay | -lr.

    ``mu_dtype='bfloat16'`` stores the first Adam moment in bf16 (params and
    the second moment stay f32): for ViT-B that frees ~172 MB of HBM for
    activations — i.e. larger batches — at negligible quality cost (the
    first moment is a smooth EMA; the variance term, which sets the update
    scale, keeps full precision).
    """
    parts = []
    if clip_grad is not None:
        parts.append(optax.clip_by_global_norm(clip_grad))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                     mu_dtype=mu_dtype))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if callable(learning_rate):
        parts.append(optax.scale_by_schedule(
            lambda step: -learning_rate(step)))
    else:
        parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def warmup_cosine_schedule(base_lr: float,
                           batch_size: int,
                           steps_per_epoch: int,
                           warmup_epochs: int = 5,
                           decay_epochs: int = 30,
                           end_value: float = 1e-5):
    """Linear-scaled warmup-cosine schedule (reference: train.py:214-220)."""
    peak = base_lr * (batch_size / 512)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak,
        warmup_steps=warmup_epochs * steps_per_epoch,
        decay_steps=decay_epochs * steps_per_epoch,
        end_value=end_value)


def warmup_stable_decay_schedule(peak_lr: float,
                                 total_steps: int,
                                 warmup_steps: int,
                                 decay_steps: int,
                                 end_value: float = 1e-5):
    """WSD: linear warmup -> constant plateau -> linear decay to end_value.

    Unlike cosine, the plateau makes intermediate checkpoints directly
    comparable and the decay phase can be re-run from any plateau checkpoint
    (extension beyond the reference's cosine-only recipe, train.py:214-220).
    """
    stable_steps = max(0, total_steps - warmup_steps - decay_steps)
    return optax.join_schedules([
        optax.linear_schedule(0.0, peak_lr, warmup_steps),
        optax.constant_schedule(peak_lr),
        optax.linear_schedule(peak_lr, end_value, decay_steps),
    ], boundaries=[warmup_steps, warmup_steps + stable_steps])


class TrainState(flax.struct.PyTreeNode):
    """Pure pytree of everything a train step updates.

    ``ema_params`` (optional) is an exponential moving average of the
    parameters, updated after every optimizer step and usable for evaluation
    — a standard ingredient of the DeiT-style recipe the reference targets
    but never implemented (reference has no EMA anywhere).
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation,
               ema: bool = False):
        params = variables['params']
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=variables.get('batch_stats', {}),
            opt_state=tx.init(params),
            # genuine copies: aliasing the param buffers would donate the
            # same buffer twice in donated train steps (observed deadlock in
            # the CPU collective executor)
            ema_params=jax.tree_util.tree_map(jax.numpy.copy, params)
            if ema else None,
        )

    def variables(self, use_ema: bool = False):
        params = self.params
        if use_ema and self.ema_params is not None:
            params = self.ema_params
        v = {'params': params}
        if self.batch_stats:
            v['batch_stats'] = self.batch_stats
        return v

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats=None, ema_decay=None):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema_params = self.ema_params
        if ema_params is not None and ema_decay is not None:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype)
                * (1.0 - ema_decay),
                ema_params, params)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
            opt_state=opt_state,
            ema_params=ema_params)
