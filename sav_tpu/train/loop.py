"""Training orchestration: config, metric logging, and the train loop.

Covers the reference's two entry-point loops (reference: train.py:191-255,
simple_train.py:130-173) with the gaps closed: restore-on-start, metric
transfer outside the compiled step (the reference logged from *inside* its
pmapped fn, train.py:102-107), throughput counters, and optional profiler
traces (the reference had none — SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from sav_tpu.data.synthetic import SyntheticDataset
from sav_tpu.models import create_model
from sav_tpu.parallel.mesh import create_mesh, maybe_initialize_distributed
from sav_tpu.train import steps as steps_lib
from sav_tpu.train.checkpoint import CheckpointManager
from sav_tpu.train.state import (TrainState, build_optimizer,
                                 warmup_cosine_schedule,
                                 warmup_stable_decay_schedule)

IMAGENET_TRAIN_IMAGES = 1_281_167


@dataclasses.dataclass
class TrainConfig:
    """Typed training configuration (field names mirror the reference CLI,
    reference: train.py:130-190)."""

    model_name: str = 'vit_b_patch16'
    img_size: int = 224
    num_epochs: int = 300
    batch_size: int = 32
    label_smoothing: float = 0.1
    augmentation: str = 'cutmix_mixup_randaugment_405'
    lr: float = 5e-4
    weight_decay: float = 1e-4
    clip_grad: Optional[float] = None
    checkpoint_dir: Optional[str] = None
    seed: int = 42
    # Extensions beyond the reference CLI:
    num_classes: int = 1000
    dtype: str = 'bfloat16'
    dataset: str = 'synthetic'
    # Separate eval source (reference evaluates imagenet_v2 while training
    # on imagenet2012, data/input_pipeline.py:109-117). When None and
    # `dataset` is a single real source, `holdout_fraction` of it is held
    # out for eval (disjoint permutation split) so eval never scores
    # training images; tfds: sources use their own validation/test split.
    eval_dataset: Optional[str] = None
    holdout_fraction: float = 0.05      # 0 disables the implicit holdout
    images_per_epoch: int = IMAGENET_TRAIN_IMAGES
    total_steps: Optional[int] = None       # overrides epoch math if set
    model_parallelism: int = 1
    # GPipe stages over the 'pipe' mesh axis (parallel.pipeline); needs
    # scan_layers=True (the stacked layer axis IS the stage shard) and a
    # dropout-free config. 1 = off.
    pipeline_parallelism: int = 1
    pipeline_microbatches: int = 4      # bubble = (S-1)/(M+S-1)
    # False | True/'full' | 'dots' | 'dots_no_batch' (steps.REMAT_POLICIES)
    remat: Union[bool, str] = False
    mu_dtype: Optional[str] = None      # e.g. 'bfloat16' first Adam moment
    ema_decay: Optional[float] = None   # params EMA; eval uses the average
    schedule: str = 'cosine'            # 'cosine' | 'wsd'
    # Checkpoint dir to fine-tune from (fresh optimizer/schedule; head
    # re-init on class-count change, pos-embed interpolation on resolution
    # change — train/finetune.py). A resumable checkpoint in
    # `checkpoint_dir` takes precedence so preempted fine-tunes continue.
    finetune_from: Optional[str] = None
    finetune_use_ema: bool = False      # start from the checkpoint's EMA
    pos_embed: str = 'learned'          # learned | fixed | rotary (ViT)
    # int8 QAT modes (ViT): False | 'int8' (per-matmul forward) | 'ff'
    # (whole-FF Pallas kernel, measured faster than bf16 — int8_ff.py)
    quantized: Union[bool, str] = False
    # >1 accumulates gradients over that many microbatches per optimizer
    # step (1/N activation memory at the same effective batch)
    grad_accum: int = 1
    scan_layers: bool = False           # nn.scan over encoder depth
    steps_per_dispatch: int = 1         # chain N steps per device dispatch
    # chunks decoded ahead of the consuming dispatch (chained-host loop):
    # depth 1 is classic next-chunk prefetch; deeper keeps the loader
    # feeding the device ring while earlier dispatches drain, smoothing
    # decode-time variance at the cost of depth x chunk host memory
    prefetch_chunks: int = 2
    data_workers: int = 0               # Grain worker processes (0 = in-proc)
    log_every: int = 100
    eval_every_epochs: int = 5
    checkpoint_every_epochs: int = 10
    # None = the full eval split for finite sources (reference pads up to
    # the whole split, input_pipeline.py:360-376); infinite sources fall
    # back to 16 batches
    eval_batches: Optional[int] = None
    profile_steps: Optional[tuple] = None   # (start_step, stop_step)
    profile_dir: str = '/tmp/sav_tpu_profile'

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.images_per_epoch // self.batch_size)

    @property
    def steps_total(self) -> int:
        if self.total_steps is not None:
            return self.total_steps
        return self.steps_per_epoch * self.num_epochs


class MetricLogger:
    """Host-side scalar logger; wandb-compatible if wandb is importable."""

    def __init__(self, use_wandb: bool = False, project: str = 'sav_tpu'):
        self._wandb = None
        if use_wandb and jax.process_index() == 0:
            try:
                import wandb  # optional; not installed in all environments
                wandb.init(project=project)
                self._wandb = wandb
            except ImportError:
                logging.warning('wandb requested but not installed')

    def log(self, metrics: Dict[str, Any], step: int):
        if jax.process_index() != 0:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        logging.info('step %d: %s', step,
                     ' '.join(f'{k}={v:.5g}' for k, v in scalars.items()))
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)


class Trainer:
    """Builds the mesh/model/optimizer and runs the sharded training loop."""

    def __init__(self, config: TrainConfig, use_wandb: bool = False):
        self.config = config
        maybe_initialize_distributed()
        if config.pipeline_parallelism > 1 and not config.scan_layers:
            raise ValueError('pipeline_parallelism needs scan_layers=True '
                             '(stage shards are the stacked layer axis)')
        self.mesh = create_mesh(
            model_parallelism=config.model_parallelism,
            pipeline_parallelism=config.pipeline_parallelism,
            hybrid=jax.process_count() > 1)
        model_kwargs = {}
        if config.scan_layers:
            model_kwargs['scan_layers'] = True
        if config.pos_embed != 'learned':
            model_kwargs['pos_embed'] = config.pos_embed
        if config.quantized:
            model_kwargs['quantized'] = config.quantized
        self.model = create_model(config.model_name,
                                  num_classes=config.num_classes,
                                  dtype=jnp.dtype(config.dtype),
                                  **model_kwargs)
        if config.schedule == 'wsd':
            peak = config.lr * (config.batch_size / 512)
            self.schedule = warmup_stable_decay_schedule(
                peak, config.steps_total,
                warmup_steps=5 * config.steps_per_epoch,
                decay_steps=max(1, config.steps_total // 10))
        else:
            self.schedule = warmup_cosine_schedule(
                config.lr, config.batch_size, config.steps_per_epoch)
        self.tx = build_optimizer(self.schedule,
                                  weight_decay=config.weight_decay,
                                  clip_grad=config.clip_grad,
                                  mu_dtype=config.mu_dtype)
        self.logger = MetricLogger(use_wandb=use_wandb)
        self._preempted = False
        self.checkpoints = (CheckpointManager(config.checkpoint_dir)
                            if config.checkpoint_dir else None)

        rng = jax.random.PRNGKey(config.seed)
        self.init_rng, self.step_rng = jax.random.split(rng)

        variables = jax.jit(self.model.init, static_argnames='is_training')(
            {'params': self.init_rng},
            jnp.ones((1, config.img_size, config.img_size, 3)),
            is_training=False)
        state = TrainState.create(variables, self.tx,
                                   ema=config.ema_decay is not None)
        state = steps_lib.shard_state(self.mesh, state)

        restored_step = (self.checkpoints.latest_step()
                         if self.checkpoints is not None else None)
        if restored_step is not None:
            logging.info('restoring checkpoint at step %d', restored_step)
            state = self.checkpoints.restore(state)
        elif config.finetune_from:
            from sav_tpu.train import finetune
            params, batch_stats, report = finetune.load_pretrained(
                config.finetune_from, state.params, state.batch_stats,
                use_ema=config.finetune_use_ema)
            for line in report:
                logging.info('finetune: %s', line)
            logging.info('fine-tuning from %s (%d leaves adapted)',
                         config.finetune_from, len(report))
            state = state.replace(
                params=params, batch_stats=batch_stats,
                ema_params=jax.tree_util.tree_map(jnp.copy, params)
                if state.ema_params is not None else None)
            state = steps_lib.shard_state(self.mesh, state)
        self.state = state

        if config.pipeline_parallelism > 1:
            self.train_step = steps_lib.make_pipeline_train_step(
                self.model, self.tx, self.mesh, state,
                num_classes=config.num_classes,
                label_smoothing=config.label_smoothing,
                num_microbatches=config.pipeline_microbatches,
                ema_decay=config.ema_decay)
            self.eval_step = steps_lib.make_pipeline_eval_step(
                self.model, self.mesh, state,
                num_classes=config.num_classes,
                num_microbatches=config.pipeline_microbatches,
                use_ema=config.ema_decay is not None)
        else:
            self.train_step = steps_lib.make_train_step(
                self.model, self.tx, self.mesh, state,
                num_classes=config.num_classes,
                label_smoothing=config.label_smoothing,
                remat=config.remat, ema_decay=config.ema_decay,
                grad_accum=config.grad_accum)
            self.eval_step = steps_lib.make_eval_step(
                self.model, self.mesh, state,
                num_classes=config.num_classes,
                use_ema=config.ema_decay is not None)

    def _dataset(self, seed_offset: int = 0,
                 training: bool = True) -> SyntheticDataset:
        c = self.config
        name = c.dataset if training else (c.eval_dataset or c.dataset)
        if name == 'synthetic':
            return SyntheticDataset(c.batch_size, c.img_size,
                                    num_classes=c.num_classes,
                                    seed=c.seed + seed_offset,
                                    mesh=self.mesh)
        from sav_tpu.data.pipeline import create_dataset, parse_dataset_spec

        # eval data goes through eval_preprocess (crop_resize) with no
        # augmentation — the reference evaluates a clean split
        # (reference: data/input_pipeline.py:357-377); scoring the model
        # on mixup/RandAugment batches would skew every eval metric.
        split = None
        base, inline = parse_dataset_spec(name)
        if (inline is None and c.eval_dataset is None and c.holdout_fraction
                and not base.startswith('tfds:')):
            # train and eval share one real source with no explicit split:
            # hold out the tail `holdout_fraction` of the fixed permutation
            # for eval — the two slices are disjoint by construction, so
            # eval never scores training images. tfds: sources already get
            # distinct train vs validation/test splits above.
            h = c.holdout_fraction
            split = (('train', 0.0, 1.0 - h) if training
                     else ('holdout', 1.0 - h, 1.0))
            if training:
                logging.info(
                    'no eval_dataset/split given: holding out the last '
                    '%.1f%% of %r for eval', 100 * h, base)
        return create_dataset(name, batch_size=c.batch_size,
                              image_size=c.img_size,
                              num_classes=c.num_classes,
                              seed=c.seed + seed_offset, mesh=self.mesh,
                              augmentation=c.augmentation,
                              training=training,
                              num_workers=c.data_workers, split=split)

    def evaluate(self, dataset,
                 num_batches: Optional[int] = None) -> Dict[str, float]:
        if num_batches is None:
            # full split when the source is finite; infinite (synthetic)
            # sources get a fixed window
            num_batches = getattr(dataset, 'num_batches', None) or 16
        sums = None
        for step in range(num_batches):
            try:
                batch = dataset.batch(step)
            except StopIteration:   # finite eval sources end early
                break
            out = self.eval_step(self.state, batch)
            out = jax.device_get(out)
            sums = out if sums is None else jax.tree_util.tree_map(
                np.add, sums, out)
        if sums is None:
            return {}
        count = max(float(sums.pop('eval_count')), 1.0)
        return {k: float(v) / count for k, v in sums.items()}

    def _save_checkpoint(self, step: int, train_data) -> None:
        data_state = (train_data.get_state()
                      if hasattr(train_data, 'get_state') else None)
        self.checkpoints.save(step, self.state, data_state=data_state)

    def _maybe_restore_data_state(self, train_data, start_step: int) -> None:
        """Seeks the loader to its checkpointed position on resume (O(1) via
        Grain iterator state, instead of replaying start_step batches)."""
        if (self.checkpoints is None or start_step == 0
                or not hasattr(train_data, 'set_state')):
            return
        data_state = self.checkpoints.restore_data_state()
        if data_state is not None:
            train_data.set_state(data_state)

    def run(self) -> Dict[str, float]:
        """Runs the training loop with preemption-safe checkpointing: a
        SIGTERM (the signal TPU-VM maintenance events and most cluster
        schedulers deliver) checkpoints at the next step boundary and
        returns cleanly, so --resume from the same directory continues
        where the preempted run stopped."""
        import signal

        def _on_term(signum, frame):
            self._preempted = True
            logging.warning(
                'received signal %d: checkpointing at the next step '
                'boundary, then exiting', signum)

        old_handler = None
        try:
            old_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:      # not the main thread (e.g. some tests)
            pass
        try:
            return self._run()
        finally:
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)

    def _run(self) -> Dict[str, float]:
        c = self.config
        train_data = self._dataset()
        eval_data = self._dataset(seed_offset=1, training=False)
        start_step = int(jax.device_get(self.state.step))
        self._maybe_restore_data_state(train_data, start_step)
        if c.steps_per_dispatch > 1:
            if c.dataset == 'synthetic':
                return self._run_chained(eval_data)
            return self._run_chained_host(train_data, eval_data)
        steps_per_eval = c.steps_per_epoch * c.eval_every_epochs
        steps_per_ckpt = c.steps_per_epoch * c.checkpoint_every_epochs

        last_metrics: Dict[str, float] = {}
        window_start = time.perf_counter()
        window_images = 0

        for step in range(start_step, c.steps_total):
            if c.profile_steps and step == c.profile_steps[0]:
                jax.profiler.start_trace(c.profile_dir)

            batch = train_data.batch(step)
            self.state, metrics = self.train_step(self.state, batch,
                                                  self.step_rng)
            window_images += c.batch_size

            if c.profile_steps and step == c.profile_steps[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()

            if step % c.log_every == 0 or step == c.steps_total - 1:
                metrics = jax.device_get(metrics)
                elapsed = time.perf_counter() - window_start
                last_metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics['images_per_sec'] = window_images / max(
                    elapsed, 1e-9)
                last_metrics['learning_rate'] = float(self.schedule(step))
                self.logger.log(last_metrics, step)
                window_start = time.perf_counter()
                window_images = 0

            next_step = step + 1
            if self.checkpoints is not None and (
                    (steps_per_ckpt and next_step % steps_per_ckpt == 0)
                    or next_step == c.steps_total or self._preempted):
                self._save_checkpoint(next_step, train_data)

            if ((steps_per_eval and next_step % steps_per_eval == 0)
                    or next_step == c.steps_total):
                eval_metrics = self.evaluate(eval_data, c.eval_batches)
                self.logger.log(eval_metrics, next_step)
                last_metrics.update(eval_metrics)

            if self._preempted:
                break

        if self.checkpoints is not None:
            self.checkpoints.wait()
        return last_metrics

    def _run_chained(self, eval_data) -> Dict[str, float]:
        """Device-resident loop: N steps per dispatch, batches generated on
        device (synthetic source). Zero host round trips between steps."""
        from sav_tpu.data.synthetic import device_batch_fn

        c = self.config
        batch_fn = device_batch_fn(c.batch_size, c.img_size,
                                   num_classes=c.num_classes, seed=c.seed)
        chained = steps_lib.make_chained_train_step(
            self.model, self.tx, self.mesh, self.state, batch_fn,
            steps_per_call=c.steps_per_dispatch,
            num_classes=c.num_classes,
            label_smoothing=c.label_smoothing, remat=c.remat,
            ema_decay=c.ema_decay, grad_accum=c.grad_accum,
            pipeline_microbatches=(c.pipeline_microbatches
                                   if c.pipeline_parallelism > 1 else None))

        last_metrics: Dict[str, float] = {}
        step = int(jax.device_get(self.state.step))
        while step < c.steps_total:
            start = time.perf_counter()
            self.state, metrics = chained(self.state, self.step_rng)
            metrics = jax.device_get(metrics)
            elapsed = time.perf_counter() - start
            step += c.steps_per_dispatch
            last_metrics = {k: float(v) for k, v in metrics.items()}
            last_metrics['images_per_sec'] = (
                c.batch_size * c.steps_per_dispatch / elapsed)
            last_metrics['learning_rate'] = float(self.schedule(step))
            self.logger.log(last_metrics, step)
            if self.checkpoints is not None:
                self.checkpoints.save(step, self.state)
            if self._preempted:
                break

        eval_metrics = self.evaluate(eval_data, c.eval_batches)
        self.logger.log(eval_metrics, step)
        last_metrics.update(eval_metrics)
        if self.checkpoints is not None:
            self.checkpoints.wait()
        return last_metrics

    def _run_chained_host(self, train_data, eval_data
                          ) -> Dict[str, float]:
        """N steps per dispatch over real (host-loaded) data: batches are
        stacked into one chunk and scanned on device, so the per-dispatch
        round trip amortizes over N steps.

        Chunk k+1 is loaded on a prefetch thread while chunk k's dispatch
        drains, overlapping host decode with device compute + H2D transfer
        (measured: the serial loop left the device idle for the full decode
        time of every chunk, docs/PERFORMANCE.md "Real-data input path").
        The loader's checkpointable state is captured at each chunk boundary
        on the prefetch thread, so checkpoints stay consistent with the
        steps actually consumed even while the iterator runs ahead.
        """
        from concurrent.futures import ThreadPoolExecutor

        c = self.config
        chained = steps_lib.make_chained_train_step_over_batches(
            self.model, self.tx, self.mesh, self.state,
            num_classes=c.num_classes,
            label_smoothing=c.label_smoothing, remat=c.remat,
            ema_decay=c.ema_decay, grad_accum=c.grad_accum,
            pipeline_microbatches=(c.pipeline_microbatches
                                   if c.pipeline_parallelism > 1 else None))

        def fetch(step, n):
            """Loads one chunk; returns (stacked, loader state afterwards).

            Runs on the single prefetch thread; device transforms inside
            ``batch`` only enqueue, so this blocks on host decode alone.
            """
            if n <= 0:
                return None, None
            try:
                batches = [train_data.batch(step + i) for i in range(n)]
            except StopIteration:
                return None, None
            state = (train_data.get_state()
                     if hasattr(train_data, 'get_state') else None)
            return steps_lib.stack_batches(batches), state

        from collections import deque

        last_metrics: Dict[str, float] = {}
        step = int(jax.device_get(self.state.step))
        executor = ThreadPoolExecutor(max_workers=1)
        # ring of up to `prefetch_chunks` in-flight fetches: the single
        # loader thread keeps decoding (and enqueueing H2D) for chunks
        # k+1..k+depth while chunk k's dispatch drains on device, so a
        # slow-decode chunk no longer stalls the device on arrival
        pending = deque()
        next_fetch = step

        def submit_next():
            nonlocal next_fetch
            n = min(c.steps_per_dispatch, c.steps_total - next_fetch)
            if n > 0:
                # a shorter tail chunk just jit-specializes once more
                pending.append((n, executor.submit(fetch, next_fetch, n)))
                next_fetch += n

        for _ in range(max(1, c.prefetch_chunks)):
            submit_next()
        # checkpoint on the configured epoch cadence (plus a final save),
        # not every chunk — per-chunk async saves measured multi-second
        # stalls waiting on the previous write
        steps_per_ckpt = c.steps_per_epoch * c.checkpoint_every_epochs
        # eval on the same cadence as the per-step loop (r5 fix: chained
        # dispatch previously evaluated only once at the end, so long
        # runs logged no accuracy curve at all)
        steps_per_eval = c.steps_per_epoch * c.eval_every_epochs
        last_saved = step
        last_data_state = None
        try:
            while step < c.steps_total and pending:
                # wall time per chunk includes any wait on the prefetch
                # thread, so images_per_sec stays an honest end-to-end rate
                # even when the host loader is the bottleneck
                start = time.perf_counter()
                n, future = pending.popleft()
                stacked, data_state = future.result()
                if stacked is None:   # source exhausted
                    break
                submit_next()
                self.state, metrics = chained(self.state, self.step_rng,
                                              stacked)
                metrics = jax.device_get(metrics)
                elapsed = time.perf_counter() - start
                step += n
                last_metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics['images_per_sec'] = c.batch_size * n / elapsed
                last_metrics['learning_rate'] = float(self.schedule(step))
                self.logger.log(last_metrics, step)
                last_data_state = data_state
                # did the consumed chunk cross a cadence boundary?
                # (guarded: checkpoint_every_epochs=0 disables the cadence)
                crossed = steps_per_ckpt > 0 and (step % steps_per_ckpt) < n
                if self.checkpoints is not None and (
                        crossed or step >= c.steps_total):
                    self.checkpoints.save(step, self.state,
                                          data_state=data_state)
                    last_saved = step
                if (steps_per_eval > 0 and (step % steps_per_eval) < n
                        and step < c.steps_total):
                    eval_metrics = self.evaluate(eval_data, c.eval_batches)
                    self.logger.log(eval_metrics, step)
                    last_metrics.update(eval_metrics)
                if self._preempted:
                    break
        finally:
            executor.shutdown(wait=False)

        if self.checkpoints is not None and step > last_saved:
            # early-exhaustion break: persist the trailing chunks too
            self.checkpoints.save(step, self.state,
                                  data_state=last_data_state)

        eval_metrics = self.evaluate(eval_data, c.eval_batches)
        self.logger.log(eval_metrics, step)
        last_metrics.update(eval_metrics)
        if self.checkpoints is not None:
            self.checkpoints.wait()
        return last_metrics
