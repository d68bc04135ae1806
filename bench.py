"""Headline benchmark: ViT-B/16 @224 train-step images/sec/chip.

Measures three things on the same chip:

  * ours          — sav_tpu train step, jit + 50-step lax.scan chaining
                    (how this framework actually runs).
  * ref (matched) — the reference implementation's own model (imported from
                    /root/reference) driven by an equivalent jit+scan step:
                    isolates pure compiled-compute differences.
  * ref (as written) — the reference run the way train.py actually runs it
                    (reference: train.py:228-234): jax.pmap over local
                    devices, a fresh host-resident batch dispatched every
                    step (its tf.data loader hands pmap a new host array
                    each iteration), per-step python loop. This is the
                    number a reference user actually sees, so architectural
                    wins (step chaining, on-device data) count here.

The reported ``vs_baseline`` is ours / ref-as-written; ``vs_matched`` is
also included in the same JSON line. See docs/PERFORMANCE.md for the
breakdown of where the two baselines differ and why.

Methodology notes: chained timing forces completion by fetching a scalar
that depends on the final state — on tunneled TPU targets
`block_until_ready` returns at enqueue time. The as-written loop instead
relies on donated-state backpressure across N steps and one final fetch,
which matches how the reference's async dispatch really pipelines (its loop
never fetches metrics at runtime — wandb.log inside the pmapped fn is a
trace-time no-op, reference train.py:102-107).

``--all`` additionally sweeps the BASELINE.json tracked configs
(mixer_b_patch16, cait_s24, cvt-13, tnt_s_patch16) and prints one JSON line
per model (driver consumes only the first line).
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# fresh Mosaic kernel compiles cost 5-10 min over the remote tunnel; the
# persistent cache makes reruns (and the driver's run) start warm
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODEL_NAME = 'vit_b_patch16'
IMG = 224
SCAN_STEPS = 50

# (model_name, img, tpu_batch) for the --all sweep; batches sized to fit a
# single v5e chip without remat.
TRACKED_CONFIGS = (
    ('vit_b_patch16', 224, 192),
    ('mixer_b_patch16', 224, 192),
    ('cait_s_24', 224, 128),
    ('cvt-13', 224, 64),
    ('tnt_s_patch16', 224, 64),
    ('tnt_b_patch16', 224, 32),
    ('ceit_s', 224, 64),
    # @384: the flash-kernel dispatch region (L=577), the reference's own
    # large-resolution test point (reference: botnet_test.py:13-23,
    # cvt_test.py:16)
    ('vit_b_patch16', 384, 48),
    ('cait_s_24', 384, 48),
    # round-5: BoTNet rows get a matched baseline = the minimally-patched
    # reference (same 3 crash fixes as test_golden_parity.py, jit+scan
    # methodology). Caveat carried in the row: the patched reference's
    # post-fix attention is not paper attention (softmax over one axis,
    # value contraction drops the key grid, botnet.py:194,198-200) — it is
    # the only definable "reference as it can be made to run" baseline.
    ('botnet_t3', 224, 64),
    # the largest factory model that fits one v5e: bs48 OOMs (the ours +
    # matched-reference lanes share the process), bs32 runs with headroom
    ('vit_l_patch16', 224, 32),
    # round-5 top-of-zoo rows (VERDICT r4 next-round #1): the factory's
    # largest configs, throughput-optimal single-chip batches
    ('vit_l_patch16', 384, 16),
    # bs32 OOMs with the ours+matched lanes sharing the process (r5 queue
    # receipt); bs16 runs both
    ('cait_m_48', 224, 16),
    # ceit_b is NOT tracked: 1108M params (the reference's full-conv LeFF,
    # leff.py:46-51, at 3072 ch = 85M/layer) — f32 params + Adam moments
    # alone are 11.1 GB, + f32 grads and the bf16 compute cast exceeds
    # 16 GB HBM at ANY batch (both bs32 and bs16 OOM'd, r5 queue receipt).
    # Single-chip training is structurally impossible; the parallel tier
    # (TP/PP) is the path. Serving fits (bf16 params 2.2 GB, serve_sweep).
    ('cvt-w24', 384, 16),
    ('mixer_l_patch16', 224, 64),
    ('botnet_t4', 224, 48),
)

NO_BASELINE = set()
BOTNET_NOTE = ('matched = minimally-patched reference (the 3 crash fixes '
               'from test_golden_parity.py; its post-fix attention is not '
               'paper attention — only definable baseline)')


def _batch(batch_size, img=IMG, seed=1):
    rngs = jax.random.split(jax.random.PRNGKey(seed))
    return {
        'images': jax.random.uniform(rngs[0], (batch_size, img, img, 3)),
        'labels': jax.random.randint(rngs[1], (batch_size,), 0, 1000),
    }


def _time_scan(step_fn, state, batch, steps=SCAN_STEPS, repeats=3):
    """step_fn(state, batch, step_index) -> (state, loss). Returns s/step.

    The carried state is DONATED, exactly like the production train step
    (steps.py make_train_step donate_argnums) — round-5 probe: donation
    is worth 2.95 ms/step on ViT-B @224 bs192 (160.92 -> 157.97,
    benchmarks/vitb_slack_probe.py 'donate' phase), and it lowers the
    peak-memory water line (one live state instead of in+out copies).
    Applied to BOTH the ours and matched-reference lanes."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batch):
        def body(carry, i):
            new_state, loss = step_fn(carry, batch, i)
            return new_state, loss
        state, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return state, losses[-1]

    state, loss = run(state, batch)           # compile + warmup
    float(loss)                               # force completion
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        state, loss = run(state, batch)       # rotates the donated carry
        float(loss)                           # forces the whole chain
        best = min(best, (time.perf_counter() - start) / steps)
    return best


def bench_ours(model_name, img, batch_size):
    from sav_tpu.models import create_model
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.train import steps as steps_lib

    model = create_model(model_name, num_classes=1000, dtype=jnp.bfloat16)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(2)

    def step(state, batch, i):
        new_state, metrics = steps_lib.train_step(
            state, batch, rng, model=model, tx=tx, num_classes=1000,
            label_smoothing=0.1)
        return new_state, metrics['loss']

    return _time_scan(step, state, _batch(batch_size, img))


def _reference_model(model_name):
    """Reference MODEL CLASS + our factory's config.

    The reference factory cannot produce several tracked names (its own
    bugs: mixer_b_patch16 shadowed, TNT s/b swapped, CvT stage-3 368) —
    and where it can, the corrected config must match ours or the compute
    comparison is between different architectures. So the baseline is the
    reference's model CODE at our (paper-correct) dimensions, exactly as
    in tests/test_golden_parity.py.
    """
    import inspect

    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import models as reference_models

    from sav_tpu.models import factory

    model_cls, config = factory.MODEL_CONFIGS[model_name]
    ref_cls = getattr(reference_models, model_cls.__name__)

    def jit_patched_ns(module):
        # Minimal jit-compatibility patch, math-identical: the reference
        # computes grid sides as int(jnp.sqrt(l)) / int(jnp.ceil(jnp.sqrt(
        # l))) (reference: models/cvt.py:13,149, layers/feedforwards/
        # leff.py:43), which raises ConcretizationTypeError under jit/scan
        # tracing — the reference never jits its models, our benchmark
        # methodology does. Rewritten to integer host math on the static
        # shape, same values.
        import inspect

        src = inspect.getsource(module)
        src = src.replace('int(jnp.ceil(jnp.sqrt(l)))',
                          '(math.isqrt(l) + (math.isqrt(l) ** 2 < l))')
        src = src.replace('int(jnp.sqrt(l))', 'math.isqrt(l)')
        assert 'int(jnp.' not in src
        ns = {}
        exec(compile('import math\n' + src,
                     module.__file__ + ' (jit patch)', 'exec'), ns)
        return ns

    if model_cls.__name__ == 'BoTNet':
        # the published reference BoTNet crashes on three bugs
        # (botnet.py:185,227,232 + squeeze_excite.py:32-33); apply exactly
        # the minimal in-memory fixes test_golden_parity.py documents so a
        # matched-compute baseline exists at all (VERDICT r4 missing #4)
        import models.botnet as ref_botnet
        import models.layers.squeeze_excite as ref_se
        se_src = inspect.getsource(ref_se)
        se_src = se_src.replace('keepdims=True)(inputs)', 'keepdims=True)')
        se_ns = {}
        exec(compile(se_src, ref_se.__file__ + ' (patched)', 'exec'), se_ns)
        bot_src = inspect.getsource(ref_botnet)
        bot_src = bot_src.replace('jnp.sqrt(self.head_dim)',
                                  'jnp.sqrt(self.head_ch)')
        bot_src = bot_src.replace('cfg = self.config\n', '')
        bot_src = bot_src.replace(
            'BoTMHSA(config=cfg)',
            'BoTMHSA(num_heads=4, head_ch=self.filters // 4)')
        bot_ns = {}
        exec(compile(bot_src, ref_botnet.__file__ + ' (patched)', 'exec'),
             bot_ns)
        bot_ns['SqueezeExciteBlock'] = se_ns['SqueezeExciteBlock']
        ref_cls = bot_ns['BoTNet']
    elif model_cls.__name__ == 'CvT':
        import models.cvt as ref_cvt_mod
        ref_cls = jit_patched_ns(ref_cvt_mod)['CvT']
    elif model_cls.__name__ == 'CeiT':
        import models.ceit as ref_ceit_mod
        import models.layers.feedforwards.leff as ref_leff_mod
        ceit_ns = jit_patched_ns(ref_ceit_mod)
        # LeFFBlock is looked up from module globals at call time, so
        # rebinding it in the exec'd namespace redirects the model
        ceit_ns['LeFFBlock'] = jit_patched_ns(ref_leff_mod)['LeFFBlock']
        ref_cls = ceit_ns['CeiT']

    return ref_cls(num_classes=1000, dtype=jnp.bfloat16, **config)


def _train_kwarg(model):
    """Reference BoTNet takes ``train=``; every other reference model (and
    ours) takes ``is_training=`` (reference: models/botnet.py:278)."""
    import inspect
    params = inspect.signature(type(model).__call__).parameters
    return 'train' if 'train' in params else 'is_training'


def _reference_loss_fn(model, batch_images, labels):
    # the reference train step passes no rngs= (reference: train.py:82), so
    # CaiT training crashes as written (stochastic-depth needs a stream,
    # SURVEY §3.4); supply the streams so the baseline can train at all
    rngs = {'stochastic_depth': jax.random.PRNGKey(3),
            'dropout': jax.random.PRNGKey(4)}

    def loss_fn(params, extra_state):
        # BatchNorm models (CvT/CeiT/BoTNet) cannot even run a training
        # forward as the reference calls apply (no mutable=, reference:
        # train.py:82 — SURVEY §7 hard part 3); thread batch_stats so the
        # baseline trains
        variables = {'params': params, **extra_state}
        mutable = list(extra_state.keys())
        out = model.apply(variables, batch_images.astype(jnp.bfloat16),
                          rngs=rngs, mutable=mutable if mutable else False,
                          **{_train_kwarg(model): True})
        logits, new_state = out if mutable else (out, {})
        y = optax.smooth_labels(jax.nn.one_hot(labels, 1000), 0.1)
        loss = jnp.mean(optax.softmax_cross_entropy(
            logits.astype(jnp.float32), y))
        return loss, (logits, new_state)
    return loss_fn


def _reference_metrics_fold(loss, logits, labels):
    # the reference computes top-1/5 inside its train step via a full
    # argsort + per-row isin (reference: train.py:98, utils.py:20-37);
    # folding into the carried scalar keeps XLA from dead-code-eliminating it
    argsorted = jnp.argsort(logits)
    for k_top in (1, 5):
        pred = argsorted[..., -k_top:]
        correct = jax.vmap(jnp.isin)(pred, labels).any(axis=-1)
        loss = loss + 1e-30 * correct.astype(jnp.float32).mean()
    return loss


def bench_reference_matched(model_name, img, batch_size):
    """Reference model + our jit/scan methodology: pure-compute baseline."""
    model = _reference_model(model_name)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.add_decayed_weights(1e-4),
                     optax.scale(-1e-3))
    tk = _train_kwarg(model)
    variables = dict(jax.jit(model.init, static_argnames=tk)(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        **{tk: False}))
    params = variables.pop('params')
    extra_state = variables              # batch_stats for BN models, else {}
    opt_state = tx.init(params)

    def step(state, batch, i):
        params, extra_state, opt_state = state
        loss_fn = _reference_loss_fn(model, batch['images'], batch['labels'])
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra_state)
        loss = _reference_metrics_fold(loss, logits, batch['labels'])
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_state if new_state else extra_state,
                new_opt), loss

    return _time_scan(step, (params, extra_state, opt_state),
                      _batch(batch_size, img))


def bench_reference_as_written(model_name, img, batch_size,
                               steps=SCAN_STEPS, repeats=3):
    """The reference exactly as its train loop runs (train.py:228-234):
    pmap'd train_step, python per-step loop, one fresh host batch per step.

    Single-process, so pmap spans the local device(s) like the reference's
    single-host runs. Timing fetches only the final step's loss — the
    reference loop itself fetches nothing per-step, so async dispatch
    pipelines exactly as it would for a reference user.
    """
    import flax.jax_utils

    model = _reference_model(model_name)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.add_decayed_weights(1e-4),
                     optax.scale(-1e-3))
    tk = _train_kwarg(model)
    variables = dict(jax.jit(model.init, static_argnames=tk)(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        **{tk: False}))
    params = variables.pop('params')
    extra_state = variables
    opt_state = tx.init(params)
    n_dev = jax.local_device_count()
    assert batch_size % n_dev == 0

    def train_step(state, batch):
        params, extra_state, opt_state = state
        # reference feeds transposed 'H W C N' batches and rearranges
        # on-device (the double-transpose trick, train.py:80)
        images = jnp.transpose(batch['images'], (3, 0, 1, 2))
        loss_fn = _reference_loss_fn(model, images, batch['labels'])
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra_state)
        grads = jax.lax.pmean(grads, 'batch')
        loss = _reference_metrics_fold(loss, logits, batch['labels'])
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                new_state if new_state else extra_state, new_opt), loss

    train_fn = jax.pmap(train_step, axis_name='batch')
    state = flax.jax_utils.replicate((params, extra_state, opt_state))

    per_dev = batch_size // n_dev
    rng = np.random.RandomState(0)

    def host_batch():
        # tf.data hands the loop a new host-resident array every step
        # (uint8-decoded floats); the H2D transfer is part of the as-written
        # cost our on-device/chained path does not pay per step.
        return {
            'images': rng.rand(n_dev, img, img, 3, per_dev)
                         .astype(np.float32),
            'labels': rng.randint(0, 1000, (n_dev, per_dev)),
        }

    batches = [host_batch() for _ in range(4)]   # reuse: host RAM bound
    state, loss = train_fn(state, batches[0])    # compile + warmup
    float(loss[0])
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        for i in range(steps):
            state, loss = train_fn(state, batches[i % len(batches)])
        float(loss[0])                           # drain the pipeline
        best = min(best, (time.perf_counter() - start) / steps)
    return best


def _release_device_memory():
    """Drop compiled executables + collected garbage between lanes so a
    big model's lanes don't stack in HBM (ViT-L @224 bs32: the matched
    lane OOMs after the ours lane without this, and fits with it)."""
    import gc
    gc.collect()
    jax.clear_caches()


def bench_one(model_name, img, batch_size, with_as_written=True):
    ours = bench_ours(model_name, img, batch_size)
    _release_device_memory()
    result = {
        'metric': f'images/sec/chip {model_name} @{img} train step '
                  f'(bs={batch_size}, {jax.default_backend()})',
        'value': round(batch_size / ours, 2),
        'unit': 'images/sec/chip',
    }
    if model_name in NO_BASELINE:
        # no runnable reference equivalent; keep both comparison keys so
        # the JSONL schema is uniform across rows
        result['vs_baseline'] = None
        result['vs_matched'] = None
        return result
    if model_name.startswith('botnet'):
        result['baseline_note'] = BOTNET_NOTE
    matched = bench_reference_matched(model_name, img, batch_size)
    result['vs_matched'] = round(matched / ours, 4)
    if with_as_written:
        _release_device_memory()
        as_written = bench_reference_as_written(model_name, img, batch_size)
        result['ref_as_written_ips'] = round(batch_size / as_written, 2)
        result['vs_baseline'] = round(as_written / ours, 4)
    else:
        result['vs_baseline'] = result['vs_matched']
    result['ref_matched_ips'] = round(batch_size / matched, 2)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--all', action='store_true',
                        help='sweep all BASELINE.json tracked configs')
    parser.add_argument('--model', default=None,
                        help='run only tracked configs for this model name')
    parser.add_argument('--img', type=int, default=None,
                        help='with --model: only the config at this '
                             'resolution')
    parser.add_argument('--batch-size', type=int, default=None)
    args = parser.parse_args()

    on_tpu = jax.default_backend() == 'tpu'
    if args.model:
        configs = tuple(c for c in TRACKED_CONFIGS
                        if c[0] == args.model
                        and (args.img is None or c[1] == args.img))
        if not configs:
            raise SystemExit(f'no tracked config for {args.model!r}')
    else:
        configs = TRACKED_CONFIGS if args.all else TRACKED_CONFIGS[:1]
    for i, (model_name, img, tpu_bs) in enumerate(configs):
        batch_size = args.batch_size or (tpu_bs if on_tpu else 8)
        # the as-written (pmap, per-step host dispatch) baseline is
        # environment-bound (H2D per step); measure it once on the headline
        # config — vs_matched is the per-model compiled-compute comparison
        result = bench_one(model_name, img, batch_size,
                           with_as_written=(i == 0 and not args.model))
        print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
