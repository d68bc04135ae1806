"""topk_correct semantics (reference: utils.py:20-37)."""

import jax.numpy as jnp
import numpy as np

from sav_tpu.utils.metrics import topk_correct


def test_topk_basic():
    logits = jnp.array([
        [0.1, 0.9, 0.0, 0.0, 0.0, 0.0],   # top1 = 1
        [0.5, 0.1, 0.4, 0.0, 0.0, 0.0],   # top1 = 0
    ])
    labels = jnp.array([1, 2])
    m = topk_correct(logits, labels)
    np.testing.assert_array_equal(np.asarray(m['top_1_acc']), [1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(m['top_5_acc']), [1.0, 1.0])


def test_topk_mask_and_prefix():
    logits = jnp.eye(4) * 5.0
    labels = jnp.arange(4)
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    m = topk_correct(logits, labels, mask=mask, prefix='eval_')
    assert set(m) == {'eval_top_1_acc', 'eval_top_5_acc'}
    assert float(m['eval_top_1_acc'].sum()) == 2.0


def test_topk_matches_argsort_formulation():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(32, 10).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, 32))
    ours = topk_correct(logits, labels, topk=(3,))['top_3_acc']
    # reference-style: argsort, take last k, isin
    arg = np.argsort(np.asarray(logits), axis=-1)[:, -3:]
    want = np.array([labels[i] in arg[i] for i in range(32)], np.float32)
    np.testing.assert_array_equal(np.asarray(ours), want)
