"""timm VisionTransformer import: logits pinned to a torch ground truth.

The ground truth is a minimal torch ViT defined HERE, implementing timm's
semantics (fused-qkv linear with q|k|v row order and heads-major reshape,
erf GELU, eps=1e-6 LayerNorms, conv patch embed) and consuming the
synthesized state dict natively via ``load_state_dict(strict=True)`` — so
the layout spec is encoded twice, independently: once by this module's
forward, once by the importer's re-nesting.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sav_tpu.models.factory import create_model  # noqa: E402
from sav_tpu.models.vit import ViT  # noqa: E402
from sav_tpu.utils.hf_import import model_spec  # noqa: E402
from sav_tpu.utils.timm_import import convert_timm_vit  # noqa: E402

DIM, LAYERS, HEADS, PATCH, IMG, CLASSES = 64, 3, 4, 8, 32, 13
HIDDEN = 4 * DIM


class _TimmBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(DIM, 3 * DIM)
                self.proj = tnn.Linear(DIM, DIM)

            def forward(self, x):
                b, n, _ = x.shape
                head = DIM // HEADS
                qkv = self.qkv(x).reshape(b, n, 3, HEADS, head
                                          ).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q @ k.transpose(-2, -1)) / math.sqrt(head)
                x = attn.softmax(-1) @ v
                return self.proj(x.transpose(1, 2).reshape(b, n, DIM))

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(DIM, HIDDEN)
                self.fc2 = tnn.Linear(HIDDEN, DIM)

            def forward(self, x):
                return self.fc2(tnn.functional.gelu(self.fc1(x)))

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TimmViT(tnn.Module):
    """State-dict-compatible with timm's VisionTransformer."""

    def __init__(self):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, DIM))
        n_tok = (IMG // PATCH) ** 2 + 1
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tok, DIM))

        class PatchEmbed(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(3, DIM, PATCH, stride=PATCH)

            def forward(self, x):
                return self.proj(x).flatten(2).transpose(1, 2)

        self.patch_embed = PatchEmbed()
        self.blocks = tnn.ModuleList(_TimmBlock() for _ in range(LAYERS))
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)
        self.head = tnn.Linear(DIM, CLASSES)

    def forward(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for block in self.blocks:
            x = block(x)
        return self.head(self.norm(x)[:, 0])


@pytest.fixture(scope='module')
def timm_model_and_conversion():
    torch.manual_seed(0)
    model = _TimmViT().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(std=0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, kwargs = convert_timm_vit(sd, num_heads=HEADS)
    return model, sd, params, kwargs


def _images(seed=3, batch=2):
    return np.random.default_rng(seed).normal(
        size=(batch, IMG, IMG, 3)).astype(np.float32)


def _torch_logits(model, images_nhwc):
    with torch.no_grad():
        out = model(torch.from_numpy(images_nhwc.transpose(0, 3, 1, 2)))
    return out.numpy()


def test_logits_match_torch(timm_model_and_conversion):
    model, _, params, kwargs = timm_model_and_conversion
    assert kwargs['num_classes'] == CLASSES
    images = _images()
    ours = ViT(**kwargs, use_kernel=False).apply(
        {'params': params}, jnp.asarray(images), is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _torch_logits(model, images),
                               atol=5e-4, rtol=5e-3)


def test_state_dict_roundtrips_into_ground_truth(timm_model_and_conversion):
    """The synthesized dict IS the layout the ground-truth module trained:
    strict load must succeed (guards against the test fabricating keys the
    importer happens to expect)."""
    model, sd, _, _ = timm_model_and_conversion
    fresh = _TimmViT()
    fresh.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=True)


def test_param_tree_matches_init(timm_model_and_conversion):
    _, _, params, kwargs = timm_model_and_conversion
    init = ViT(**kwargs, use_kernel=False).init(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)['params']
    assert (jax.tree_util.tree_map(lambda a: a.shape, init)
            == jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params))


def test_default_heads_heuristic():
    """Without num_heads, D // 64 is assumed (every standard ViT/DeiT)."""
    torch.manual_seed(1)
    sd = {k: v.numpy() for k, v in _TimmViT().state_dict().items()}
    _, kwargs = convert_timm_vit(sd)          # DIM=64 -> 1 head
    assert kwargs['num_heads'] == 1


def test_rejects_distilled_and_foreign_dicts():
    torch.manual_seed(2)
    sd = {k: v.numpy() for k, v in _TimmViT().state_dict().items()}
    sd['dist_token'] = np.zeros((1, 1, DIM), np.float32)
    with pytest.raises(ValueError, match='distilled'):
        convert_timm_vit(sd)
    with pytest.raises(ValueError, match='missing keys'):
        convert_timm_vit({'foo.bar': np.zeros(3)})


def test_spec_roundtrip(timm_model_and_conversion, tmp_path):
    import json

    model, _, params, kwargs = timm_model_and_conversion
    (tmp_path / 'model.json').write_text(json.dumps(model_spec(kwargs)))
    images = _images(seed=11)
    built = create_model(str(tmp_path), use_kernel=False)
    ours = built.apply({'params': params}, jnp.asarray(images),
                       is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _torch_logits(model, images),
                               atol=5e-4, rtol=5e-3)
