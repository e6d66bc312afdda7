"""ViT dense-feature extractor (tools/vit_extractor.py) against a tiny
synthetic ViT with the dino/dinov2 attribute layout — validates the patch
-stride override, positional-embedding re-interpolation, and "key"-facet
hook capture without needing hub weights (no network in CI)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from emernerf_tpu.tools.vit_extractor import (  # noqa: E402
    ViTFeatureExtractor,
    override_patch_stride,
    preprocess_image,
)

PATCH = 8
DIM = 16
HEADS = 2


class _PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_size = PATCH
        self.proj = nn.Conv2d(3, DIM, kernel_size=PATCH, stride=PATCH)

    def forward(self, x):
        x = self.proj(x)  # (B, C, H', W')
        return x.flatten(2).transpose(1, 2)  # (B, N, C)


class _Attention(nn.Module):
    def __init__(self):
        super().__init__()
        self.num_heads = HEADS
        self.qkv = nn.Linear(DIM, DIM * 3, bias=False)
        self.proj = nn.Linear(DIM, DIM)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, HEADS, c // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(c // HEADS)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = _Attention()
        self.norm = nn.LayerNorm(DIM)

    def forward(self, x):
        return x + self.attn(self.norm(x))


class TinyViT(nn.Module):
    """Matches the structural contract the extractor relies on:
    patch_embed.proj / pos_embed / interpolate_pos_encoding / blocks[i].attn.qkv."""

    def __init__(self, grid=4, depth=3):
        super().__init__()
        self.patch_embed = _PatchEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, DIM))
        self.pos_embed = nn.Parameter(
            torch.randn(1, grid * grid + 1, DIM) * 0.02
        )
        self.blocks = nn.ModuleList([_Block() for _ in range(depth)])

    def interpolate_pos_encoding(self, x, w, h):
        if x.shape[1] == self.pos_embed.shape[1]:
            return self.pos_embed
        raise AssertionError(
            "strided input reached the default pos-enc path — the override "
            "was not applied"
        )

    def forward(self, x):
        b, _, h, w = x.shape
        tokens = self.patch_embed(x)
        cls = self.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        tokens = tokens + self.interpolate_pos_encoding(tokens, w, h)
        for blk in self.blocks:
            tokens = blk(tokens)
        return tokens[:, 0]


def test_stride_override_densifies_grid():
    torch.manual_seed(0)
    model = TinyViT()
    ex = ViTFeatureExtractor(model, "dino_tiny", stride=4)
    x = torch.randn(1, 3, 32, 32)
    feats = ex.extract(x, layer=1, facet="key")
    # 1 + (32-8)//4 = 7 per side (vs 4 at stride 8)
    assert feats.shape == (1, 7, 7, DIM)


def test_default_stride_unchanged():
    torch.manual_seed(0)
    model = TinyViT()
    ex = ViTFeatureExtractor(model, "dino_tiny")  # stride = patch = 8
    feats = ex.extract(torch.randn(1, 3, 32, 32), layer=0, facet="key")
    assert feats.shape == (1, 4, 4, DIM)


def test_pos_embed_interpolation_matches_grid():
    """The re-interpolated pos-emb must cover the strided token count and
    agree with the pretrained grid when queried at the original size."""
    torch.manual_seed(0)
    model = TinyViT()
    override_patch_stride(model, 4)
    x_tokens = torch.zeros(1, 1 + 7 * 7, DIM)
    pe = model.interpolate_pos_encoding(x_tokens, 32, 32)
    assert pe.shape == (1, 1 + 7 * 7, DIM)
    # original token count short-circuits to the pretrained embedding
    x_orig = torch.zeros(1, 1 + 4 * 4, DIM)
    pe0 = model.interpolate_pos_encoding(x_orig, 32, 32)
    assert torch.equal(pe0, model.pos_embed)


def test_key_facet_differs_from_token_facet():
    torch.manual_seed(0)
    model = TinyViT()
    ex = ViTFeatureExtractor(model, "dino_tiny", stride=4)
    x = torch.randn(1, 3, 32, 32)
    key = ex.extract(x, layer=1, facet="key")
    tok = ex.extract(x, layer=1, facet="token")
    assert key.shape == tok.shape
    assert not torch.allclose(key, tok)
    # key facet is exactly the block's qkv "k" output, heads flattened
    q2 = ex.extract(x, layer=1, facet="query")
    assert not torch.allclose(key, q2)


def test_register_tokens_stripped():
    torch.manual_seed(0)
    model = TinyViT()
    model.num_register_tokens = 0  # plain model: nothing stripped
    ex = ViTFeatureExtractor(model, "dino_tiny", stride=4)
    out = ex.extract(torch.randn(1, 3, 32, 32), layer=1, facet="key")
    assert out.shape[1] * out.shape[2] == 49


def test_preprocess_image_shapes(tmp_path):
    from PIL import Image

    img = Image.fromarray(
        (np.random.rand(20, 30, 3) * 255).astype(np.uint8)
    )
    p = tmp_path / "img.jpg"
    img.save(p)
    x = preprocess_image(str(p), (16, 24), "dino_vitb8")
    assert x.shape == (1, 3, 16, 24)
    assert x.dtype == torch.float32
