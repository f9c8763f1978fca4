"""Golden activation-parity tests for the torch→flax weight converters.

The reference runs pretrained SD-v1.5 through diffusers (``ldiffusion.py:
66-70``, ``segmentor.py:79``); no SD checkpoint or diffusers install exists
in this environment, so torch (CPU) is the source of truth: each test builds
a torch module with diffusers-exact state-dict key names and diffusers op
semantics (GroupNorm/LayerNorm eps, GEGLU exact-erf gelu, attention scaling,
nearest upsample, asymmetric VAE downsample padding), feeds its state dict
through ``models/convert.py``, and compares forward activations elementwise.

A transposed kernel, missed key, wrong eps, or wrong activation breaks these
at 1e-3 tolerance. What torch cannot validate here is the *architecture
wiring* vs real diffusers (skip orders etc.) — that part is pinned by the
convert key layout itself, which enumerates the diffusers graph.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ldiffusion_tpu.models.convert import (
    convert_clip_text,
    convert_unet,
    convert_vae,
)
from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig
from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from ldiffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from ldiffusion_tpu.models.vgg import VGG19Features, convert_vgg19

torch.manual_seed(0)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _max_diff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# ---------------------------------------------------------------------------
# torch reference modules (diffusers naming + semantics)
# ---------------------------------------------------------------------------

class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb=None, groups=8, eps=1e-5, shortcut=None):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb:
            self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if shortcut is None:
            shortcut = cin != cout
        if shortcut:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return h + res


class TAttention(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim=None):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim))

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, sq, _ = x.shape
        sk = ctx.shape[1]
        q = self.to_q(x).view(b, sq, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        att = (q @ k.transpose(-1, -2)) * self.head_dim ** -0.5
        out = att.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, sq, -1)
        return self.to_out(out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf gelu (diffusers GEGLU)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList([TGEGLU(dim, inner), tnn.Identity(),
                                   tnn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttention(dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TAttention(dim, heads, head_dim, ctx_dim)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim, groups=8, depth=1):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlock(dim, heads, head_dim, ctx_dim) for _ in range(depth)])
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class TDownsample(tnn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2,
                               padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


def t_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) *
                      torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([args.cos(), args.sin()], dim=-1)


class TTinyUNet(tnn.Module):
    """Tiny UNet2DCondition with diffusers key names, matching
    ``UNet2DConditionConfig.tiny()``: blocks (32, 64), 1 layer/block,
    down (CrossAttn, Down), up (Up, CrossAttnUp), 2 heads, groups 8."""

    def __init__(self, ctx_dim=32):
        super().__init__()
        ch = (32, 64)
        tdim = ch[0] * 4
        heads = 2
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(ch[0], tdim)
        self.time_embedding.linear_2 = tnn.Linear(tdim, tdim)

        def db(i, cin, cout, attn):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, cout, tdim)])
            if attn:
                blk.attentions = tnn.ModuleList(
                    [TTransformer2D(cout, heads, cout // heads, ctx_dim)])
            if i == 0:
                blk.downsamplers = tnn.ModuleList([TDownsample(cout)])
            return blk

        self.down_blocks = tnn.ModuleList([db(0, ch[0], ch[0], True),
                                           db(1, ch[0], ch[1], False)])
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], tdim), TResnet(ch[1], ch[1], tdim)])
        self.mid_block.attentions = tnn.ModuleList(
            [TTransformer2D(ch[1], heads, ch[1] // heads, ctx_dim)])

        def ub(i, cout, cins, attn):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TResnet(cin, cout, tdim, shortcut=True) for cin in cins])
            if attn:
                blk.attentions = tnn.ModuleList(
                    [TTransformer2D(cout, heads, cout // heads, ctx_dim)
                     for _ in cins])
            if i == 0:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            return blk

        # skip stack after down path: [32@8, 32@8, 32@4, 64@4]
        # up0 (ch 64): r0 in = h64+skip64=128, r1 in = h64+skip32=96; upsample
        # up1 (ch 32): r0 in = h64+skip32=96,  r1 in = h32+skip32=64
        self.up_blocks = tnn.ModuleList([
            ub(0, ch[1], [128, 96], False),
            ub(1, ch[0], [96, 64], True),
        ])
        self.conv_norm_out = tnn.GroupNorm(8, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = t_timestep_embedding(t, 32)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        res = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                res.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                res.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, res.pop()], dim=1)
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        return h


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def test_unet_tiny_activation_parity():
    tm = TTinyUNet().eval()
    sd = _sd(tm)
    cfg = UNet2DConditionConfig.tiny()
    params = convert_unet(sd, cfg)

    x = np.random.default_rng(0).normal(size=(2, 8, 8, 4)).astype(np.float32)
    ctx = np.random.default_rng(1).normal(size=(2, 5, 32)).astype(np.float32)
    t = np.array([801, 3], np.int64)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(t),
                 torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()

    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    out = unet.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    assert _max_diff(out, ref) < 2e-4, _max_diff(out, ref)


def test_unet_converter_consumes_all_torch_keys():
    """Every tensor in the torch state dict must land in the flax tree —
    a silently dropped key means unconverted weights."""
    tm = TTinyUNet()
    sd = _sd(tm)
    params = convert_unet(sd, UNet2DConditionConfig.tiny())
    n_torch = len(sd)
    n_flax = len(jax.tree_util.tree_leaves(params))
    assert n_flax == n_torch, (n_flax, n_torch)


def test_unet_converted_tree_matches_init_structure():
    cfg = UNet2DConditionConfig.tiny()
    params = convert_unet(_sd(TTinyUNet()), cfg)
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    init = unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.int32(1),
                     jnp.zeros((1, 5, 32)))
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
    assert ref_shapes == got_shapes


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

class TTinyVAE(tnn.Module):
    """AutoencoderKL with diffusers key names matching ``VAEConfig.tiny()``:
    blocks (32, 64), 1 layer/block, groups 8."""

    def __init__(self):
        super().__init__()
        ch = (32, 64)
        g = 8

        def down(i, cin, cout, last):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, cout, None, g, 1e-6)])
            if not last:
                blk.downsamplers = tnn.ModuleList([TDownsample(cout, asymmetric=True)])
            return blk

        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, ch[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList([down(0, ch[0], ch[0], False),
                                          down(1, ch[0], ch[1], True)])
        enc.mid_block = tnn.Module()
        enc.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], None, g, 1e-6), TResnet(ch[1], ch[1], None, g, 1e-6)])
        attn = tnn.Module()
        attn.group_norm = tnn.GroupNorm(g, ch[1], eps=1e-6)
        attn.to_q = tnn.Linear(ch[1], ch[1])
        attn.to_k = tnn.Linear(ch[1], ch[1])
        attn.to_v = tnn.Linear(ch[1], ch[1])
        attn.to_out = tnn.Sequential(tnn.Linear(ch[1], ch[1]))
        enc.mid_block.attentions = tnn.ModuleList([attn])
        enc.conv_norm_out = tnn.GroupNorm(g, ch[1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch[1], 8, 3, padding=1)
        self.encoder = enc

        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(4, ch[1], 3, padding=1)
        dec.mid_block = tnn.Module()
        dec.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], None, g, 1e-6), TResnet(ch[1], ch[1], None, g, 1e-6)])
        attn2 = tnn.Module()
        attn2.group_norm = tnn.GroupNorm(g, ch[1], eps=1e-6)
        attn2.to_q = tnn.Linear(ch[1], ch[1])
        attn2.to_k = tnn.Linear(ch[1], ch[1])
        attn2.to_v = tnn.Linear(ch[1], ch[1])
        attn2.to_out = tnn.Sequential(tnn.Linear(ch[1], ch[1]))
        dec.mid_block.attentions = tnn.ModuleList([attn2])

        def up(i, cin, cout, last):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, cout, None, g, 1e-6),
                                          TResnet(cout, cout, None, g, 1e-6)])
            if not last:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            return blk

        dec.up_blocks = tnn.ModuleList([up(0, ch[1], ch[1], False),
                                        up(1, ch[1], ch[0], True)])
        dec.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(ch[0], 3, 3, padding=1)
        self.decoder = dec
        self.quant_conv = tnn.Conv2d(8, 8, 1)
        self.post_quant_conv = tnn.Conv2d(4, 4, 1)

    @staticmethod
    def _attn_fwd(attn, x):
        b, c, h, w = x.shape
        y = attn.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = attn.to_q(y), attn.to_k(y), attn.to_v(y)
        att = (q @ k.transpose(-1, -2)) * c ** -0.5
        out = attn.to_out(att.softmax(-1) @ v)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + x

    def encode_mean(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = self._attn_fwd(e.mid_block.attentions[0], h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h).chunk(2, dim=1)[0]

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = self._attn_fwd(d.mid_block.attentions[0], h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


def test_vae_encode_decode_parity():
    tm = TTinyVAE().eval()
    cfg = VAEConfig.tiny()
    params = convert_vae(_sd(tm), cfg)
    vae = AutoencoderKL(cfg, dtype=jnp.float32)

    x = np.random.default_rng(2).normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_mean = tm.encode_mean(torch.from_numpy(x).permute(0, 3, 1, 2))
    mean = vae.apply(params, jnp.asarray(x), method=vae.encode_mean)
    assert _max_diff(mean, ref_mean.permute(0, 2, 3, 1).numpy()) < 2e-4

    z = np.random.default_rng(3).normal(size=(1, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        ref_img = tm.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    img = vae.apply(params, jnp.asarray(z), method=vae.decode)
    assert _max_diff(img, ref_img.permute(0, 2, 3, 1).numpy()) < 2e-4


# ---------------------------------------------------------------------------
# CLIP text
# ---------------------------------------------------------------------------

class TTinyCLIP(tnn.Module):
    """CLIPTextModel (transformers naming, ``text_model.`` prefix) matching
    ``CLIPTextConfig.tiny()``: hidden 32, 2 layers, 2 heads, quick-gelu."""

    def __init__(self, cfg: CLIPTextConfig):
        super().__init__()
        self.cfg = cfg
        tm = tnn.Module()
        tm.embeddings = tnn.Module()
        tm.embeddings.token_embedding = tnn.Embedding(cfg.vocab_size, cfg.hidden_size)
        tm.embeddings.position_embedding = tnn.Embedding(cfg.max_positions, cfg.hidden_size)
        tm.encoder = tnn.Module()
        layers = []
        for _ in range(cfg.num_layers):
            lay = tnn.Module()
            lay.self_attn = tnn.Module()
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(lay.self_attn, n, tnn.Linear(cfg.hidden_size, cfg.hidden_size))
            lay.layer_norm1 = tnn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
            lay.layer_norm2 = tnn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
            lay.mlp = tnn.Module()
            lay.mlp.fc1 = tnn.Linear(cfg.hidden_size, cfg.mlp_dim)
            lay.mlp.fc2 = tnn.Linear(cfg.mlp_dim, cfg.hidden_size)
            layers.append(lay)
        tm.encoder.layers = tnn.ModuleList(layers)
        tm.final_layer_norm = tnn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.text_model = tm

    def forward(self, ids):
        cfg = self.cfg
        tm = self.text_model
        x = tm.embeddings.token_embedding(ids) + \
            tm.embeddings.position_embedding(torch.arange(ids.shape[1]))[None]
        s = ids.shape[1]
        mask = torch.full((s, s), float("-inf")).triu(1)
        hd = cfg.hidden_size // cfg.num_heads
        for lay in tm.encoder.layers:
            y = lay.layer_norm1(x)
            b = y.shape[0]
            q = lay.self_attn.q_proj(y).view(b, s, cfg.num_heads, hd).transpose(1, 2)
            k = lay.self_attn.k_proj(y).view(b, s, cfg.num_heads, hd).transpose(1, 2)
            v = lay.self_attn.v_proj(y).view(b, s, cfg.num_heads, hd).transpose(1, 2)
            att = (q @ k.transpose(-1, -2)) * hd ** -0.5 + mask
            o = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, s, -1)
            x = x + lay.self_attn.out_proj(o)
            y = lay.layer_norm2(x)
            h = lay.mlp.fc1(y)
            h = h * torch.sigmoid(1.702 * h)  # quick_gelu
            x = x + lay.mlp.fc2(h)
        return tm.final_layer_norm(x)


def test_clip_text_parity():
    cfg = CLIPTextConfig.tiny()
    tm = TTinyCLIP(cfg).eval()
    params = convert_clip_text(_sd(tm), cfg.num_layers)
    enc = CLIPTextEncoder(cfg, dtype=jnp.float32)

    ids = np.array([[1, 5, 9, 200, 2]], np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids.astype(np.int64))).numpy()
    out = enc.apply(params, jnp.asarray(ids))
    assert _max_diff(out, ref) < 2e-4, _max_diff(out, ref)


# ---------------------------------------------------------------------------
# VGG19 (content loss)
# ---------------------------------------------------------------------------

def _torchvision_vgg19_features():
    """torchvision vgg19().features layer layout (config E): conv indices
    0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34 with maxpools between."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(cin, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            cin = v
    return tnn.Sequential(*layers)


def test_vgg19_conversion_parity():
    feats = _torchvision_vgg19_features().eval()
    sd = {"features." + k: v.detach().numpy() for k, v in feats.state_dict().items()}
    params = convert_vgg19(sd)
    vgg = VGG19Features()

    x = np.random.default_rng(4).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = feats(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    out = vgg.apply({"params": params}, jnp.asarray(x))
    assert _max_diff(out, ref) < 1e-4, _max_diff(out, ref)


# ---------------------------------------------------------------------------
# Resize op vs torch (downscale — no antialias)
# ---------------------------------------------------------------------------

def test_resize_downscale_matches_torch():
    from ldiffusion_tpu.ops.resize import resize_bilinear

    x = np.random.default_rng(5).normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(24, 24),
                        mode="bilinear", align_corners=False)
    out = resize_bilinear(jnp.asarray(x), (24, 24))
    assert _max_diff(out, ref.permute(0, 2, 3, 1).numpy()) < 1e-5
