"""Convert SD v1.5 checkpoint weights (diffusers/transformers naming, torch
layout) into this framework's flax param pytrees.

The reference loads the same files via ``StableDiffusionImg2ImgPipeline.
from_pretrained`` (``ldiffusion.py:67``) and ``UNet2DConditionModel.
from_pretrained`` (``segmentor.py:79``). Conversion rules: Conv OIHW→HWIO,
Linear (out,in)→(in,out), norms map weight/bias→scale/bias.

Also provides ``save_unet_dir``/``load_unet_dir`` so fine-tuned UNets round-
trip through a directory the way ``save_pretrained`` does in the reference
(``ldiffusion.py:273``).
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from ldiffusion_tpu.models.safetensors_io import load_state_dict
from ldiffusion_tpu.models.unet import UNet2DConditionConfig
from ldiffusion_tpu.models.vae import VAEConfig


def _set(tree: dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _conv_w(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w):  # (out,in) -> (in,out)
    return np.transpose(w)


def _map_leaf(flax_path: str, torch_key: str, value: np.ndarray):
    """Decide the layout transform from the flax leaf name + source rank."""
    leaf = flax_path.rsplit("/", 1)[-1]
    if leaf == "kernel":
        if value.ndim == 4:
            return _conv_w(value)
        return _lin_w(value)
    if leaf == "embedding":
        return value
    return value  # scale/bias


class _Mapper:
    def __init__(self):
        self.tree: dict = {}

    def add(self, sd: Dict[str, np.ndarray], torch_prefix: str, flax_prefix: str, kind: str):
        """kind: conv|linear|norm|none — maps weight/bias pairs."""
        wkey, bkey = torch_prefix + ".weight", torch_prefix + ".bias"
        if wkey not in sd:
            raise KeyError(wkey)
        w = sd[wkey]
        if kind == "conv":
            _set(self.tree, flax_prefix + "/kernel", _conv_w(w))
        elif kind == "linear":
            _set(self.tree, flax_prefix + "/kernel", _lin_w(w))
        elif kind == "norm":
            _set(self.tree, flax_prefix + "/scale", w)
        if bkey in sd:
            leaf = "/bias"
            _set(self.tree, flax_prefix + leaf, sd[bkey])


def _convert_resnet(m: _Mapper, sd, tp: str, fp: str, has_time: bool, has_shortcut: bool):
    m.add(sd, f"{tp}.norm1", f"{fp}/norm1", "norm")
    m.add(sd, f"{tp}.conv1", f"{fp}/conv1", "conv")
    if has_time:
        m.add(sd, f"{tp}.time_emb_proj", f"{fp}/time_emb_proj", "linear")
    m.add(sd, f"{tp}.norm2", f"{fp}/norm2", "norm")
    m.add(sd, f"{tp}.conv2", f"{fp}/conv2", "conv")
    if has_shortcut:
        m.add(sd, f"{tp}.conv_shortcut", f"{fp}/conv_shortcut", "conv")


def _convert_transformer2d(m: _Mapper, sd, tp: str, fp: str, depth: int = 1):
    m.add(sd, f"{tp}.norm", f"{fp}/norm", "norm")
    m.add(sd, f"{tp}.proj_in", f"{fp}/proj_in", "conv")
    for i in range(depth):
        b, fb = f"{tp}.transformer_blocks.{i}", f"{fp}/transformer_blocks_{i}"
        for n in ("norm1", "norm2", "norm3"):
            m.add(sd, f"{b}.{n}", f"{fb}/{n}", "norm")
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                m.add(sd, f"{b}.{attn}.{proj}", f"{fb}/{attn}/{proj}", "linear")
            m.add(sd, f"{b}.{attn}.to_out.0", f"{fb}/{attn}/to_out", "linear")
        m.add(sd, f"{b}.ff.net.0.proj", f"{fb}/ff/proj_in", "linear")
        m.add(sd, f"{b}.ff.net.2", f"{fb}/ff/proj_out", "linear")
    m.add(sd, f"{tp}.proj_out", f"{fp}/proj_out", "conv")


def convert_unet(sd: Dict[str, np.ndarray], config: UNet2DConditionConfig) -> dict:
    m = _Mapper()
    m.add(sd, "conv_in", "conv_in", "conv")
    m.add(sd, "time_embedding.linear_1", "time_embedding/linear_1", "linear")
    m.add(sd, "time_embedding.linear_2", "time_embedding/linear_2", "linear")

    n_blocks = len(config.block_out_channels)
    in_ch = config.block_out_channels[0]
    for i, btype in enumerate(config.down_block_types):
        ch = config.block_out_channels[i]
        for j in range(config.layers_per_block):
            shortcut = (j == 0 and ch != in_ch)
            _convert_resnet(m, sd, f"down_blocks.{i}.resnets.{j}", f"down_{i}_resnet_{j}",
                            True, shortcut)
            if btype == "CrossAttnDownBlock2D":
                _convert_transformer2d(m, sd, f"down_blocks.{i}.attentions.{j}",
                                       f"down_{i}_attn_{j}")
        in_ch = ch
        if i < n_blocks - 1:
            m.add(sd, f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}_downsample/conv", "conv")

    _convert_resnet(m, sd, "mid_block.resnets.0", "mid_resnet_0", True, False)
    _convert_transformer2d(m, sd, "mid_block.attentions.0", "mid_attn")
    _convert_resnet(m, sd, "mid_block.resnets.1", "mid_resnet_1", True, False)

    for i, btype in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            # concat input always changes channels -> shortcut always present
            _convert_resnet(m, sd, f"up_blocks.{i}.resnets.{j}", f"up_{i}_resnet_{j}", True, True)
            if btype == "CrossAttnUpBlock2D":
                _convert_transformer2d(m, sd, f"up_blocks.{i}.attentions.{j}", f"up_{i}_attn_{j}")
        if i < n_blocks - 1:
            m.add(sd, f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}_upsample/conv", "conv")

    m.add(sd, "conv_norm_out", "conv_norm_out", "norm")
    m.add(sd, "conv_out", "conv_out", "conv")
    return {"params": m.tree}


def _convert_vae_attn(m: _Mapper, sd, tp: str, fp: str):
    names = [("group_norm", "group_norm", "norm")]
    if f"{tp}.to_q.weight" in sd:  # diffusers >= 0.18 naming
        names += [("to_q", "to_q", "linear"), ("to_k", "to_k", "linear"),
                  ("to_v", "to_v", "linear"), ("to_out.0", "to_out", "linear")]
    else:  # legacy query/key/value/proj_attn
        names += [("query", "to_q", "linear"), ("key", "to_k", "linear"),
                  ("value", "to_v", "linear"), ("proj_attn", "to_out", "linear")]
    for t, f, kind in names:
        m.add(sd, f"{tp}.{t}", f"{fp}/{f}", kind)


def convert_vae(sd: Dict[str, np.ndarray], config: VAEConfig) -> dict:
    m = _Mapper()
    n = len(config.block_out_channels)
    # encoder
    m.add(sd, "encoder.conv_in", "encoder/conv_in", "conv")
    in_ch = config.block_out_channels[0]
    for i, ch in enumerate(config.block_out_channels):
        for j in range(config.layers_per_block):
            shortcut = (j == 0 and ch != in_ch)
            _convert_resnet(m, sd, f"encoder.down_blocks.{i}.resnets.{j}",
                            f"encoder/down_{i}_resnet_{j}", False, shortcut)
        in_ch = ch
        if i < n - 1:
            m.add(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  f"encoder/down_{i}_downsample/conv", "conv")
    _convert_resnet(m, sd, "encoder.mid_block.resnets.0", "encoder/mid_resnet_0", False, False)
    _convert_vae_attn(m, sd, "encoder.mid_block.attentions.0", "encoder/mid_attn")
    _convert_resnet(m, sd, "encoder.mid_block.resnets.1", "encoder/mid_resnet_1", False, False)
    m.add(sd, "encoder.conv_norm_out", "encoder/conv_norm_out", "norm")
    m.add(sd, "encoder.conv_out", "encoder/conv_out", "conv")
    # decoder
    m.add(sd, "decoder.conv_in", "decoder/conv_in", "conv")
    _convert_resnet(m, sd, "decoder.mid_block.resnets.0", "decoder/mid_resnet_0", False, False)
    _convert_vae_attn(m, sd, "decoder.mid_block.attentions.0", "decoder/mid_attn")
    _convert_resnet(m, sd, "decoder.mid_block.resnets.1", "decoder/mid_resnet_1", False, False)
    rev = list(reversed(config.block_out_channels))
    in_ch = rev[0]
    for i, ch in enumerate(rev):
        for j in range(config.layers_per_block + 1):
            shortcut = (j == 0 and ch != in_ch)
            _convert_resnet(m, sd, f"decoder.up_blocks.{i}.resnets.{j}",
                            f"decoder/up_{i}_resnet_{j}", False, shortcut)
        in_ch = ch
        if i < n - 1:
            m.add(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  f"decoder/up_{i}_upsample/conv", "conv")
    m.add(sd, "decoder.conv_norm_out", "decoder/conv_norm_out", "norm")
    m.add(sd, "decoder.conv_out", "decoder/conv_out", "conv")
    # quant convs
    m.add(sd, "quant_conv", "quant_conv", "conv")
    m.add(sd, "post_quant_conv", "post_quant_conv", "conv")
    return {"params": m.tree}


def convert_clip_text(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    m = _Mapper()
    p = "text_model."
    if not any(k.startswith(p) for k in sd):
        p = ""
    _set(m.tree, "token_embedding/embedding", sd[f"{p}embeddings.token_embedding.weight"])
    _set(m.tree, "position_embedding/embedding", sd[f"{p}embeddings.position_embedding.weight"])
    for i in range(num_layers):
        t, f = f"{p}encoder.layers.{i}", f"layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.add(sd, f"{t}.self_attn.{proj}", f"{f}/self_attn/{proj}", "linear")
        m.add(sd, f"{t}.layer_norm1", f"{f}/layer_norm1", "norm")
        m.add(sd, f"{t}.layer_norm2", f"{f}/layer_norm2", "norm")
        m.add(sd, f"{t}.mlp.fc1", f"{f}/fc1", "linear")
        m.add(sd, f"{t}.mlp.fc2", f"{f}/fc2", "linear")
    m.add(sd, f"{p}final_layer_norm", "final_layer_norm", "norm")
    return {"params": m.tree}


# ---------------------------------------------------------------------------
# Checkpoint directory loading (SD model dir layout)
# ---------------------------------------------------------------------------

def _find_weights(subdir: str) -> str:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                 "diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file in {subdir}")


def load_sd_component(model_dir: str, component: str):
    """Load one component ('unet' | 'vae' | 'text_encoder') from an SD
    checkpoint directory. Returns (config_dataclass, flax_params)."""
    sub = os.path.join(model_dir, component)
    if not os.path.isdir(sub):
        sub = model_dir  # allow pointing directly at the component dir
    sd = load_state_dict(_find_weights(sub))
    cfg_path = os.path.join(sub, "config.json")
    cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    if component == "unet":
        config = UNet2DConditionConfig(
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
            layers_per_block=cfg.get("layers_per_block", 2),
            cross_attention_dim=cfg.get("cross_attention_dim", 768),
            attention_head_dim=cfg.get("attention_head_dim", 8),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            down_block_types=tuple(cfg.get("down_block_types",
                                           UNet2DConditionConfig().down_block_types)),
            up_block_types=tuple(cfg.get("up_block_types",
                                         UNet2DConditionConfig().up_block_types)),
        )
        return config, convert_unet(sd, config)
    if component == "vae":
        config = VAEConfig(
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg.get("layers_per_block", 2),
            latent_channels=cfg.get("latent_channels", 4),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
        )
        return config, convert_vae(sd, config)
    if component == "text_encoder":
        from ldiffusion_tpu.models.clip_text import CLIPTextConfig

        config = CLIPTextConfig(
            vocab_size=cfg.get("vocab_size", 49408),
            hidden_size=cfg.get("hidden_size", 768),
            num_layers=cfg.get("num_hidden_layers", 12),
            num_heads=cfg.get("num_attention_heads", 12),
            mlp_dim=cfg.get("intermediate_size", 3072),
            max_positions=cfg.get("max_position_embeddings", 77),
        )
        return config, convert_clip_text(sd, config.num_layers)
    raise ValueError(component)


# ---------------------------------------------------------------------------
# Native checkpoint dirs for fine-tuned UNets (replaces save_pretrained,
# reference ldiffusion.py:273)
# ---------------------------------------------------------------------------

def _flatten(node, prefix="", out=None) -> Dict[str, np.ndarray]:
    if out is None:
        out = {}
    if isinstance(node, dict):
        for k, v in node.items():
            _flatten(v, f"{prefix}/{k}" if prefix else k, out)
    else:
        out[prefix] = np.asarray(node)
    return out


def save_unet_dir(path: str, config: UNet2DConditionConfig, params, proj=None):
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "unet_params.npz"), **_flatten(params))
    with open(os.path.join(path, "unet_config.json"), "w") as f:
        json.dump(config.__dict__, f, default=list, indent=2)
    if proj is not None:
        np.savez(os.path.join(path, "proj_weights.npz"), **_flatten(proj))


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        _set(tree, k, v)
    return tree


def load_unet_dir(path: str):
    """Load a UNet saved by :func:`save_unet_dir`. Returns
    (config, params, proj_or_None)."""
    cfg = json.load(open(os.path.join(path, "unet_config.json")))
    for k in ("block_out_channels", "down_block_types", "up_block_types"):
        cfg[k] = tuple(cfg[k])
    config = UNet2DConditionConfig(**cfg)
    flat = dict(np.load(os.path.join(path, "unet_params.npz")))
    params = _unflatten(flat)
    proj = None
    proj_path = os.path.join(path, "proj_weights.npz")
    if os.path.exists(proj_path):
        proj = _unflatten(dict(np.load(proj_path)))
    return config, params, proj
