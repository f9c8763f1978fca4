"""W8A8 int8 quantized matmul/conv ops.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394.7 vs 197 TOPS), and
the profile shows the pipeline's convs at 70-77% MXU occupancy (BASELINE.md
round 2) — quantization changes the cost class of the conv-bound fraction.

Scheme: symmetric dynamic quantization. Weights quantize per-OUTPUT-channel
(max|w| per channel / 127); activations per-tensor (max|x| / 127, computed on
the fly — one extra reduction+scale pass that XLA fuses with the producer).
Master params stay f32/bf16: quantization happens in the forward math, so
checkpoints, converters, and the parity suite are untouched and the mode is
a pure runtime flag.

The reference has no quantization (fp32 CUDA throughout, reference
``ldiffusion.py:66-70``); this is a TPU-native performance feature, OFF by
default and A/B-gated on accuracy (see tests/test_quant.py and BASELINE.md).

INFERENCE-ONLY: ``jnp.round`` has zero gradient, so training under an int8
mode would silently produce zero weight gradients through quantized layers
(a straight-through estimator is not implemented). Keep the mode "none"
for any differentiated step — the trainers never flip it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# "none" | "int8" | "int8_all". Module-level so model code stays declarative;
# flipping the mode changes traced computation, so set it BEFORE
# building/jitting. "int8" applies the empirical shape gate below;
# "int8_all" quantizes every QConv/QDense (ablation mode).
_MODE = "none"

# Approximate the activation amax on a spatially-subsampled view (16× less
# bandwidth) with a safety margin. Measured dyn→static gap is the max-pass
# cost; this recovers most of it (tools/bench_int8.py).
AMAX_SUBSAMPLE = 4
AMAX_MARGIN = 1.1


def set_quant_mode(mode: str) -> None:
    global _MODE
    assert mode in ("none", "int8", "int8_all"), mode
    _MODE = mode


def quant_mode() -> str:
    return _MODE


def conv_shape_gate(cin: int, cout: int) -> bool:
    """Empirical v5e win table (tools/bench_int8.py, BASELINE.md round 3):
    int8 conv beats bf16 at deep channels — (256,256) 1.16×, (512,256) 1.19×,
    (512,512) 1.29-1.42×, (640,640) 1.15×, (1280,640) 1.27×, (1280,1280)
    1.15× — and LOSES at c128 (0.89×), c320 (0.90×), 960→320 (0.96×), and
    the 3→128 stem (0.55×): the dynamic-quant bandwidth tax outweighs the
    MXU gain when the narrow side isn't deep. Gate: min channel ≥ 384, or
    exactly the 256-deep square case."""
    m = min(cin, cout)
    return m >= 384 or m == 256


def _sym_quant(x, axes, dtype=jnp.int8):
    """Symmetric int8 quantization. ``axes`` are the REDUCED axes of the
    amax (one scale per coordinate of the remaining axes — e.g. conv weights
    pass axes=(0, 1, 2) to keep a per-Cout scale). Returns (q, scale) with
    x ≈ q * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(dtype)
    return q, scale


def _act_quant_subsampled(x):
    """Per-tensor activation quantization with the amax estimated on a
    ::AMAX_SUBSAMPLE spatial view × AMAX_MARGIN (values above the estimate
    clip at ±127 — bounded error the tests budget for)."""
    if x.ndim == 4 and x.shape[1] >= 4 * AMAX_SUBSAMPLE \
            and x.shape[2] >= 4 * AMAX_SUBSAMPLE:
        view = x[:, ::AMAX_SUBSAMPLE, ::AMAX_SUBSAMPLE, :]
    else:
        view = x
    amax = jnp.max(jnp.abs(view.astype(jnp.float32))) * AMAX_MARGIN
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(x, kernel, strides, padding, bias=None, out_dtype=jnp.bfloat16):
    """NHWC × HWIO int8 convolution with f32 rescale.

    x: (B, H, W, Cin) float; kernel: (kh, kw, Cin, Cout) float;
    padding: sequence of (lo, hi) pairs. Activations quantize per-tensor
    (subsampled amax); weights per-output-channel; the conv accumulates in
    int32 on the MXU.
    """
    xq, sx = _act_quant_subsampled(x)
    wq, sw = _sym_quant(kernel, axes=(0, 1, 2))        # per-out-channel
    out = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx.reshape(()) * sw.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_matmul(x, w, bias=None, out_dtype=jnp.bfloat16):
    """(..., K) × (K, N) int8 matmul with f32 rescale. Weights per-column."""
    xq, sx = _sym_quant(x, axes=tuple(range(x.ndim)))  # per-tensor
    wq, sw = _sym_quant(w, axes=(0,))                  # per-out-column
    out = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx.reshape(()) * sw.reshape(-1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
