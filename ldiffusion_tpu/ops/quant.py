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

# "none" | "int8" | "int8_all" | "int8_record" | "int8_static". Module-level
# so model code stays declarative; flipping the mode changes traced
# computation, so set it BEFORE building/jitting. "int8" applies the
# empirical shape gate below; "int8_all" quantizes every QConv/QDense
# (ablation mode); "int8_record"/"int8_static" are the two halves of the
# statically-calibrated pipeline (see calibrate_static_scales).
_MODE = "none"

# Approximate the activation amax on a spatially-subsampled view (16× less
# bandwidth) with a safety margin. Measured dyn→static gap is the max-pass
# cost; this recovers most of it (tools/bench_int8.py).
AMAX_SUBSAMPLE = 4
AMAX_MARGIN = 1.1

# Static activation scales: {flax module path -> concrete amax (float)}.
# Populated by calibrate_static_scales; consumed under mode "int8_static",
# where the quantize step becomes a pure elementwise op (no amax reduce) that
# XLA fuses into the producing GN/SiLU pass — the measured dyn→static
# microbench gap is +5-10% (BASELINE.md round 3).
_STATIC_AMAX: dict = {}
# During "int8_record" tracing: {path -> traced exact amax} (returned as jit
# outputs by calibrate_static_scales, so they become concrete post-run).
_RECORDED: dict = {}


def set_quant_mode(mode: str) -> None:
    global _MODE
    assert mode in ("none", "int8", "int8_all", "int8_record",
                    "int8_static"), mode
    _MODE = mode


def set_static_amax(scales) -> None:
    """Install calibrated per-site activation amaxes (``None`` clears)."""
    _STATIC_AMAX.clear()
    if scales:
        _STATIC_AMAX.update(scales)


def static_amax() -> dict:
    return dict(_STATIC_AMAX)


def calibrate_static_scales(fn, *args) -> dict:
    """Run ``fn(*args)`` once under "int8_record" and return the exact
    per-call-site activation amaxes {module path: float}.

    Record-mode QConvs compute the int8 forward exactly like the gated
    dynamic mode but additionally expose their exact activation amax; this
    helper snapshots those traced values as auxiliary jit outputs so one
    execution yields concrete numbers. ``fn`` must not hide quantized calls
    inside an inner ``lax.scan`` (tracers could not escape) — calibrate on
    the non-scanned single-step program; site KEYS are flax module paths, so
    they transfer to the scanned program regardless of call order."""
    prev = _MODE
    _RECORDED.clear()
    set_quant_mode("int8_record")
    try:
        _, amaxes = jax.jit(lambda *a: (fn(*a), dict(_RECORDED)))(*args)
    finally:
        set_quant_mode(prev)
        _RECORDED.clear()
    return {k: float(v) for k, v in amaxes.items()}


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


def _act_quant(x, site=None):
    """Activation quantization dispatch on the current mode:

    * "int8_record" + site: exact full amax, recorded into ``_RECORDED`` for
      :func:`calibrate_static_scales` to snapshot.
    * "int8_static" + calibrated site: CONSTANT scale (calibrated amax ×
      AMAX_MARGIN) — the quantize is pure elementwise, fuses into the
      producer, and the amax pass disappears. Values beyond the calibrated
      range clip at ±127.
    * otherwise: dynamic subsampled amax (the round-3 default).
    """
    if site is not None and _MODE == "int8_record":
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        _RECORDED[site] = amax
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale
    if site is not None and _MODE == "int8_static" and site in _STATIC_AMAX:
        scale = jnp.float32(max(_STATIC_AMAX[site] * AMAX_MARGIN, 1e-8) / 127.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale
    return _act_quant_subsampled(x)


def record_quant_sites(fn, *args) -> list:
    """Names of the gated quantized call sites ``fn(*args)`` hits, WITHOUT
    executing anything (``jax.eval_shape`` — a pure Python trace). Unlike
    :func:`calibrate_static_scales` this tolerates sites inside ``lax.scan``
    (only the keys are read, never the traced values), so it can enumerate
    the scanned trajectory program directly. Args may be arrays or
    ShapeDtypeStructs."""
    prev = _MODE
    _RECORDED.clear()
    set_quant_mode("int8_record")
    try:
        jax.eval_shape(fn, *args)
        return sorted(_RECORDED.keys())
    finally:
        set_quant_mode(prev)
        _RECORDED.clear()


def int8_conv(x, kernel, strides, padding, bias=None, out_dtype=jnp.bfloat16,
              site=None):
    """NHWC × HWIO int8 convolution with f32 rescale.

    x: (B, H, W, Cin) float; kernel: (kh, kw, Cin, Cout) float;
    padding: sequence of (lo, hi) pairs. Activations quantize per-tensor
    (subsampled amax, or a calibrated static scale when ``site`` names a
    calibrated call site); weights per-output-channel; the conv accumulates
    in int32 on the MXU.
    """
    xq, sx = _act_quant(x, site)
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
