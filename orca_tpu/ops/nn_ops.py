"""Primitive NN ops with reference (PyTorch) numerics on TPU-friendly layouts.

All ops use channels-last layouts: 1D tensors are (N, L, C), 2D tensors are
(N, H, W, C). On TPU the channel axis then lands on the 128-wide lane
dimension (Orca towers are 32..128 channels), and XLA tiles the spatial axes
onto sublanes — this is the layout the MXU and VPU want.

Numerical semantics match torch:
  * convs are cross-correlations (same as lax.conv_general_dilated),
    zero-padded symmetrically by dilation*(k-1)//2 ("same" for odd k).
  * BatchNorm eval uses running stats with eps=1e-5
    (torch.nn.BatchNorm1d/2d defaults used throughout the reference).
  * MaxPool has no padding and floor output length (torch MaxPool1d default).
  * Upsample 'nearest' duplicates; 'bilinear' uses half-pixel centers
    (torch align_corners=False == jax.image.resize 'linear').

Reference for op inventory: /root/reference/orca_modules.py (Conv1d k=9 pad 4,
Conv2d k=3 dilated, MaxPool1d, BatchNorm1d/2d, Upsample, ReLU, Sigmoid).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5  # torch BatchNorm default


def _default_precision(x: jax.Array, w: jax.Array):
    """float32 runs at full precision (reference parity); bfloat16 uses the
    MXU's native pass (the fast TPU path)."""
    if x.dtype == jnp.bfloat16 or w.dtype == jnp.bfloat16:
        return lax.Precision.DEFAULT
    return lax.Precision.HIGHEST


def _shift1d(x: jax.Array, d: int) -> jax.Array:
    """x shifted so out[l] = x[l+d], zero-padded at the edges."""
    n, l, c = x.shape
    xs = jnp.pad(x, ((0, 0), (max(-d, 0), max(d, 0)), (0, 0)))
    return lax.slice(xs, (0, max(d, 0), 0), (n, max(d, 0) + l, c))


def _conv1d_shifted_matmul(x: jax.Array, w: jax.Array, b,
                           dilation: int) -> jax.Array:
    """Odd-k 'same' conv1d as k shifted matmuls, f32-accumulated.

    The decisive property is the TRANSPOSE: XLA's weight-gradient of a
    long-sequence NWC conv_general materializes an (N*, L, Cin, K) patch
    tensor — 18.4GB for the stage-a (4, 1Mb, 64ch, k=9) backward, an
    instant OOM on a 16GB chip — while this formulation's backward is k
    shifted (N*L, C)@(C, C) dots with no patch tensor (dW_i is a streamed
    MXU reduction). Forward numerics equal conv_general to within
    accumulation order (f32 tap accumulation; fp32 inputs use the 6-pass
    HIGHEST dots, bf16 the native MXU pass), same contract as
    _conv2d_k3_matmul."""
    prec = _default_precision(x, w)
    k = w.shape[0]
    half = (k - 1) // 2
    acc = None
    for i in range(k):
        t = jnp.einsum(
            "nlc,co->nlo",
            _shift1d(x, (i - half) * dilation),
            w[i],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        acc = t if acc is None else acc + t
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    out_dtype = (
        jnp.result_type(x, w) if b is None else jnp.result_type(x, w, b)
    )
    return acc.astype(out_dtype)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    dilation: int = 1,
    precision=None,
) -> jax.Array:
    """1D convolution, torch Conv1d semantics with 'same' padding for odd k.

    x: (N, L, Cin); w: (K, Cin, Cout); b: (Cout,).

    On TPU backends odd-k convs route through the shifted-matmul
    formulation (see _conv1d_shifted_matmul): same accumulation-order
    numerics, and its autodiff transpose avoids conv_general's
    patch-tensor weight gradient (the stage-a trainable-encoder OOM).
    default_backend() is a trace-time approximation (see conv2d).
    """
    k = w.shape[0]
    if (
        k % 2 == 1 and precision is None
        and (
            x.dtype == jnp.bfloat16
            or (x.dtype == jnp.float32
                and jax.default_backend() == "tpu")
        )
    ):
        return _conv1d_shifted_matmul(x, w, b, dilation)
    pad = dilation * (k - 1) // 2
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision or _default_precision(x, w),
    )
    if b is not None:
        out = out + b
    return out


def _shift2d(x: jax.Array, di: int, dj: int) -> jax.Array:
    """x shifted so out[h, w] = x[h+di, w+dj], zero-padded at the edges."""
    n, h, w, c = x.shape
    xs = jnp.pad(
        x, ((0, 0), (max(-di, 0), max(di, 0)), (max(-dj, 0), max(dj, 0)), (0, 0))
    )
    return lax.slice(
        xs, (0, max(di, 0), max(dj, 0), 0), (n, max(di, 0) + h, max(dj, 0) + w, c)
    )


def _conv2d_k3_matmul(x: jax.Array, w: jax.Array, b, dilation: int) -> jax.Array:
    """k=3 'same' conv as 9 shifted matmuls, f32-accumulated.

    On TPU, XLA lowers small-channel dilated NHWC convs on 250x250 maps at
    ~10 TF/s; the same contraction as 9 shifted (H*W, Cin)@(Cin, Cout) dots
    runs ~3x faster (measured: the decoder's 28 dilated residual blocks
    63.4 -> 21.8 ms on v5e at bf16; fp32 HIGHEST taps beat the dilated
    conv_general lowering up to 1.8x at dilation 64). Numerically equal
    to within accumulation order (each tap accumulates f32 on the MXU,
    taps sum in f32; fp32 inputs use 6-pass HIGHEST dots)."""
    prec = _default_precision(x, w)
    acc = None
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            t = jnp.einsum(
                "nhwc,co->nhwo",
                _shift2d(x, i * dilation, j * dilation),
                w[i + 1, j + 1],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            acc = t if acc is None else acc + t
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    # preserve standard promotion for mixed-dtype calls (bf16 x with f32
    # w/b must produce f32, like the conv_general_dilated path)
    out_dtype = (
        jnp.result_type(x, w) if b is None else jnp.result_type(x, w, b)
    )
    return acc.astype(out_dtype)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    dilation: int = 1,
    precision=None,
) -> jax.Array:
    """2D convolution, torch Conv2d semantics with 'same' padding for odd k.

    x: (N, H, W, Cin); w: (Kh, Kw, Cin, Cout); b: (Cout,).

    k=3 convs route through the shifted-matmul formulation (see
    _conv2d_k3_matmul): bf16 taps take the MXU's native pass (the fast
    serving path), fp32 taps run 6-pass HIGHEST — same reference-parity
    numerics as the conv_general lowering (equal to accumulation order),
    measurably faster at decoder dilations.
    """
    kh, kw = w.shape[0], w.shape[1]
    # fp32 takes the matmul path only on TPU: XLA:CPU's conv_general is
    # ~2x the 9-tap einsum there (measured via the CPU-mesh dry run).
    # default_backend() is a trace-time approximation: a computation
    # explicitly lowered for CPU inside a TPU-default process still takes
    # the matmul path (perf-only — numerics are identical either way; no
    # such mixed lowering exists in this codebase today).
    if (
        kh == 3 and kw == 3
        and precision is None
        and (
            x.dtype == jnp.bfloat16
            or (x.dtype == jnp.float32
                and jax.default_backend() == "tpu")
        )
    ):
        return _conv2d_k3_matmul(x, w, b, dilation)
    ph = dilation * (kh - 1) // 2
    pw = dilation * (kw - 1) // 2
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision or _default_precision(x, w),
    )
    if b is not None:
        out = out + b
    return out


def maxpool1d(x: jax.Array, k: int, stride: Optional[int] = None) -> jax.Array:
    """Max pooling over the length axis of (N, L, C); torch MaxPool1d defaults
    (no padding, floor length)."""
    stride = stride or k
    # reduce_window with VALID padding floors the output length like torch.
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, k, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )


def batchnorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = BN_EPS,
) -> jax.Array:
    """BatchNorm inference transform over the trailing channel axis."""
    inv = lax.rsqrt(var + eps) * scale
    return x * inv + (bias - mean * inv)


def batchnorm_train(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = BN_EPS
):
    """Training-mode BatchNorm over all axes but the last.

    Returns (y, batch_mean, batch_var_biased, batch_var_unbiased). The
    normalization uses the biased variance (torch semantics); running stats
    are updated with the unbiased variance by the caller.
    """
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    # two-pass variance: E[(x-mean)^2], not E[x^2]-E[x]^2 — the latter
    # cancels catastrophically for activations with |mean| >> std, which
    # makes train-mode outputs visibly depend on reduction order (sharded
    # vs single-device differed by ~1e-1 through stacked BN layers)
    var = jnp.mean(jnp.square(x - mean), axis=axes)
    n = x.size // x.shape[-1]
    var_unbiased = var * (n / max(n - 1, 1))
    inv = lax.rsqrt(var + eps) * scale
    y = x * inv + (bias - mean * inv)
    return y, mean, var, var_unbiased


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def upsample1d_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """(N, L, C) -> (N, L*scale, C), duplicating (torch Upsample 'nearest')."""
    n, l, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (n, l, scale, c)).reshape(
        n, l * scale, c
    )


def upsample2d_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """(N, H, W, C) -> (N, H*s, W*s, C), duplicating."""
    n, h, w, c = x.shape
    out = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, scale, w, scale, c)
    ).reshape(n, h * scale, w * scale, c)
    return out


def upsample2d_bilinear(x: jax.Array, scale: int = 2) -> jax.Array:
    """Bilinear 2x upsample with half-pixel centers.

    Matches torch nn.Upsample(mode='bilinear', align_corners=False), which the
    loaded H1esc/Hff/256M decoders use (orca_models.py:45-50). For scale=2 the
    interpolation weights are the fixed stencil (0.75, 0.25), so implement it
    directly with pad+slice arithmetic — cheaper than gather-based resize and
    exactly equal to jax.image.resize(..., 'linear').
    """
    if scale != 2:
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, h * scale, w * scale, c), method="linear")
    # Interleave along H: rows at half-pixel offsets -0.25 and +0.25.
    xe = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    up = 0.75 * xe[:, 1:-1] + 0.25 * xe[:, :-2]  # offset -0.25
    dn = 0.75 * xe[:, 1:-1] + 0.25 * xe[:, 2:]  # offset +0.25
    n, h, w, c = x.shape
    xh = jnp.stack([up, dn], axis=2).reshape(n, 2 * h, w, c)
    # Same along W.
    xe = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    lf = 0.75 * xe[:, :, 1:-1] + 0.25 * xe[:, :, :-2]
    rt = 0.75 * xe[:, :, 1:-1] + 0.25 * xe[:, :, 2:]
    return jnp.stack([lf, rt], axis=3).reshape(n, 2 * h, 2 * w, c)


def fold_bn_into_conv(w: jax.Array, b: jax.Array, bn: dict, eps: float = BN_EPS):
    """Fold an inference BatchNorm into the preceding conv's weights.

    y = BN(conv(x, w) + b)  ==  conv(x, w') + b' with
      w' = w * g,  b' = (b - mean) * g + beta,  g = scale / sqrt(var + eps).

    Used to strip all BN work out of the inference path; the checkpoints'
    running stats (orca_models.py load .statedict with BN buffers) are
    absorbed exactly.
    """
    g = bn["scale"] / jnp.sqrt(bn["var"] + eps)
    wf = w * g  # broadcasting over the trailing Cout axis of (K.., Cin, Cout)
    bf = (b - bn["mean"]) * g + bn["bias"]
    return wf, bf


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    """Inverted dropout; identity when rng is None (inference)."""
    if rng is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
