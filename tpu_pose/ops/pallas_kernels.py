"""Pallas TPU kernels (SURVEY.md §2 row 17, §7 step 6).

The reference has zero first-party native code — its kernels live inside
the TF binary. Here the "native layer" is Pallas (Mosaic-compiled TPU
kernels). Policy is benchmark-gated (SURVEY.md §7 hard parts #4): a
kernel ships as an *alternative implementation* behind the default XLA
path and becomes default only where measured faster; either way it is
equality-tested against the XLA path (tests/test_pallas.py).

Kernels:
- :func:`soft_argmax_pallas` — fused decode: per-map softmax + spatial
  expectation + confidence in ONE VMEM-resident pass over the heatmaps
  (the XLA path materializes the (B,H,W,P) probability tensor in HBM
  between the softmax and the two expectation einsums).
- :func:`quantize_act_pallas` — fused abs-max + scale + round-clip int8
  activation quantization (pallas_guide.md 'Quantization Kernels'
  pattern), for the dynamic-scale int8 serving path.

All kernels run in interpreter mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Fused soft-argmax decode
# ---------------------------------------------------------------------------

def _softargmax_kernel(hm_ref, xs_ref, ys_ref, out_ref, *, beta: float):
    """One (TILE_R, PAD) block: rows are flattened belief maps (padded
    with -inf), lanes the spatial axis. Row-wise softmax → expectation."""
    x = hm_ref[:]                                   # (TR, PAD) f32
    m = jnp.max(x, axis=1, keepdims=True)           # (TR, 1) = confidence
    e = jnp.exp(beta * (x - m))                     # -inf pads → exactly 0
    z = jnp.sum(e, axis=1, keepdims=True)
    p = e / z
    ex = jnp.sum(p * xs_ref[:], axis=1)             # (TR,)
    ey = jnp.sum(p * ys_ref[:], axis=1)
    out = jnp.stack([ex, ey, m[:, 0]], axis=1)      # (TR, 3)
    out_ref[:, :3] = out


def soft_argmax_pallas(heatmaps: jnp.ndarray, beta: float = 100.0,
                       stride: int = 8, interpret: bool = False):
    """Pallas-fused equivalent of ops/softargmax.soft_argmax.

    Args/returns identical to the XLA version: (..., H, W, C) belief maps
    (last channel = background, excluded) → ((..., C-1, 2) pixel joints,
    (..., C-1) confidences).
    """
    parts = heatmaps[..., :-1].astype(jnp.float32)
    *lead, h, w, p = parts.shape
    rows_shape = tuple(lead) + (p,)
    n_rows = int(np.prod(rows_shape)) if rows_shape else 1

    hw = h * w
    pad = _pad_to(hw, _LANES)
    tile_r = 8
    rows_padded = _pad_to(n_rows, tile_r)

    # (B..., H, W, P) → (rows, H*W), rows = leading axes × parts.
    flat = jnp.moveaxis(parts, -1, -3).reshape(n_rows, hw)
    flat = jnp.pad(flat, ((0, rows_padded - n_rows), (0, pad - hw)),
                   constant_values=-jnp.inf)

    # Spatial coordinate row-vectors in input pixels (pad region: 0).
    idx = np.arange(pad, dtype=np.int64)
    xs = np.where(idx < hw, (idx % w) * stride, 0).astype(np.float32)
    ys = np.where(idx < hw, (idx // w) * stride, 0).astype(np.float32)

    out = pl.pallas_call(
        functools.partial(_softargmax_kernel, beta=beta),
        grid=(rows_padded // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.float32),
        interpret=interpret,
    )(flat, xs[None, :], ys[None, :])

    out = out[:n_rows]
    joints = out[:, :2].reshape(*rows_shape, 2)
    conf = out[:, 2].reshape(rows_shape)
    return joints, conf


# ---------------------------------------------------------------------------
# Fused int8 activation quantization (dynamic scale)
# ---------------------------------------------------------------------------

def _quantize_kernel(x_ref, scale_ref, q_ref):
    """Whole-array block: scale already computed (SMEM); round+clip."""
    s = scale_ref[0, 0]
    y = x_ref[:] / s
    q_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def quantize_act_pallas(x: jnp.ndarray, interpret: bool = False):
    """(x → int8, scale): symmetric per-tensor activation quantization.

    The abs-max reduction stays in XLA (it parallelizes across the whole
    chip); the round/clip/cast runs as one Pallas pass. Returns the same
    (values, scale) contract as models/cpm._quantize_act.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)

    orig_shape = xf.shape
    n = int(np.prod(orig_shape))
    # Grid-tile rows so arbitrarily large activations stream through VMEM
    # (a whole-array block overflows VMEM beyond ~32M elements).
    tile_r = 512
    pad = _pad_to(n, tile_r * _LANES)
    flat = jnp.pad(xf.reshape(-1), (0, pad - n)).reshape(-1, _LANES)

    q = pl.pallas_call(
        _quantize_kernel,
        grid=(flat.shape[0] // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.int8),
        interpret=interpret,
    )(flat, scale.reshape(1, 1))

    return q.reshape(-1)[:n].reshape(orig_shape), scale
