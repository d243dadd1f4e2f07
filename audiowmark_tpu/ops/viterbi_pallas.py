"""Pallas TPU kernel for the Viterbi add-compare-select recursion.

The order-15 code has 32768 states; each trellis step computes

    new_metric[s] = min(old[s>>1], old[(s>>1) + 2^14]) + bm[s]

The lax.scan form round-trips the 128 KB metric vector through XLA buffers
every step; this kernel instead runs the whole trellis as ONE pallas_call
with the metric held in a VMEM scratch across sequential grid steps — the
branch-metric row streams in per step, the decision row streams out.

Layout: metrics live as (256, 128) f32, state = row*128 + lane.  The
predecessor halves are rows [0,128) and [128,256).  The repeat-by-2
expansion expanded[s] = best[s>>1] decomposes as

    expanded[2t, l]   = best[t, l>>1]          (left half, lane-doubled)
    expanded[2t+1, l] = best[t, 64 + (l>>1)]   (right half, lane-doubled)

The repeat-by-2 expansion uses transposes + sublane-strided stores (both
native Mosaic ops), so the kernel is BIT-EXACT with the lax.scan reference —
verified on hardware (equal metrics and decisions) — and ~4x faster in real
device time.  convcode._viterbi_core dispatches to it on TPU backends.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STATE_COUNT = 1 << 15
ROWS = STATE_COUNT // 128           # 256
_BIG = 1e9


def _acs_kernel(bm_ref, dec_ref, metric_out_ref, metric, t_scratch, e_scratch):
    """Exact in-VMEM trellis step.

    The flat repeat-by-2 expansion expanded[s] = best[s>>1] is realized with
    transposes + sublane-strided stores (both native Mosaic ops, bit-exact):
        A[t, l] = best[t, l>>1]        == transpose(dup-rows(best^T[:64]))
        B[t, l] = best[t, 64 + (l>>1)] == transpose(dup-rows(best^T[64:]))
        expanded[0::2] = A, expanded[1::2] = B
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        metric[:] = jnp.where((rows == 0) & (lanes == 0), 0.0, _BIG)

    m = metric[:]
    lo = m[: ROWS // 2, :]
    hi = m[ROWS // 2:, :]
    dec = (hi < lo).astype(jnp.float32)
    best = jnp.where(dec > 0, hi, lo)

    def expand(x):
        xt = x.T
        t_scratch[0::2, :] = xt[0:64]
        t_scratch[1::2, :] = xt[0:64]
        e_scratch[0::2, :] = t_scratch[:].T
        t_scratch[0::2, :] = xt[64:128]
        t_scratch[1::2, :] = xt[64:128]
        e_scratch[1::2, :] = t_scratch[:].T
        return e_scratch[:]

    dec_ref[0] = (expand(dec) > 0.5).astype(jnp.int8)
    metric[:] = expand(best) + bm_ref[0]
    metric_out_ref[:] = metric[:]


def _acs_kernel_batch(bm_ref, dec_ref, metric_out_ref, metric, t_scratch,
                      e_scratch):
    """Batched trellis step: B independent sequences advance together.

    Identical math to _acs_kernel with a leading batch dim — the per-step
    vector work grows B-wide (still tiny against VPU width) while the
    sequential grid stays at `steps`, so B trellises cost one trellis's
    serial latency instead of B (the A/B generator split plus top-k
    candidates otherwise serialize 16 kernels of 143 steps each).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, metric.shape, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, metric.shape, 2)
        metric[:] = jnp.where((rows == 0) & (lanes == 0), 0.0, _BIG)

    m = metric[:]
    lo = m[:, : ROWS // 2, :]
    hi = m[:, ROWS // 2:, :]
    dec = (hi < lo).astype(jnp.float32)
    best = jnp.where(dec > 0, hi, lo)

    def expand(x):
        xt = jnp.swapaxes(x, 1, 2)                  # (B, 128, 128)
        t_scratch[:, 0::2, :] = xt[:, 0:64, :]
        t_scratch[:, 1::2, :] = xt[:, 0:64, :]
        e_scratch[:, 0::2, :] = jnp.swapaxes(t_scratch[:], 1, 2)
        t_scratch[:, 0::2, :] = xt[:, 64:128, :]
        t_scratch[:, 1::2, :] = xt[:, 64:128, :]
        e_scratch[:, 1::2, :] = jnp.swapaxes(t_scratch[:], 1, 2)
        return e_scratch[:]

    dec_ref[0] = (expand(dec) > 0.5).astype(jnp.int8)
    metric[:] = expand(best) + bm_ref[0]
    metric_out_ref[:] = metric[:]


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_acs_pallas_batch(bm: jnp.ndarray, interpret: bool = False):
    """Batched ACS trellis.

    bm: (B, steps, 32768) float32.  Returns (decisions (B, steps, 32768)
    int8, final metrics (B, 256, 128) f32).  Bit-exact with running
    viterbi_acs_pallas per sequence.
    """
    B, steps = bm.shape[0], bm.shape[1]
    bm4 = jnp.swapaxes(bm.reshape(B, steps, ROWS, 128), 0, 1)
    dec, metric = pl.pallas_call(
        _acs_kernel_batch,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, B, ROWS, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, ROWS, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ROWS, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, B, ROWS, 128), jnp.int8),
            jax.ShapeDtypeStruct((B, ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, ROWS, 128), jnp.float32),
                        pltpu.VMEM((B, 128, 128), jnp.float32),
                        pltpu.VMEM((B, ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(bm4)
    return (jnp.swapaxes(dec, 0, 1).reshape(B, steps, STATE_COUNT), metric)


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_acs_pallas(bm: jnp.ndarray, interpret: bool = False):
    """Run the full ACS trellis.

    bm: (steps, 32768) float32 branch metrics.
    Returns (decisions (steps, 32768) int8, final metric (256, 128) f32).
    """
    steps = bm.shape[0]
    bm3 = bm.reshape(steps, ROWS, 128)
    dec, metric = pl.pallas_call(
        _acs_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, ROWS, 128), jnp.int8),
            jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32),
                        pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(bm3)
    return dec.reshape(steps, STATE_COUNT), metric
