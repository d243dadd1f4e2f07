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

which we realize with four tiny constant-matrix MXU products (lane expand
via best @ M_left/M_right, row interleave via P/Q selection) — Mosaic has
no lane-splitting reshape, and at 128x128x128 these matmuls are free next
to the VPU work.

STATUS: experimental.  The selection matmuls run through the MXU's bf16
f32-emulation, so expanded metrics can differ from the exact scan by
~2^-22 relative — enough to flip decisions on exact metric ties.  The
production decoder therefore uses the lax.scan path (convcode.py); this
kernel is kept as the template for a future exact in-VMEM trellis and is
validated in interpreter mode.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STATE_COUNT = 1 << 15
ROWS = STATE_COUNT // 128           # 256
_BIG = 1e9


@lru_cache(maxsize=None)
def _expand_consts():
    m_left = np.zeros((128, 128), dtype=np.float32)
    m_right = np.zeros((128, 128), dtype=np.float32)
    for lane in range(128):
        m_left[lane >> 1, lane] = 1.0
        m_right[64 + (lane >> 1), lane] = 1.0
    p_even = np.zeros((ROWS, 128), dtype=np.float32)
    p_odd = np.zeros((ROWS, 128), dtype=np.float32)
    for t in range(128):
        p_even[2 * t, t] = 1.0
        p_odd[2 * t + 1, t] = 1.0
    return m_left, m_right, p_even, p_odd


def _expand(best, ml, mr, pe, po):
    """(128,128) predecessor values -> (256,128) expanded[s] = best[s>>1]."""
    a = jnp.dot(best, ml, preferred_element_type=jnp.float32)
    b = jnp.dot(best, mr, preferred_element_type=jnp.float32)
    return (jnp.dot(pe, a, preferred_element_type=jnp.float32)
            + jnp.dot(po, b, preferred_element_type=jnp.float32))


def _acs_kernel(bm_ref, ml_ref, mr_ref, pe_ref, po_ref,
                dec_ref, metric_out_ref, metric):
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

    ml, mr, pe, po = ml_ref[:], mr_ref[:], pe_ref[:], po_ref[:]
    metric[:] = _expand(best, ml, mr, pe, po) + bm_ref[0]
    dec_ref[0] = (_expand(dec, ml, mr, pe, po) > 0.5).astype(jnp.int8)
    metric_out_ref[:] = metric[:]


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_acs_pallas(bm: jnp.ndarray, interpret: bool = False):
    """Run the full ACS trellis.

    bm: (steps, 32768) float32 branch metrics.
    Returns (decisions (steps, 32768) int8, final metric (256, 128) f32).
    """
    steps = bm.shape[0]
    bm3 = bm.reshape(steps, ROWS, 128)
    consts = [jnp.asarray(c) for c in _expand_consts()]
    const_spec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    prow_spec = pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    dec, metric = pl.pallas_call(
        _acs_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec, const_spec, prow_spec, prow_spec,
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
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(bm3, *consts)
    return dec.reshape(steps, STATE_COUNT), metric
