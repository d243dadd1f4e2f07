"""Per-candidate raw soft-bit extraction (the block-decode core).

One function shared by the decoder's standalone batch kernel
(models/decoder._block_raw_batch_dev) and the fused sync searcher
(ops/search_fused), which chains it onto the refined candidate positions
so the CLI get path never pays a separate extraction round trip over the
host link.

Reference semantics: the 2226-frame block dB spectrogram (fft_range,
src/wmcommon.cc:123-141), prev/next spectral background subtraction with
edge reflection + channel sum (src/wmget.cc:86-97), keyed up/down band
gathers and per-bit sums (mix_decode/linear_decode, src/wmget.cc:67-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Params
from .frames import FRAME, MIN_DB, _LOG2_DB
from .sync import band_dot


def block_raw_one(x: jnp.ndarray, i: jnp.ndarray, awin: jnp.ndarray,
                  dftm: jnp.ndarray, lay_frame: jnp.ndarray,
                  lay_up: jnp.ndarray, lay_dn: jnp.ndarray, count: int,
                  use_dft: int, mix: bool, group: int, fpb: int,
                  n_ch: int) -> jnp.ndarray:
    """Raw (pre-bit-order, pre-normalize) soft bits for ONE candidate block
    start.

    x: (n*C,) float32 interleaved FLAT (a materialized (n, 2) array on TPU
    pads the minor dim to 128 lanes — 64x memory); i: per-channel sample
    index of the block start.  On TPU the 81 bands come from one MXU matmul
    against the windowed band-restricted DFT matrix (use_dft mode 2 = bf16
    operands); use_dft 0 keeps the CPU rfft numerics.

    mix mode:    lay_frame/lay_up/lay_dn are (n_data*30,) mix entries.
    linear mode: lay_frame is (n_data_frames,), lay_up/lay_dn are
                 (n_data_frames, 30) band tables.

    Out-of-range starts are clamped by dynamic_slice — callers drop those
    candidates host-side (i + count*FRAME <= true frames), matching the
    reference's skip of blocks reading past the end."""
    n_bands = Params.max_band - Params.min_band + 1
    C = n_ch
    w = jax.lax.dynamic_slice_in_dim(x, i * C, count * FRAME * C)
    if use_dft:
        flat = jnp.swapaxes(w.reshape(count, FRAME, C), 1, 2)
        spec = band_dot(flat.reshape(count * C, FRAME), dftm, use_dft)
        abs2 = spec[:, :n_bands] ** 2 + spec[:, n_bands:] ** 2
        abs2 = abs2.reshape(count, C, n_bands)
    else:
        wf = jnp.swapaxes(w.reshape(count, FRAME, C), 1, 2)
        spec = jnp.fft.rfft(wf * awin[None, None, :], axis=-1)
        spec = spec[:, :, Params.min_band:Params.max_band + 1]
        abs2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(_LOG2_DB),
                   jnp.float32(MIN_DB))
    # background subtraction with edge reflection
    # (src/wmget.cc:86-97) + channel sum
    nxt = jnp.concatenate([jnp.arange(1, count),
                           jnp.array([count - 2])])
    prv = jnp.concatenate([jnp.array([1]), jnp.arange(count - 1)])
    A = jnp.sum(db - 0.5 * (db[prv] + db[nxt]), axis=1)
    if mix:
        u = A[lay_frame, lay_up]
        d = A[lay_frame, lay_dn]
        raw = jnp.sum((u - d).reshape(-1, group), axis=1)
    else:
        u = jnp.sum(A[lay_frame[:, None], lay_up], axis=1)
        d = jnp.sum(A[lay_frame[:, None], lay_dn], axis=1)
        raw = jnp.sum((u - d).reshape(-1, fpb), axis=1)
    return raw
