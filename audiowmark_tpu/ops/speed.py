"""Speed-search device kernels: half-rate sync mag matrices and the
(speed x offset) comparison grid.

Reference behavior (src/wmspeed.cc): for each candidate center speed the
audio clip is resampled by center/2 (downsample x2 for performance), a
512-point hop-128 dB spectrogram is reduced to per-sync-bit (umag, dmag)
pairs (the MagMatrix), and each relative speed is scored by scanning all
block offsets in 16.16 fixed point across 3 consecutive blocks.

TPU design: the MagMatrix is (like the sync sweep) one matmul
S @ V^T against the sync band-selection matrix; the offset scan for all
relative speeds becomes a batched gather + one-hot segment-sum (MXU matmul)
over (states x entries).  The 16.16 fixed-point index arithmetic is done in
exact int64 so offsets match the reference's rounding bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..params import Params
from ..tables import KeyTables
from .resample import resample_buffer

SUB_FRAME = Params.frame_size // 2          # 512
SUB_HOP = Params.sync_search_step // 2      # 128
N_BANDS = Params.max_band - Params.min_band + 1
OFFSET_SHIFT = 16
_LOG2_DB = 3.01029995663981


@lru_cache(maxsize=None)
def _sub_window() -> np.ndarray:
    """Sum-normalized Hann window of length 512 (gen_normalized_window)."""
    n = SUB_FRAME
    i = np.arange(n, dtype=np.float64)
    x = (i - n / 2.0) / (n / 2.0)
    win = np.where(np.abs(x) > 1, 0.0, 0.5 * np.cos(x * np.pi) + 0.5)
    win *= 2.0 / win.sum()
    return win.astype(np.float32)


@dataclass
class SpeedSyncBits:
    """Sync entries sorted by frame (across bits), BLOCK mode."""
    frame: np.ndarray     # (510,) int32
    bit: np.ndarray       # (510,) int32
    v: np.ndarray         # (1020, N_BANDS): row 2j up, 2j+1 down
    frames_per_block: int


def build_speed_sync_bits(tables: KeyTables) -> SpeedSyncBits:
    sfb = Params.sync_frames_per_bit
    entries = []
    for bit in range(Params.sync_bits):
        for f in range(sfb):
            fidx = bit * sfb + f
            entries.append((int(tables.pos_vec[fidx]), bit,
                            tables.sync_up[fidx] - Params.min_band,
                            tables.sync_dn[fidx] - Params.min_band))
    entries.sort(key=lambda e: e[0])
    J = len(entries)
    frame = np.array([e[0] for e in entries], dtype=np.int32)
    bit = np.array([e[1] for e in entries], dtype=np.int32)
    v = np.zeros((2 * J, N_BANDS), dtype=np.float32)
    for j, (_, _, up, dn) in enumerate(entries):
        v[2 * j, up] = 1.0
        v[2 * j + 1, dn] = 1.0
    return SpeedSyncBits(frame=frame, bit=bit, v=v,
                         frames_per_block=tables.frames_per_block)


@lru_cache(maxsize=None)
def _sub_dft_matrix() -> np.ndarray:
    """Windowed real DFT onto bands [min_band, max_band] of the 512-point
    frame: (SUB_FRAME, 2*N_BANDS) [cos | sin] columns (same MXU trick as
    ops/sync._dft_matrix — one matmul instead of a 257-bin rfft)."""
    b = np.arange(Params.min_band, Params.max_band + 1)
    j = np.arange(SUB_FRAME)
    ang = -2.0 * np.pi * np.outer(j, b) / SUB_FRAME
    m = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    return (m * _sub_window()[:, None].astype(np.float64)).astype(np.float32)


@partial(jax.jit, static_argnames=("use_dft",))
def _mag_matrix_core(windows: jnp.ndarray, win: jnp.ndarray,
                     dftm: jnp.ndarray, v: jnp.ndarray, use_dft: bool):
    """(rows, C, SUB_FRAME) -> (rows, 2*J) up/down band sums."""
    if use_dft:
        rows, C, _ = windows.shape
        spec = jnp.dot(windows.reshape(rows * C, SUB_FRAME), dftm,
                       preferred_element_type=jnp.float32)
        abs2 = (spec[:, :N_BANDS] ** 2
                + spec[:, N_BANDS:] ** 2).reshape(rows, C, N_BANDS)
    else:
        spec = jnp.fft.rfft(windows * win[None, None, :], axis=-1)
        spec = spec[:, :, Params.min_band:Params.max_band + 1]
        abs2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(_LOG2_DB),
                   jnp.float32(-96.0))
    S = jnp.sum(db, axis=1)
    return jnp.dot(S, v.T, preferred_element_type=jnp.float32)


def prepare_mag_matrix(clip_samples: np.ndarray, n_channels: int,
                       center: float, scan_seconds: float,
                       sync_bits: SpeedSyncBits) -> np.ndarray:
    """Resample clip by center/2 (truncated to scan_seconds/center of input)
    and reduce to the (rows, 2*J) sync mag matrix
    (reference: src/wmspeed.cc:204-268)."""
    limit = n_channels * int(round(Params.mark_sample_rate
                                   * scan_seconds / center))
    samples = clip_samples[: min(clip_samples.size, limit)]
    sub = resample_buffer(samples, n_channels, center / 2)
    x = sub.reshape(-1, n_channels)
    n_frames = x.shape[0]
    rows = 0
    pos = 0
    while pos + SUB_FRAME < n_frames:
        rows += 1
        pos += SUB_HOP
    if rows <= 0:
        return np.zeros((0, sync_bits.v.shape[0]), dtype=np.float32)
    idx = (np.arange(rows)[:, None] * SUB_HOP + np.arange(SUB_FRAME)[None, :])
    windows = np.ascontiguousarray(x[idx].transpose(0, 2, 1))
    bucket = -(-rows // 1024) * 1024   # shape-stable compile across centers
    if bucket != rows:
        windows = np.concatenate(
            [windows,
             np.zeros((bucket - rows,) + windows.shape[1:], np.float32)])
    out = np.asarray(_mag_matrix_core(
        jnp.asarray(windows), jnp.asarray(_sub_window()),
        jnp.asarray(_sub_dft_matrix()), jnp.asarray(sync_bits.v),
        jax.default_backend() == "tpu"))
    return out[:rows]


def _row_bucket(rows: int) -> int:
    """Round rows up to a bucket so the compare kernel compiles once per
    bucket instead of once per center speed."""
    bucket = 1024
    return max(bucket, -(-rows // bucket) * bucket)


def compare_speed_batch(D: np.ndarray, sync_bits: SpeedSyncBits,
                        relative_speeds: List[float], center: float
                        ) -> List[Tuple[float, float]]:
    """Best (quality, speed) over all offsets for a batch of relative speeds
    (reference: src/wmspeed.cc:270-382).

    The 16.16 fixed-point offset arithmetic matches the reference exactly:
      state_off = offset * trunc-double((1<<16) / rel)
      frame_off = trunc(((block*fpb + frame) * 4 / rel + 0.5) * (1<<16))
      index     = (state_off + frame_off) >> 16, valid while state_off +
                  frame_off >= 0 (raw) and index < rows.
    Those per-speed scalars are tiny and computed host-side in float64; the
    gather + segment reduction runs on device with bucketed shapes.
    """
    rows = D.shape[0]
    if rows == 0:
        return [(0.0, rel * center) for rel in relative_speeds]

    J = sync_bits.frame.size
    steps_per_frame = Params.frame_size // Params.sync_search_step
    pad_start = sync_bits.frames_per_block * steps_per_frame + steps_per_frame

    bucket = _row_bucket(rows)
    if bucket != rows:
        D = np.concatenate(
            [D, np.zeros((bucket - rows, D.shape[1]), np.float32)], axis=0)

    frames = sync_bits.frame.astype(np.float64)
    f_off_all = np.empty((len(relative_speeds), 3 * J), dtype=np.int64)
    for i, rel in enumerate(relative_speeds):
        inv = 1.0 / rel
        for block in range(3):
            val = ((block * sync_bits.frames_per_block + frames)
                   * steps_per_frame * inv + 0.5) * (1 << OFFSET_SHIFT)
            f_off_all[i, block * J:(block + 1) * J] = np.trunc(val)

    offs = np.arange(-pad_start, 0, dtype=np.float64)
    state_off_all = np.stack([
        np.trunc(offs * ((1 << OFFSET_SHIFT) / rel)).astype(np.int64)
        for rel in relative_speeds])                      # (R, states)

    # split the exact 16.16 values into hi/lo halves so the device kernel
    # works in int32 (TPU has no int64): raw = hi*2^16 + lo with lo in
    # [0, 2^16) => idx = raw>>16 = so_hi + fo_hi + carry, raw>=0 <=> idx>=0
    def split(v):
        return ((v >> OFFSET_SHIFT).astype(np.int32),
                (v & 0xFFFF).astype(np.int32))

    so_hi, so_lo = split(state_off_all)
    fo_hi, fo_lo = split(f_off_all)

    q = np.asarray(_compare_speed_core(
        jnp.asarray(D),
        jnp.asarray(so_hi), jnp.asarray(so_lo),
        jnp.asarray(fo_hi), jnp.asarray(fo_lo),
        jnp.asarray(_bit_onehot(sync_bits)),
        jnp.int32(rows),
        jnp.float32(1.0 / (min(Params.water_delta, 0.080) * 2.9))))
    return [(float(q[i]), rel * center)
            for i, rel in enumerate(relative_speeds)]


def _bit_onehot(sync_bits: SpeedSyncBits) -> np.ndarray:
    """(3*J, 6) one-hot of each entry's sync bit."""
    J = sync_bits.frame.size
    oh = np.zeros((3 * J, 6), dtype=np.float32)
    oh[np.arange(3 * J), np.tile(sync_bits.bit, 3)] = 1.0
    return oh


@jax.jit
def _compare_speed_core(D: jnp.ndarray, so_hi: jnp.ndarray, so_lo: jnp.ndarray,
                        fo_hi: jnp.ndarray, fo_lo: jnp.ndarray,
                        bit_onehot: jnp.ndarray, rows: jnp.ndarray,
                        norm: jnp.ndarray) -> jnp.ndarray:
    """Best |quality| over states for R relative speeds.

    D: (rows_bucket, 2J); so_*: (R, states) int32; fo_*: (R, 3J) int32;
    bit_onehot: (3J, 6).  Returns (R,) best quality.
    """
    threeJ = fo_hi.shape[1]
    J = threeJ // 3

    def per_speed(args):
        s_hi, s_lo, f_hi, f_lo = args
        carry = (s_lo[:, None] + f_lo[None, :]) >> OFFSET_SHIFT
        idx = s_hi[:, None] + f_hi[None, :] + carry       # (states, 3J)
        valid = (idx >= 0) & (idx < rows)
        idx = jnp.clip(idx, 0, D.shape[0] - 1)
        mask = valid.astype(jnp.float32)

        cols = jnp.tile(jnp.arange(J, dtype=jnp.int32), 3)
        u_raw = D[idx, 2 * cols[None, :]]
        d_raw = D[idx, 2 * cols[None, :] + 1]
        # odd block (second of three) swaps up/down
        swap = jnp.concatenate([jnp.zeros(J), jnp.ones(J), jnp.zeros(J)]
                               ).astype(jnp.float32)
        u = jnp.where(swap[None, :] > 0, d_raw, u_raw) * mask
        d = jnp.where(swap[None, :] > 0, u_raw, d_raw) * mask
        u_bit = jnp.dot(u, bit_onehot, preferred_element_type=jnp.float32)
        d_bit = jnp.dot(d, bit_onehot, preferred_element_type=jnp.float32)
        cnt = jnp.dot(mask, bit_onehot, preferred_element_type=jnp.float32)

        expect = (jnp.arange(6) & 1).astype(jnp.float32)[None, :]
        raw_q = jnp.where((u_bit == 0) | (d_bit == 0), 0.0,
                          jnp.where(u_bit < d_bit, 1.0 - u_bit / d_bit,
                                    d_bit / u_bit - 1.0))
        signed = jnp.where(expect > 0, raw_q, -raw_q)
        total = jnp.sum(cnt, axis=1)
        q = jnp.where(total > 0,
                      jnp.abs(jnp.sum(signed * cnt, axis=1)
                              / jnp.maximum(total, 1.0)) * norm,
                      0.0)
        return jnp.max(q)

    return jax.lax.map(per_speed, (so_hi, so_lo, fo_hi, fo_lo))
