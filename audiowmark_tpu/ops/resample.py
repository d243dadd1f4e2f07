"""Windowed-sinc polyphase resampler (zita-compatible timing protocol).

The reference uses zita-resampler (hlen=16) with a pre-pad of k/2-1 and a
post-pad of k/2 zeros so resampling has zero group delay and the output
length is exactly lrint(in_frames * ratio) (src/resample.cc:30-50).  This is
a from-scratch windowed-sinc design with the same *observable* protocol:

    y[j] = sum_n x[n] * h(j/ratio - n),   h(t) = fr*sinc(fr*t)*blackman(t/T)

with fr = min(1, ratio) (anti-alias cutoff), T = hlen/fr taps half-width, and
x zero-padded outside its support.  ratio == 1 reduces to the identity.

Whole-buffer resampling evaluates coefficient tiles on the fly (arbitrary
real ratios, like zita's VResampler) and runs the inner gather+dot either in
numpy (small) or JAX (bulk).  `StreamingResampler` carries state for the
embedder's frame pipeline and implements the reference's 1-second-periodic
`skip()` arithmetic exactly (src/resample.cc:150-167).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..params import Params

HLEN = 16


def _filter_params(ratio: float):
    fr = min(1.0, ratio)
    half_width = HLEN / fr                    # taps half-width in input samples
    # round taps up to a multiple of 16 so nearby ratios share one compiled
    # kernel shape; the extra taps fall outside the window (zero coefficient)
    half_taps = -(-int(np.ceil(half_width)) // 8) * 8
    n_taps = 2 * half_taps
    return fr, half_width, half_taps, n_taps


def _coeffs(frac: np.ndarray, ratio: float) -> np.ndarray:
    """Coefficient rows for fractional positions: (J, n_taps) float32.

    frac[j] in [0,1): position of output j relative to the base input sample
    floor(p_j); tap m covers input offset (m - (half_taps-1)).
    """
    fr, half_width, half_taps, n_taps = _filter_params(ratio)
    m = np.arange(n_taps, dtype=np.float64)[None, :] - (half_taps - 1)
    t = frac.astype(np.float64)[:, None] - m   # p_j - n, in input samples
    x = t * fr
    sinc = np.sinc(x)                          # sin(pi x)/(pi x)
    w_arg = t / half_width
    win = np.where(np.abs(w_arg) >= 1.0, 0.0,
                   0.42 + 0.5 * np.cos(np.pi * w_arg)
                   + 0.08 * np.cos(2 * np.pi * w_arg))
    return (fr * sinc * win).astype(np.float32)


@partial(jax.jit, static_argnames=("n_taps",))
def _resample_tile(xpad: jnp.ndarray, base: jnp.ndarray, frac: jnp.ndarray,
                   fr: jnp.ndarray, half_width: jnp.ndarray, n_taps: int):
    """One output tile: windowed-sinc coefficients computed on device (f32)
    fused with the gather + weighted sum.

    y[j, c] = sum_m xpad[base[j] + m, c] * h(frac[j] - (m - half + 1))
    """
    half_taps = n_taps // 2
    m = jnp.arange(n_taps, dtype=jnp.float32)[None, :] - (half_taps - 1)
    t = frac[:, None] - m
    x = t * fr
    sinc = jnp.sinc(x)
    w_arg = t / half_width
    win = jnp.where(jnp.abs(w_arg) >= 1.0, 0.0,
                    0.42 + 0.5 * jnp.cos(jnp.pi * w_arg)
                    + 0.08 * jnp.cos(2 * jnp.pi * w_arg))
    coeff = fr * sinc * win
    gathered = xpad[base[:, None] + jnp.arange(n_taps)[None, :]]  # (J, M, C)
    return jnp.einsum("jmc,jm->jc", gathered, coeff,
                      preferred_element_type=jnp.float32)


def resample_buffer(samples: np.ndarray, n_channels: int, ratio: float,
                    out_frames: Optional[int] = None) -> np.ndarray:
    """Resample interleaved samples by `ratio`; returns interleaved output of
    round(in_frames*ratio) frames (or `out_frames` if given)."""
    x = np.asarray(samples, dtype=np.float32).reshape(-1, n_channels)
    in_frames = x.shape[0]
    if out_frames is None:
        out_frames = int(round(in_frames * ratio))
    if ratio == 1.0:
        out = np.zeros((out_frames, n_channels), dtype=np.float32)
        n = min(out_frames, in_frames)
        out[:n] = x[:n]
        return out.reshape(-1)

    _, _, half_taps, n_taps = _filter_params(ratio)
    xpad = np.zeros((in_frames + n_taps, n_channels), dtype=np.float32)
    xpad[half_taps - 1: half_taps - 1 + in_frames] = x
    # output j center p_j = j/ratio; base index into xpad of tap 0:
    #   floor(p_j) - (half_taps-1) + (half_taps-1) [pad offset] = floor(p_j)
    j = np.arange(out_frames, dtype=np.float64)
    p = j / ratio
    ip = np.floor(p)
    frac = (p - ip).astype(np.float64)
    base = ip.astype(np.int64)
    base = np.clip(base, 0, in_frames + n_taps - n_taps)  # guard (p>=0 anyway)

    # bucket shapes so XLA compiles once per (tap count, channel) combo
    # rather than once per input length / ratio
    fr, half_width, half_taps, n_taps = _filter_params(ratio)
    XBUCKET = 1 << 16
    xb = -(-xpad.shape[0] // XBUCKET) * XBUCKET
    if xb != xpad.shape[0]:
        xpad = np.concatenate(
            [xpad, np.zeros((xb - xpad.shape[0], n_channels), np.float32)])
    xpad_j = jnp.asarray(xpad)

    out = np.empty((out_frames, n_channels), dtype=np.float32)
    TILE = 1 << 18
    for start in range(0, out_frames, TILE):
        end = min(start + TILE, out_frames)
        n = end - start
        f = frac[start:end].astype(np.float32)
        b = base[start:end].astype(np.int32)
        if n < TILE:  # pad the final tile to the fixed shape
            f = np.concatenate([f, np.zeros(TILE - n, np.float32)])
            b = np.concatenate([b, np.zeros(TILE - n, dtype=np.int32)])
        y = _resample_tile(xpad_j, jnp.asarray(b), jnp.asarray(f),
                           jnp.float32(fr), jnp.float32(half_width), n_taps)
        out[start:end] = np.asarray(y)[:n]
    return out.reshape(-1)


def resample(wav_data, rate: int):
    """Whole-buffer integer-rate resample (reference: src/resample.cc:52-95)."""
    assert rate != wav_data.sample_rate
    ratio = rate / wav_data.sample_rate
    out = resample_buffer(wav_data.samples, wav_data.n_channels, ratio)
    from ..io.wavdata import WavData
    return WavData(out, wav_data.n_channels, rate, wav_data.bit_depth)


def resample_ratio_truncate(wav_data, ratio: float, new_rate: int,
                            max_in_seconds: float = -1):
    """Arbitrary-ratio resample with optional input truncation
    (reference: src/resample.cc:97-120)."""
    samples = wav_data.samples
    if max_in_seconds > 0:
        limit = wav_data.n_channels * int(
            round(wav_data.sample_rate * max_in_seconds))
        samples = samples[:min(samples.size, limit)]
    out = resample_buffer(samples, wav_data.n_channels, ratio)
    from ..io.wavdata import WavData
    return WavData(out, wav_data.n_channels, int(new_rate), wav_data.bit_depth)


def resample_ratio(wav_data, ratio: float, new_rate: int):
    return resample_ratio_truncate(wav_data, ratio, new_rate, -1)


class StreamingResampler:
    """Stateful streaming resampler with the reference's buffered protocol:
    write_frames / can_read_frames / read_frames / write_trailing_frames /
    skip (1-second periodicity fast path)."""

    def __init__(self, n_channels: int, old_rate: int, new_rate: int):
        self.n_channels = n_channels
        self.old_rate = old_rate
        self.new_rate = new_rate
        self.ratio = new_rate / old_rate
        _, _, self.half_taps, self.n_taps = _filter_params(self.ratio)
        # input history: absolute input frame index of history[0]
        self.hist = np.zeros((0, n_channels), dtype=np.float32)
        self.hist_start = 0          # absolute index of hist[0]
        self.in_total = 0            # absolute input frames written
        self.next_out = 0            # next output frame index to produce
        self.out_buffer = np.zeros(0, dtype=np.float32)

    def inpsize(self) -> int:
        return self.n_taps

    def write_frames(self, frames: np.ndarray):
        x = np.asarray(frames, dtype=np.float32).reshape(-1, self.n_channels)
        self.hist = np.concatenate([self.hist, x], axis=0)
        self.in_total += x.shape[0]
        self._produce()

    def write_trailing_frames(self):
        self.write_frames(
            np.zeros((self.n_taps // 2) * self.n_channels, dtype=np.float32))

    def _produce(self):
        # output j needs input taps up to floor(j/ratio) + half_taps; it is
        # computable once that index is <= in_total - 1, i.e.
        # j * old_rate < (in_total - half_taps) * new_rate (exact integers)
        avail = (self.in_total - self.half_taps) * self.new_rate
        max_out = (avail - 1) // self.old_rate + 1 if avail > 0 else 0
        n_new = max_out - self.next_out
        if n_new <= 0:
            return
        j = self.next_out + np.arange(n_new, dtype=np.float64)
        p = j / self.ratio
        ip = np.floor(p)
        frac = p - ip
        base = ip.astype(np.int64) - (self.half_taps - 1) - self.hist_start
        coeff = _coeffs(frac, self.ratio)
        # pad history so negative bases (start of stream) read zeros
        pad_lo = max(0, -int(base.min()))
        pad_hi = max(0, int(base.max()) + self.n_taps - self.hist.shape[0])
        xp = np.pad(self.hist, ((pad_lo, pad_hi), (0, 0)))
        g = xp[(base + pad_lo)[:, None] + np.arange(self.n_taps)[None, :]]
        y = np.einsum("jmc,jm->jc", g, coeff).astype(np.float32)
        self.out_buffer = np.concatenate([self.out_buffer, y.reshape(-1)])
        self.next_out = max_out
        # drop history no longer needed
        min_base = int(np.floor(self.next_out / self.ratio)) - (self.half_taps - 1)
        drop = min(max(0, min_base - self.hist_start), self.hist.shape[0])
        if drop > 0:
            self.hist = self.hist[drop:]
            self.hist_start += drop

    def can_read_frames(self) -> int:
        return self.out_buffer.size // self.n_channels

    def read_frames(self, frames: int) -> np.ndarray:
        n = frames * self.n_channels
        assert n <= self.out_buffer.size
        out = self.out_buffer[:n]
        self.out_buffer = self.out_buffer[n:]
        return out

    def skip(self, zeros: int) -> int:
        """Skip a zero lead-in using 1-second periodicity
        (reference: src/resample.cc:150-167)."""
        seconds = 0
        if zeros >= Params.frame_size:
            seconds = (zeros - Params.frame_size) // self.old_rate
        extra = self.new_rate * seconds
        zeros -= self.old_rate * seconds
        # fast-forward absolute counters by whole seconds (state periodicity)
        self.in_total += self.old_rate * seconds
        self.hist_start += self.old_rate * seconds
        self.next_out += self.new_rate * seconds
        self.write_frames(np.zeros(zeros * self.n_channels, dtype=np.float32))
        out = self.can_read_frames() + extra
        out -= out % Params.frame_size
        consume = out - extra
        if consume >= 0:
            self.read_frames(consume)
        else:
            # frame rounding dipped into the virtually-skipped whole seconds;
            # those output frames sit deep inside the zero lead-in (>=1 s of
            # zero history, far beyond the filter taps), so they are exactly
            # zero — materialize them instead of consuming a negative count
            # (the reference's size_t arithmetic would crash here,
            # src/resample.cc:163-165)
            self.out_buffer = np.concatenate(
                [np.zeros(-consume * self.n_channels, dtype=np.float32),
                 self.out_buffer])
        return out
