"""Frame-level DSP kernels: windowed STFT analysis, magnitude-exponent delta
synthesis with overlap-add, and dB spectrograms.

Reference behavior:
* analysis window — sum-normalized (x2) Hann (src/wmcommon.cc:68-89)
* delta spectrum — delta = fft * (|fft|^(-wd*sign) - 1) on marked bins with a
  1e-7 magnitude guard (src/wmadd.cc:61-84)
* synthesis — ifft + overlap-add over 3 frames with a cosine-flattened
  triangular window, 10% overlap (src/wmadd.cc:169-250)
* dB spectrogram — log2(re^2+im^2) * 10/log2(10), min -96 dB, summed over
  channels (src/wmcommon.hh:204-218, src/syncfinder.cc:561-605)

TPU design: every op is a batched jit over a whole frame axis; the embedder's
per-frame streaming loop in the reference becomes ONE fused
window->rfft->delta->irfft->OLA computation over thousands of frames.  FFTW's
unnormalized r2c/c2r convention is matched via jnp.fft.rfft and
irfft * frame_size.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..params import Params

FRAME = Params.frame_size
N_BINS = FRAME // 2 + 1
MIN_DB = -96.0
_LOG2_DB = 3.01029995663981  # 10 / log2(10)


@lru_cache(maxsize=None)
def analysis_window() -> np.ndarray:
    """Sum-normalized Hann analysis window, float32 (n = frame_size)."""
    n = FRAME
    i = np.arange(n, dtype=np.float64)
    x = (i - n / 2.0) / (n / 2.0)
    win = np.where(np.abs(x) > 1, 0.0, 0.5 * np.cos(x * np.pi) + 0.5)
    win *= 2.0 / win.sum()
    return win.astype(np.float32)


@lru_cache(maxsize=None)
def synthesis_window() -> np.ndarray:
    """Cosine-flattened triangular synthesis window over 3 frames, float32."""
    n = 3 * FRAME
    i = np.arange(n, dtype=np.float64)
    overlap = 0.1
    norm_pos = (i - FRAME) / FRAME
    norm_pos = np.where(norm_pos > 0.5, 1.0 - norm_pos, norm_pos)
    tri = np.where(norm_pos < -overlap, 0.0,
                   np.where(norm_pos < overlap,
                            0.5 + norm_pos / (2 * overlap), 1.0))
    win = (np.cos(tri * np.pi + np.pi) + 1.0) * 0.5
    return win.astype(np.float32)


@jax.jit
def _embed_delta_core(frames: jnp.ndarray, mods: jnp.ndarray,
                      water_delta: jnp.ndarray, awin: jnp.ndarray,
                      swin: jnp.ndarray, prev1: jnp.ndarray,
                      prev2: jnp.ndarray):
    """Streaming delta OLA for a tile of frames k0..k0+T-1.

    frames: (T, C, FRAME) float32 — deinterleaved input frames
    mods:   (T, N_BINS) int8 — +1 up / -1 down / 0 keep, per frame
    prev1/prev2: (C, FRAME) — ifft of frames k0-1 and k0-2 (carry state)

    Emits OLA output frames j = k0-1 .. k0+T-2 (one per input frame, the
    reference synth's one-frame latency):
        out[j] = W0*D[j+1] + W1*D[j] + W2*D[j-1]
    Returns (out (T, C, FRAME), new prev1, new prev2).
    """
    win = awin[None, None, :]
    spec = jnp.fft.rfft(frames * win, axis=-1)            # (T, C, N_BINS)
    mag = jnp.abs(spec)
    sign = mods.astype(jnp.float32)[:, None, :]           # (T, 1, N_BINS)
    # mag^(-wd*sign) - 1 on marked bins with small-magnitude guard
    safe_mag = jnp.maximum(mag, 1e-7)
    factor = jnp.exp(jnp.log(safe_mag) * (-water_delta) * sign) - 1.0
    factor = jnp.where((mag > 1e-7) & (sign != 0), factor, 0.0)
    delta_spec = spec * factor
    iffts = jnp.fft.irfft(delta_spec, n=FRAME, axis=-1) * FRAME  # FFTW c2r

    w0 = swin[:FRAME][None, None, :]
    w1 = swin[FRAME:2 * FRAME][None, None, :]
    w2 = swin[2 * FRAME:][None, None, :]
    ext = jnp.concatenate([prev2[None], prev1[None], iffts], axis=0)
    out = ext[2:] * w0 + ext[1:-1] * w1 + ext[:-2] * w2
    return out, iffts[-1], ext[-2]


def embed_delta_frames(frames: np.ndarray, mods: np.ndarray,
                       water_delta: float, prev1=None, prev2=None):
    """Host wrapper for one streaming tile; see _embed_delta_core."""
    T, C, _ = frames.shape
    if prev1 is None:
        prev1 = jnp.zeros((C, FRAME), jnp.float32)
    if prev2 is None:
        prev2 = jnp.zeros((C, FRAME), jnp.float32)
    return _embed_delta_core(
        jnp.asarray(frames), jnp.asarray(mods),
        jnp.float32(water_delta), jnp.asarray(analysis_window()),
        jnp.asarray(synthesis_window()), prev1, prev2)


@partial(jax.jit, static_argnames=("n_frames", "n_channels", "n_out",
                                   "no_limiter", "in_i16", "out_i16",
                                   "block_size"))
def _add_file_core(x: jnp.ndarray, mods: jnp.ndarray,
                   water_delta: jnp.ndarray, awin: jnp.ndarray,
                   swin: jnp.ndarray, ceiling: jnp.ndarray,
                   n_frames: int, n_channels: int, n_out: int,
                   no_limiter: bool, in_i16: bool, out_i16: bool,
                   block_size: int):
    """Whole-file add in ONE dispatch: dequantize -> embed delta -> mix ->
    limiter -> quantize.  Built for bandwidth-starved host links (the
    remote-TPU tunnel moves ~30/14 MB/s): int16 in/out halves the bytes and
    the single fused dispatch removes the per-tile delta round trips.

    x: (n_frames*FRAME*n_channels,) int16 or float32, interleaved, input
       zero-padded to whole frames.
    mods: (n_frames, N_BINS) int8.
    Returns (n_out,) int16 (exact trunc-clip quantization of
    io/wavfile.encode_samples for 16-bit output) or float32.
    """
    if in_i16:
        xf = x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    else:
        xf = x
    frames = jnp.swapaxes(
        xf.reshape(n_frames, FRAME, n_channels), 1, 2)

    win = awin[None, None, :]
    spec = jnp.fft.rfft(frames * win, axis=-1)
    mag = jnp.abs(spec)
    sign = mods.astype(jnp.float32)[:, None, :]
    safe_mag = jnp.maximum(mag, 1e-7)
    factor = jnp.exp(jnp.log(safe_mag) * (-water_delta) * sign) - 1.0
    factor = jnp.where((mag > 1e-7) & (sign != 0), factor, 0.0)
    iffts = jnp.fft.irfft(spec * factor, n=FRAME, axis=-1) * FRAME

    # streamed alignment: delta frame j = D[j+1]*w0 + D[j]*w1 + D[j-1]*w2
    # (one-frame synth latency, first emitted frame dropped)
    w0 = swin[:FRAME][None, None, :]
    w1 = swin[FRAME:2 * FRAME][None, None, :]
    w2 = swin[2 * FRAME:][None, None, :]
    zero = jnp.zeros((1, n_channels, FRAME), jnp.float32)
    nxt = jnp.concatenate([iffts[1:], zero], axis=0)
    prv = jnp.concatenate([zero, iffts[:-1]], axis=0)
    delta = nxt * w0 + iffts * w1 + prv * w2

    mixed = xf + jnp.swapaxes(delta, 1, 2).reshape(-1)

    if not no_limiter:
        vpb = block_size * n_channels
        n_blocks = -(-mixed.shape[0] // vpb)
        pad = n_blocks * vpb - mixed.shape[0]
        mb = jnp.concatenate([mixed, jnp.zeros(pad, jnp.float32)])
        xb = mb.reshape(n_blocks, vpb)
        maxes = jnp.maximum(jnp.max(jnp.abs(xb), axis=1), ceiling)
        prev = jnp.concatenate([ceiling[None], maxes[:-1]])
        nxt_m = jnp.concatenate([maxes[1:], ceiling[None]])
        s0 = ceiling / jnp.maximum(prev, maxes)
        s1 = ceiling / jnp.maximum(maxes, nxt_m)
        step = (s1 - s0) / block_size
        i = jnp.arange(block_size, dtype=jnp.float32)
        scale = s0[:, None] + i[None, :] * step[:, None]
        out = (xb.reshape(n_blocks, block_size, n_channels)
               * scale[:, :, None]).reshape(-1)
        mixed = out[:mixed.shape[0]]

    mixed = mixed[:n_out]
    if out_i16:
        # exact trunc-clip of io/converters.float_to_int_clip32 then >>16
        snorm = mixed * jnp.float32(2147483648.0)
        hi = jnp.float32(2147483647.0)       # == 2^31 in float32
        lo = jnp.float32(-2147483648.0)
        t = jnp.trunc(snorm)
        i32 = jnp.where(snorm >= hi, jnp.int32(2147483647),
                        jnp.where(snorm <= lo, jnp.int32(-2147483648),
                                  t.astype(jnp.int32)))
        return (i32 >> 16).astype(jnp.int16)
    return mixed


@jax.jit
def _db_spectrogram_core(frames: jnp.ndarray, awin: jnp.ndarray):
    """frames (T, C, FRAME) -> dB spectrogram (T, n_bands) summed over chans."""
    spec = jnp.fft.rfft(frames * awin[None, None, :], axis=-1)
    spec = spec[:, :, Params.min_band:Params.max_band + 1]
    abs2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(_LOG2_DB),
                   jnp.float32(MIN_DB))
    return jnp.sum(db, axis=1)


def db_spectrogram(frames: np.ndarray) -> jnp.ndarray:
    """Batched dB spectrogram over bands [min_band, max_band]."""
    return _db_spectrogram_core(jnp.asarray(frames),
                                jnp.asarray(analysis_window()))


@jax.jit
def _fft_frames_core(frames: jnp.ndarray, awin: jnp.ndarray):
    return jnp.fft.rfft(frames * awin[None, None, :], axis=-1)


def fft_frames(frames: np.ndarray) -> jnp.ndarray:
    """Windowed rfft of (T, C, FRAME) frames -> (T, C, N_BINS) complex64."""
    return _fft_frames_core(jnp.asarray(frames), jnp.asarray(analysis_window()))


def deinterleave_frames(samples: np.ndarray, n_channels: int,
                        start_sample: int, n_frames: int,
                        frame_stride: int = FRAME) -> np.ndarray:
    """Slice interleaved samples into (n_frames, C, FRAME) at the given start.

    start_sample is in frames' sample units (not interleaved index).
    """
    x = samples.reshape(-1, n_channels)
    idx = start_sample + np.arange(n_frames)[:, None] * frame_stride \
        + np.arange(FRAME)[None, :]
    return np.ascontiguousarray(
        x[idx].transpose(0, 2, 1))  # (T, C, FRAME)
