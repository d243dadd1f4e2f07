"""Benchmark: watermark add+get core compute throughput on one chip.

Measures the realtime factor of the full device compute path — embed
(window/rfft/delta/irfft/OLA), limiter, and detection (hop-256 dB
spectrogram, sync band-sum matmul, score sweep over every start position,
Viterbi decode) — over synthetic 44.1 kHz stereo audio, entirely on device
(data generated on device; only a scalar crosses the host boundary per
iteration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured against the >=1000x-realtime north star
(BASELINE.json).
"""

import json
import os
import time

import numpy as np

import jax

# persist compiled executables across runs (first compile through the
# remote-TPU tunnel is minutes; subsequent runs hit this cache)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from audiowmark_tpu.codec.convcode import (
    ConvBlockType, _state_output_table, _viterbi_core)
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.models.common import build_ab_frame_mods, parse_payload
from audiowmark_tpu.ops.frames import (
    FRAME, N_BINS, analysis_window, synthesis_window)
from audiowmark_tpu.ops import sync as sync_ops
from audiowmark_tpu.params import Params
from audiowmark_tpu.tables import get_key_tables

AUDIO_SECONDS = 120          # per iteration
N_CHANNELS = 2
RATE = 44100


def build_pipeline():
    key = Key()
    tables = get_key_tables(key)
    bitvec = parse_payload("f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0")
    mods_ab = build_ab_frame_mods(tables, bitvec)
    sync_bits = sync_ops.build_sync_bits(tables, clip_mode=False)

    T = AUDIO_SECONDS * RATE // FRAME
    fpb2 = mods_ab.shape[0]
    phases = (2 * tables.frames_per_block - Params.frames_pad_start
              + np.arange(T)) % fpb2
    mods = jnp.asarray(mods_ab[phases])

    awin = jnp.asarray(analysis_window())
    swin = jnp.asarray(synthesis_window())
    V = jnp.asarray(sync_bits.v)
    offsets_np = (sync_ops.SHIFTS * sync_bits.frame.reshape(-1)).astype(np.int32)
    n_pos = sync_bits.n_pos
    total_frames = sync_bits.total_frames
    norm = jnp.float32(sync_ops.normalize_factor())

    s_table = jnp.asarray(_state_output_table(ConvBlockType.a))
    rate_a = 6
    n_coded = 858

    block_size = RATE  # 1 s limiter blocks
    n_samples = T * FRAME

    def step(seed):
        # ---- generate audio on device ----
        rng = jax.random.PRNGKey(seed)
        audio = jax.random.uniform(rng, (T, N_CHANNELS, FRAME),
                                   jnp.float32, -1.0, 1.0)

        # ---- embed: delta OLA ----
        spec = jnp.fft.rfft(audio * awin[None, None, :], axis=-1)
        mag = jnp.abs(spec)
        sign = mods.astype(jnp.float32)[:, None, :]
        safe = jnp.maximum(mag, 1e-7)
        factor = jnp.exp(jnp.log(safe) * (-0.01) * sign) - 1.0
        factor = jnp.where((mag > 1e-7) & (sign != 0), factor, 0.0)
        iffts = jnp.fft.irfft(spec * factor, n=FRAME, axis=-1) * FRAME
        zero = jnp.zeros((1, N_CHANNELS, FRAME), jnp.float32)
        nxt = jnp.concatenate([iffts[1:], zero], axis=0)
        prv = jnp.concatenate([zero, iffts[:-1]], axis=0)
        delta = (nxt * swin[:FRAME] + iffts * swin[FRAME:2 * FRAME]
                 + prv * swin[2 * FRAME:])
        marked = audio + delta

        # ---- limiter ----
        flat = jnp.swapaxes(marked, 1, 2).reshape(-1, N_CHANNELS)
        B = n_samples // block_size
        xb = flat[: B * block_size].reshape(B, -1)
        maxes = jnp.maximum(jnp.max(jnp.abs(xb), axis=1), 0.99)
        prev = jnp.concatenate([jnp.full((1,), 0.99), maxes[:-1]])
        nxt_m = jnp.concatenate([maxes[1:], jnp.full((1,), 0.99)])
        s0 = 0.99 / jnp.maximum(prev, maxes)
        s1 = 0.99 / jnp.maximum(maxes, nxt_m)
        ramp = jnp.arange(block_size, dtype=jnp.float32) / block_size
        scale = s0[:, None] + ramp[None, :] * (s1 - s0)[:, None]
        limited = (xb.reshape(B, block_size, N_CHANNELS)
                   * scale[:, :, None]).reshape(-1, N_CHANNELS)
        limited = jnp.concatenate([limited, flat[B * block_size:]], axis=0)

        # ---- detect: hop-256 spectrogram (windows via slices, not gather) ----
        n_taus = sync_ops.SHIFTS * (T - 1)
        xc = limited[: (limited.shape[0] // sync_ops.HOP) * sync_ops.HOP]
        xc = xc.reshape(-1, sync_ops.HOP, N_CHANNELS)
        windows = jnp.concatenate(
            [xc[k:k + n_taus] for k in range(sync_ops.SHIFTS)], axis=1)
        wspec = jnp.fft.rfft(jnp.swapaxes(windows, 1, 2)
                             * awin[None, None, :], axis=-1)
        wspec = wspec[..., Params.min_band:Params.max_band + 1]
        abs2 = jnp.real(wspec) ** 2 + jnp.imag(wspec) ** 2
        db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(3.01029995663981),
                       jnp.float32(-96.0))
        S = jnp.sum(db, axis=1)                             # (taus, bands)

        # ---- sync score sweep (static slices of the transposed band sums) ----
        Dt = jnp.dot(V, S.T, preferred_element_type=jnp.float32)
        n_starts = max(sync_ops.SHIFTS * (T - 1 - total_frames), 1)
        us, ds = [], []
        for b in range(6):
            au = 0.0
            ad = 0.0
            for k in range(n_pos):
                j = b * n_pos + k
                o = int(offsets_np[j])
                au = au + jax.lax.slice_in_dim(Dt[2 * j], o, o + n_starts)
                ad = ad + jax.lax.slice_in_dim(Dt[2 * j + 1], o, o + n_starts)
            us.append(au)
            ds.append(ad)
        u = jnp.stack(us, 1)
        d = jnp.stack(ds, 1)
        expect = (jnp.arange(6) & 1).astype(jnp.float32)[None, :]
        raw = jnp.where((u == 0) | (d == 0), 0.0,
                        jnp.where(u < d, 1.0 - u / d, d / u - 1.0))
        q = jnp.mean(jnp.where(expect > 0, raw, -raw), axis=1) * norm

        # ---- Viterbi decode of the best candidates (batch of 8) ----
        top = jax.lax.top_k(q, 8)[1]
        key2 = jax.random.fold_in(rng, 1)
        soft = jax.random.uniform(key2, (8, n_coded), jnp.float32)
        bits, errs = jax.vmap(
            lambda c: _viterbi_core(c, s_table, rate_a))(soft)

        return (jnp.sum(limited[0]) + q[top[0]] + jnp.sum(bits[:, 0])
                + jnp.sum(errs))

    return jax.jit(step)


def main():
    step = build_pipeline()

    # compile + warmup (float() forces a real device->host fetch; plain
    # block_until_ready may not synchronize through remote-TPU tunnels)
    t0 = time.monotonic()
    float(step(0))
    compile_s = time.monotonic() - t0
    for w in range(3):
        float(step(w))

    iters = 10
    t0 = time.monotonic()
    acc = 0.0
    for i in range(iters):
        acc += step(i + 1)
    float(acc)
    elapsed = time.monotonic() - t0

    audio_seconds = AUDIO_SECONDS * iters
    realtime_factor = audio_seconds / elapsed
    result = {
        "metric": "add_get_realtime_factor",
        "value": round(realtime_factor, 1),
        "unit": "x_realtime_44k1_stereo",
        "vs_baseline": round(realtime_factor / 1000.0, 3),
    }
    print(json.dumps(result))
    import sys
    print("compile_s=%.1f run_s=%.2f audio_s=%d" % (compile_s, elapsed,
                                                    audio_seconds),
          file=sys.stderr)


if __name__ == "__main__":
    main()
