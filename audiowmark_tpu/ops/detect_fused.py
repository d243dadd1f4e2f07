"""Fully-fused single-dispatch watermark detector.

One jittable function runs the complete block-detect chain the host-
orchestrated production path performs (reference hot loops:
src/syncfinder.cc:172-458, src/wmget.cc:503-553):

  hop-256 dB spectrogram (slice windows)  ->  band-sum matmul D = V @ S^T
  ->  static-slice score sweep over every start  ->  local-mean subtraction
  ->  top-k candidates  ->  +-256/step-8 grid refine (span slices + windowed
  DFT matmul on the MXU)  ->  per-candidate 2226-frame block FFT +
  mix_decode soft bits with background subtraction + keyed de-interleave
  ->  batched 2^15-state Viterbi (A and B generator sets, selected by the
  candidate's sync sign).

This is the device path for fleet-scale batch detection: `jax.vmap` it over
a stream axis and `shard_map` that over a dp mesh (parallel/batch.py), or
call it per-chunk for single-stream throughput.  The host CLI path keeps its
own orchestration for bit-exact reference selection semantics; this kernel
applies the CLI's candidate eligibility (local maxima + opposite-sign
masking) in-device but keeps fixed top-k slots instead of the host's
threshold/n-best truncation (ineligible filler slots are flagged).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..codec.convcode import (ORDER, ConvBlockType, _state_output_table,
                              _viterbi_core_batch)
from ..crypto.keys import Key
from ..params import Params
from ..tables import get_key_tables
from . import sync as sync_ops
from .frames import FRAME, MIN_DB, _LOG2_DB
from .sync import _SPAN, _SUB, _dft_matrix

N_REFINE = sync_ops.N_REFINE


@dataclass
class DetectorConfig:
    n_frames: int            # T — whole frames in each stream
    n_channels: int = 2
    top_k: int = 8
    # candidates refined/decoded together (vmapped): each one holds a
    # (510*C, 65, 162) refine tensor + a 2226-frame block in flight
    # (~60 MB at C=2), so 4 trades ~250 MB HBM for a 4x shorter serial
    # chain; lower it when vmapping the detector over many streams
    candidate_batch: int = 4
    # bf16 operands for the band-restricted DFT matmuls (the MXU runs the
    # K=1024 shape ~5.5x faster; dB error ~0.03 dB vs multi-dB margins).
    # None = bf16 on TPU, f32 elsewhere (CPU must match the CLI decode
    # path's numerics); tests pass True to validate bf16 end-to-end on CPU
    dft_bf16: "bool | None" = None
    # apply the CLI's candidate eligibility (local maxima + opposite-sign
    # false-positive masking, src/syncfinder.cc:258-332) before top-k, so
    # the fleet API surfaces the same candidate set the CLI would; slots
    # beyond the eligible count are flagged by the `eligible` output
    cli_masking: bool = True
    # diagnostic only: truncate the pipeline after a stage and return a
    # {"probe": scalar} reduction instead of the full result — lets
    # tools/mfu_attrib.py time/flop-count each stage incrementally.
    # "spectrogram" | "sweep" | "refine" | "candidates" | "full"
    stage: str = "full"


def build_detector(key: Key, cfg: DetectorConfig) -> Callable:
    """Build f(samples (T*FRAME, C) float32) -> dict with
    positions (K,), qualities (K,), block_is_a (K,), bits (K, n_payload),
    errors (K,).  Everything runs in ONE device dispatch under jit."""
    tables = get_key_tables(key)
    sync_bits = sync_ops.build_sync_bits(tables, clip_mode=False)

    T = cfg.n_frames
    C = cfg.n_channels
    K = cfg.top_k
    n_bands = sync_ops.N_BANDS
    frames_per_block = tables.frames_per_block
    n_samples = T * FRAME

    V = jnp.asarray(sync_bits.v)
    offsets_np = (sync_ops.SHIFTS
                  * sync_bits.frame.reshape(-1)).astype(np.int32)
    n_pos = sync_bits.n_pos
    total_frames = sync_bits.total_frames
    norm = jnp.float32(sync_ops.normalize_factor())
    dftm = jnp.asarray(_dft_matrix())
    sync_frames = jnp.asarray(sync_bits.frame.reshape(-1).astype(np.int32))
    J = int(sync_frames.shape[0])

    mix_frame = jnp.asarray(tables.mix_frame.astype(np.int32))
    mix_up = jnp.asarray((tables.mix_up - Params.min_band).astype(np.int32))
    mix_dn = jnp.asarray((tables.mix_dn - Params.min_band).astype(np.int32))
    group = Params.bands_per_frame * Params.frames_per_bit
    inv_order = jnp.asarray(np.argsort(tables.bit_order).astype(np.int32))
    s_table_a = jnp.asarray(_state_output_table(ConvBlockType.a))
    s_table_b = jnp.asarray(_state_output_table(ConvBlockType.b))
    rate_half = s_table_a.shape[1]

    use_bf16 = (cfg.dft_bf16 if cfg.dft_bf16 is not None
                else jax.default_backend() == "tpu")
    dftmode = 2 if use_bf16 else 1
    n_starts = sync_ops.SHIFTS * (T - 1 - total_frames)
    if n_starts <= 0:
        raise ValueError("stream too short for one block (%d frames, "
                         "need > %d)" % (T, total_frames))
    max_pos = n_samples - frames_per_block * FRAME

    def bit_quality(u, d):
        expect = (jnp.arange(Params.sync_bits) & 1).astype(jnp.float32)
        raw = jnp.where((u == 0) | (d == 0), 0.0,
                        jnp.where(u < d, 1.0 - u / d, d / u - 1.0))
        q = jnp.where(expect > 0, raw, -raw)
        return jnp.mean(q, axis=-1) * norm

    def detect(samples):
        x = samples.reshape(n_samples, C)

        # ---- hop-256 dB spectrogram from 4 static hop-chunk slices ----
        n_taus = sync_ops.SHIFTS * (T - 1)
        xc = x[: (n_samples // sync_ops.HOP) * sync_ops.HOP]
        xc = xc.reshape(-1, sync_ops.HOP, C)
        windows = jnp.concatenate(
            [xc[k:k + n_taus] for k in range(sync_ops.SHIFTS)], axis=1)
        # band-restricted DFT matmul (window folded into dftm): one MXU op
        # per tile instead of a 513-bin rfft, fused with the band-sum below
        flat = jnp.swapaxes(windows, 1, 2).reshape(n_taus * C, FRAME)
        spec = sync_ops.band_dot(flat, dftm, dftmode)
        abs2 = spec[:, :n_bands] ** 2 + spec[:, n_bands:] ** 2
        db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(_LOG2_DB),
                       jnp.float32(MIN_DB))
        S = jnp.sum(db.reshape(n_taus, C, n_bands), axis=1)  # (taus, bands)
        if cfg.stage == "spectrogram":
            return {"probe": jnp.sum(S)}

        # ---- score sweep: static slices of the band-sum matrix ----
        Dt = jnp.dot(V, S.T, preferred_element_type=jnp.float32)
        us, ds = [], []
        for b in range(Params.sync_bits):
            au = 0.0
            ad = 0.0
            for k in range(n_pos):
                j = b * n_pos + k
                o = int(offsets_np[j])
                au = au + jax.lax.slice_in_dim(Dt[2 * j], o, o + n_starts)
                ad = ad + jax.lax.slice_in_dim(Dt[2 * j + 1], o, o + n_starts)
            us.append(au)
            ds.append(ad)
        q = bit_quality(jnp.stack(us, 1), jnp.stack(ds, 1))

        # ---- local mean (+-20 excluding +-3) and top-k selection ----
        dist, excl = 20, 4
        qpad = jnp.concatenate([jnp.zeros(dist), q, jnp.zeros(dist)])
        cpad = jnp.concatenate([jnp.zeros(dist), jnp.ones(n_starts),
                                jnp.zeros(dist)])
        tot = 0.0
        cnt = 0.0
        for j in list(range(-dist, -excl + 1)) + list(range(excl, dist + 1)):
            tot = tot + jax.lax.slice_in_dim(qpad, dist + j,
                                             dist + j + n_starts)
            cnt = cnt + jax.lax.slice_in_dim(cpad, dist + j,
                                             dist + j + n_starts)
        mean = tot / jnp.maximum(cnt, 1.0)
        if cfg.cli_masking:
            from .search_fused import candidate_eligibility
            elig, abs_q, _ = candidate_eligibility(
                q, mean, jnp.ones(n_starts, bool))
            score = jnp.where(elig, abs_q, -1.0)
        else:
            score = abs_q = jnp.abs(q - mean)
        top_vals, top = jax.lax.top_k(score, K)
        eligible = top_vals >= 0
        if cfg.stage == "sweep":
            return {"probe": jnp.sum(q) + jnp.sum(mean) + jnp.sum(top)}

        lpad = jnp.concatenate(
            [x.T, jnp.zeros((C, _SPAN), jnp.float32)], axis=1)

        def per_candidate(t):
            base = t * sync_ops.HOP
            cmean = mean[t]
            # grid refine (src/syncfinder.cc:427-442)
            start = jnp.maximum(base - Params.sync_search_step, 0)
            pos = start + Params.sync_search_fine * jnp.arange(N_REFINE)
            valid = ((pos <= base + Params.sync_search_step)
                     & (pos <= max_pos)).astype(jnp.float32)
            span_starts = start + sync_frames * FRAME
            spans = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(lpad, s, _SPAN,
                                                       axis=1)
            )(span_starts)                                 # (J, C, _SPAN)
            flat = spans.reshape(J * C, _SPAN)
            # ONE stacked matmul for all 65 fine windows (was 65 separate
            # band_dot calls serializing small MXU ops)
            W = jnp.stack(
                [jax.lax.slice_in_dim(flat, _SUB * k, _SUB * k + FRAME,
                                      axis=1) for k in range(N_REFINE)],
                axis=1)                                    # (J*C, 65, FRAME)
            fs = sync_ops.band_dot(
                W.reshape(J * C * N_REFINE, FRAME), dftm, dftmode
            ).reshape(J * C, N_REFINE, 2 * n_bands)        # (J*C, 65, 2NB)
            fa2 = fs[..., :n_bands] ** 2 + fs[..., n_bands:] ** 2
            fdb = jnp.where(fa2 > 0, jnp.log2(fa2) * jnp.float32(_LOG2_DB),
                            jnp.float32(MIN_DB))
            fdb = jnp.sum(fdb.reshape(J, C, N_REFINE, n_bands), axis=1)
            u = jnp.einsum("jpb,jb->pj", fdb, V[0::2]) * valid[:, None]
            d = jnp.einsum("jpb,jb->pj", fdb, V[1::2]) * valid[:, None]
            fine_q = bit_quality(
                jnp.sum(u.reshape(N_REFINE, Params.sync_bits, n_pos), axis=2),
                jnp.sum(d.reshape(N_REFINE, Params.sync_bits, n_pos), axis=2))
            best = jnp.argmax(jnp.abs(fine_q - cmean) * valid)
            best_pos = pos[best]
            best_q = fine_q[best]
            if cfg.stage == "refine":      # diagnostic: skip block decode
                return (jnp.zeros(inv_order.shape[0], jnp.float32),
                        best_q, best_pos)

            # block decode at the refined start (src/wmget.cc:503-553)
            w = jax.lax.dynamic_slice_in_dim(
                x, best_pos, frames_per_block * FRAME)
            wf = jnp.swapaxes(w.reshape(frames_per_block, FRAME, C), 1, 2)
            bspec = sync_ops.band_dot(
                wf.reshape(frames_per_block * C, FRAME), dftm, dftmode)
            ba2 = bspec[:, :n_bands] ** 2 + bspec[:, n_bands:] ** 2
            ba2 = ba2.reshape(frames_per_block, C, n_bands)
            bdb = jnp.where(ba2 > 0, jnp.log2(ba2) * jnp.float32(_LOG2_DB),
                            jnp.float32(MIN_DB))
            nf = frames_per_block
            prv_i = jnp.concatenate([jnp.array([1]), jnp.arange(nf - 1)])
            nxt_i = jnp.concatenate([jnp.arange(1, nf), jnp.array([nf - 2])])
            A = jnp.sum(bdb - 0.5 * (bdb[prv_i] + bdb[nxt_i]), axis=1)
            um = A[mix_frame, mix_up]
            dm = A[mix_frame, mix_dn]
            raw = jnp.sum((um - dm).reshape(-1, group), axis=1)[inv_order]
            soft = 0.5 * (raw / jnp.mean(jnp.abs(raw)) + 1.0)
            return soft, best_q, best_pos

        bs = max(1, min(cfg.candidate_batch, K))
        softs, fine_qs, positions = jax.lax.map(per_candidate, top,
                                                batch_size=bs)
        if cfg.stage in ("refine", "candidates"):
            return {"probe": (jnp.sum(softs) + jnp.sum(fine_qs)
                              + jnp.sum(positions))}

        # block type from the sync sign (A positive, B negative,
        # src/syncfinder.cc:544-553); Viterbi with the matching generators.
        # All 2K decodes (K candidates x A/B tables) share ONE batched
        # trellis launch — 2K sequential kernels of `steps` grid iterations
        # collapse to one grid of `steps`.
        is_a = fine_qs - mean[top] > 0
        tables_ab = jnp.concatenate([
            jnp.broadcast_to(s_table_a[None], (K,) + s_table_a.shape),
            jnp.broadcast_to(s_table_b[None], (K,) + s_table_b.shape)])
        bits_ab, errs_ab = _viterbi_core_batch(
            jnp.concatenate([softs, softs]), tables_ab, rate_half)
        bits_a, bits_b = bits_ab[:K], bits_ab[K:]
        errs_a, errs_b = errs_ab[:K], errs_ab[K:]
        bits = jnp.where(is_a[:, None], bits_a, bits_b)
        bits = bits[:, : bits.shape[1] - ORDER]   # drop the zero-term tail
        errors = jnp.where(is_a, errs_a, errs_b)

        return {
            "positions": positions,
            "qualities": jnp.abs(fine_qs - mean[top]),
            "block_is_a": is_a,
            "bits": bits,
            "errors": errors,
            "eligible": eligible,
        }

    return detect
