"""Fused sync search: the complete approx -> select -> refine chain in ONE
device dispatch, with the CLI's exact selection semantics.

Reference behavior (src/syncfinder.cc:172-458): dB spectrogram at 4 shifts,
score every start, subtract a +-20 local mean, pick local maxima (a selected
peak skips its right neighbor), drop candidates with an opposite-sign
neighbor 3x larger within 23 steps, keep quality > 0.75*threshold (at least
n_best), refine +-256 in steps of 8 keeping the best |q - mean|.

The staged host path (models/syncfinder.search_staged + ops/sync.py) runs
this as ~5 synchronized device round trips; through a remote-TPU tunnel each
costs ~32 ms RPC plus transfer.  This kernel runs the whole chain in one
dispatch and returns only (K,)-shaped candidate tensors.

Shape discipline: the frame capacity T is BUCKETED (multiples of
_BUCKET_FRAMES) so arbitrary file lengths share compilations; the true
signal extent enters as *dynamic* scalars (n_starts, sample frames, silence
bounds) and every stage masks against them, reproducing the exact
edge-aware semantics of the true-length host arrays (local-mean counts,
boundary local-maxima comparisons, refine validity).

The refine stage stacks all 65 fine-grid windows into ONE band-restricted
DFT matmul per candidate batch (the round-2 review's 65 separate band_dot
calls collapse to a single MXU op).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..params import Params
from ..tables import KeyTables
from ..utils.devcache import memo_derived
from .frames import FRAME, MIN_DB, _LOG2_DB
from .sync import (HOP, N_BANDS, N_REFINE, SHIFTS, _SPAN, _SUB, SyncBits,
                   _dft_matrix, band_dot, build_sync_bits, dft_mode,
                   normalize_factor)

# opposite-sign false-positive masking (src/syncfinder.cc:283-332)
MASK_DISTANCE = 23          # local_mean_distance + 3
MASK_FACTOR = 3.0
# local mean over +-20 excluding +-3 (src/syncfinder.cc:221-255)
LM_DIST, LM_EXCL = 20, 4

_BUCKET_FRAMES = 256        # ~5.9 s granularity of compiled shapes

# single-dispatch program size cap: a 30-min chunk (~77.5k frames) makes
# the fused kernel's HLO fail remote TPU compilation outright; longer
# streams run as ceil(T/MAX) overlapping TILES of this size — one fused
# dispatch each, merged selection on host (models/syncfinder.py
# _search_fused_tiled) — so the production 30-minute chunk stays on the
# fused path instead of the staged multi-dispatch fallback
MAX_FUSED_FRAMES = 16384    # ~6.3 min

# tile halo in start-steps: a core start's eligibility needs its local mean
# (+-LM_DIST), its neighbors' local maxima (+-1) and the opposite-sign mask
# neighbors (+-MASK_DISTANCE, each with their own local mean), so scores
# must be exact for LM_DIST + MASK_DISTANCE + 2 = 45 steps beyond the core;
# 48 keeps a margin and SHIFTS-aligns
TILE_HALO = 48


def bucket_frames(n_frames: int) -> int:
    return max(-(-n_frames // _BUCKET_FRAMES) * _BUCKET_FRAMES,
               _BUCKET_FRAMES)


def candidate_eligibility(q, mean, validb):
    """CLI candidate eligibility over a dense start-step score row: local
    maxima with the reference's plateau-alternation semantics
    (src/syncfinder.cc:258-281) minus opposite-sign false positives
    (src/syncfinder.cc:283-332).  All shapes static; shared by the fused
    search kernel and the fleet detector (ops/detect_fused.py)."""
    n = q.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = validb.astype(jnp.float32)
    aq = jnp.abs(q - mean) * valid

    # local maxima: a selected peak skips its right neighbor; on plateaus
    # of equal values that alternation restarts at each run start
    prv = jnp.concatenate([jnp.zeros(1), aq[:-1]])
    nxt = jnp.concatenate([aq[1:], jnp.zeros(1)])
    m = (aq >= prv) & (aq >= nxt) & validb
    run_start = m & jnp.concatenate([jnp.ones(1, bool), ~m[:-1]])
    starts = jax.lax.cummax(jnp.where(run_start, idx, -1))
    lmax = m & ((idx - starts) % 2 == 0)

    # drop candidates with an opposite-sign neighbor 3x larger within
    # MASK_DISTANCE steps (dense shifted comparisons)
    sgn_neg = (q - mean) < 0
    MD = MASK_DISTANCE
    aq_p = jnp.concatenate([jnp.zeros(MD), aq, jnp.zeros(MD)])
    lm_p = jnp.concatenate([jnp.zeros(MD, bool), lmax,
                            jnp.zeros(MD, bool)])
    sg_p = jnp.concatenate([jnp.zeros(MD, bool), sgn_neg,
                            jnp.zeros(MD, bool)])
    masked = jnp.zeros(n, bool)
    for dd in range(1, MD + 1):
        for off in (dd, -dd):
            nb_l = jax.lax.slice_in_dim(lm_p, MD + off, MD + off + n)
            nb_a = jax.lax.slice_in_dim(aq_p, MD + off, MD + off + n)
            nb_s = jax.lax.slice_in_dim(sg_p, MD + off, MD + off + n)
            masked = masked | (nb_l & (nb_s != sgn_neg)
                               & (nb_a > aq * MASK_FACTOR))
    return lmax & ~masked, aq, idx


def top_k_for(T: int, frames_per_block: int) -> int:
    """Candidate slots: enough for every plausible block peak in a T-frame
    chunk (~T/frames_per_block blocks) plus sideband peaks, never below 16.
    The host falls back to the staged path if the slots saturate."""
    k = max(16, 2 * (T // frames_per_block) + 8)
    return -(-k // 8) * 8


def _memo_key(tag, clip_mode, T, C, K, dft_bf16, extra=()):
    return (tag, clip_mode, T, C, K, dft_bf16,
            Params.sync_bits, Params.sync_frames_per_bit, Params.min_band,
            Params.max_band, Params.water_delta,
            Params.frames_per_bit, bool(Params.mix),
            Params.bands_per_frame, Params.get_n_best) + tuple(extra)


def build_searcher(tables: KeyTables, clip_mode: bool, T: int, C: int,
                   K: int, dft_bf16: Optional[bool] = None,
                   extract: bool = True):
    """Jitted f(x (T*FRAME*C,) f32 interleaved FLAT, n_starts i32,
    n_sample_frames i32, sil_first i32, sil_last i32, core_lo i32,
    core_hi i32) -> dict of (K,) tensors: t (approx tau), q, mean,
    refined_pos, refined_q, eligible, plus raws — the per-candidate raw
    soft bits extracted at the refined starts ((K, n_coded) in BLOCK mode,
    (K, 2, n_coded) consecutive-block pairs in CLIP mode) so the decode
    path skips its own extraction round trip.

    [core_lo, core_hi) restricts ELIGIBILITY (not scoring) to a start-step
    range — the tiled long-stream path computes halo scores outside its
    core for exact local-mean/masking semantics but emits candidates only
    for the core.  Whole-stream callers pass (0, n_starts).

    The audio crosses the jit boundary FLAT: a materialized (n, 2) array
    on TPU pads the minor dim to 128 lanes (64x memory/bandwidth — a
    30-minute chunk would OOM the chip); inside the kernel the reshape
    fuses into the window slicing.

    extract=False omits the raws stage entirely — the tiled long-stream
    path discards raws (selection happens across tiles on host), and the
    per-candidate block extraction is comparable in FLOPs to the whole
    sweep, so computing it for every tile slot nearly doubled the 30-min
    chunk search cost (round-4 record: get.search_block 76 s of a 103 s
    32-min decode).

    Memoized per (key tables, mode, shape) so repeated chunks share the
    compiled executable and the uploaded per-key constants."""
    def build():
        fn = _build_searcher(tables, clip_mode, T, C, K, dft_bf16, extract)
        return None if fn is None else jax.jit(fn)
    return memo_derived(
        tables, _memo_key("fused_search", clip_mode, T, C, K, dft_bf16,
                          (extract,)),
        build)


def build_searcher_group(tables: KeyTables, clip_mode: bool, T: int, C: int,
                         K: int, B: int, n_dev: int,
                         dft_bf16: Optional[bool] = None):
    """Multi-chip variant: the fused search vmapped over a batch of B chunks
    and dp-sharded over n_dev devices (B % n_dev == 0).  The CLI's chunk
    loop over a multi-hour file feeds device-count chunks per dispatch —
    the reference instead fans its ThreadPool out over sync-search rows
    (src/syncfinder.cc:607-657); here the chunk is the natural data-parallel
    grain because chunks are fully independent.

    f(x (B, T*FRAME, C), n_starts (B,), frames (B,), sil_first (B,),
      sil_last (B,), core_lo (B,), core_hi (B,)) -> dict of (B, K) tensors
    (same fields as build_searcher)."""
    def build():
        fn = _build_searcher(tables, clip_mode, T, C, K, dft_bf16)
        if fn is None:
            return None
        batched = jax.vmap(fn)
        if n_dev <= 1:
            return jax.jit(batched)
        from jax.sharding import Mesh, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:        # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("chunks",))
        sharded = shard_map(
            batched, mesh=mesh,
            in_specs=(P("chunks"),) * 7,
            out_specs=P("chunks"), check_vma=False)
        return jax.jit(sharded)
    return memo_derived(
        tables,
        _memo_key("fused_search_group", clip_mode, T, C, K, dft_bf16,
                  (B, n_dev)),
        build)


def _build_searcher(tables: KeyTables, clip_mode: bool, T: int, C: int,
                    K: int, dft_bf16: Optional[bool], extract: bool = True):
    sync_bits: SyncBits = build_sync_bits(tables, clip_mode)
    n_pos = sync_bits.n_pos
    total = sync_bits.total_frames
    frames_flat = sync_bits.frame.reshape(-1).astype(np.int32)   # (J,)
    J = frames_flat.size
    offsets_np = (SHIFTS * frames_flat).astype(np.int32)         # (6*n_pos,)
    n_taus = SHIFTS * (T - 1)
    n_starts_s = SHIFTS * (T - 1 - total)
    if n_starts_s <= 0:
        return None
    n_samples = T * FRAME
    norm = jnp.float32(normalize_factor())
    use_dft = dft_bf16 if dft_bf16 is not None else dft_mode()
    if dft_bf16 is True:
        use_dft = 2
    dftm = jnp.asarray(_dft_matrix())
    from .frames import analysis_window
    awin = jnp.asarray(analysis_window())
    V = jnp.asarray(sync_bits.v)                    # (2*6*n_pos, N_BANDS)
    frames_j = jnp.asarray(frames_flat)
    step = Params.sync_search_step
    fine = Params.sync_search_fine
    expect = jnp.asarray((np.arange(Params.sync_bits) & 1)
                         .astype(np.float32))

    # layout tables for the chained per-candidate raw soft-bit extraction
    # (same derivation as the decoder's standalone batch kernel,
    # models/decoder._block_raw_batch; shared core: ops/extract.py)
    fpb_block = tables.frames_per_block
    use_mix = bool(Params.mix)
    if use_mix:
        lay_frame = jnp.asarray(tables.mix_frame.astype(np.int32))
        lay_up = jnp.asarray((tables.mix_up - Params.min_band)
                             .astype(np.int32))
        lay_dn = jnp.asarray((tables.mix_dn - Params.min_band)
                             .astype(np.int32))
        lay_group = Params.bands_per_frame * Params.frames_per_bit
    else:
        f = np.arange(tables.n_data_frames)
        lay_frame = jnp.asarray(tables.data_frame(f).astype(np.int32))
        lay_up = jnp.asarray((tables.data_up - Params.min_band)
                             .astype(np.int32))
        lay_dn = jnp.asarray((tables.data_dn - Params.min_band)
                             .astype(np.int32))
        lay_group = 0

    def bitq_mean(u, d):
        """Plain per-bit mean (BLOCK sweep, matches the staged slice
        formulation bit for bit)."""
        raw = jnp.where((u == 0) | (d == 0), 0.0,
                        jnp.where(u < d, 1.0 - u / d, d / u - 1.0))
        q = jnp.where(expect > 0, raw, -raw)
        return jnp.mean(q, axis=-1) * norm

    def bitq_cnt(u, d, cnt):
        """Count-weighted form (CLIP sweep / refine, mirrors
        _sync_scores_tile / _refine_grid_scores)."""
        raw = jnp.where((u == 0) | (d == 0), 0.0,
                        jnp.where(u < d, 1.0 - u / d, d / u - 1.0))
        q = jnp.where(expect > 0, raw, -raw)
        tc = jnp.sum(cnt, axis=-1)
        return jnp.where(tc > 0,
                         jnp.sum(q * cnt, axis=-1) / jnp.maximum(tc, 1),
                         0.0) * norm

    def spec_db(flat):
        """(R, FRAME) windows -> (R, N_BANDS) dB; TPU: one band-restricted
        DFT matmul (window folded into dftm) on the MXU; CPU: rfft (the
        staged path's CPU numerics)."""
        if use_dft:
            spec = band_dot(flat, dftm, use_dft)
            a2 = spec[:, :N_BANDS] ** 2 + spec[:, N_BANDS:] ** 2
        else:
            s = jnp.fft.rfft(flat * awin[None, :], axis=-1)
            s = s[:, Params.min_band:Params.max_band + 1]
            a2 = jnp.real(s) ** 2 + jnp.imag(s) ** 2
        return jnp.where(a2 > 0, jnp.log2(a2) * jnp.float32(_LOG2_DB),
                         jnp.float32(MIN_DB))

    def shifted_sum(arr, shifts_list, n):
        """sum_j arr[t + j] for t in [0, n) with zero padding, all-static."""
        lo = -min(shifts_list)
        hi = max(shifts_list)
        pad = jnp.concatenate([jnp.zeros(lo, arr.dtype), arr,
                               jnp.zeros(hi, arr.dtype)])
        acc = jnp.zeros(n, arr.dtype)
        for j in shifts_list:
            acc = acc + jax.lax.slice_in_dim(pad, lo + j, lo + j + n)
        return acc

    lm_shifts = (list(range(-LM_DIST, -LM_EXCL + 1))
                 + list(range(LM_EXCL, LM_DIST + 1)))

    def search(x_flat, n_starts_d, n_sample_frames_d, sil_first, sil_last,
               core_lo, core_hi):
        x = x_flat.reshape(n_samples, C)
        # ---- hop-256 dB spectrogram from static hop-chunk slices ----
        xc = x[: (n_samples // HOP) * HOP].reshape(-1, HOP, C)
        windows = jnp.concatenate(
            [xc[k:k + n_taus] for k in range(SHIFTS)], axis=1)
        flat = jnp.swapaxes(windows, 1, 2).reshape(n_taus * C, FRAME)
        db = spec_db(flat)
        S = jnp.sum(db.reshape(n_taus, C, N_BANDS), axis=1)

        if clip_mode:
            # per-tau availability from the silence bounds
            # (src/syncfinder.cc:583-585), raw interleaved indices
            taus = jnp.arange(n_taus, dtype=jnp.int32)
            f_first = taus * (HOP * C)
            f_last = (taus * HOP + FRAME) * C
            have = (~((f_last < sil_first) | (f_first > sil_last))
                    ).astype(jnp.float32)
        else:
            have = None

        # ---- score sweep: static slices of the band-sum matrix ----
        need = int(offsets_np.max()) + n_starts_s
        S_pad = S if need <= n_taus else jnp.concatenate(
            [S, jnp.zeros((need - n_taus, N_BANDS), jnp.float32)])
        Dt = jnp.dot(V, S_pad.T, preferred_element_type=jnp.float32)
        if have is not None:
            have_pad = have if need <= n_taus else jnp.concatenate(
                [have, jnp.zeros(need - n_taus, jnp.float32)])
            Dt = Dt * have_pad[None, :]

        us, ds, cs = [], [], []
        for b in range(Params.sync_bits):
            au = 0.0
            ad = 0.0
            ac = 0.0
            for k in range(n_pos):
                j = b * n_pos + k
                o = int(offsets_np[j])
                au = au + jax.lax.slice_in_dim(Dt[2 * j], o, o + n_starts_s)
                ad = ad + jax.lax.slice_in_dim(Dt[2 * j + 1], o,
                                               o + n_starts_s)
                if have is not None:
                    ac = ac + jax.lax.slice_in_dim(have_pad, o,
                                                   o + n_starts_s)
            us.append(au)
            ds.append(ad)
            if have is not None:
                cs.append(ac)
        u = jnp.stack(us, axis=1)
        d = jnp.stack(ds, axis=1)
        if have is not None:
            q = bitq_cnt(u, d, jnp.stack(cs, axis=1))
        else:
            q = bitq_mean(u, d)

        idx = jnp.arange(n_starts_s, dtype=jnp.int32)
        validb = idx < n_starts_d
        valid = validb.astype(jnp.float32)
        q = q * valid

        # ---- local mean over the TRUE extent (edge-aware counts) ----
        tot = shifted_sum(q, lm_shifts, n_starts_s)
        cnt = shifted_sum(valid, lm_shifts, n_starts_s)
        mean = jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 0.0) * valid

        # ---- local maxima + opposite-sign masking + core bounds ----
        elig, aq, _ = candidate_eligibility(q, mean, validb)
        elig = elig & (idx >= core_lo) & (idx < core_hi)

        # ---- top-K slots by |q - mean| (ties -> lower index, matching the
        # host's stable sort) ----
        score = jnp.where(elig, aq, -1.0)
        vals, tops = jax.lax.top_k(score, K)
        eligible = vals >= 0

        q_top = q[tops]
        mean_top = mean[tops]

        # ---- refine: +-256 step 8, incumbent = the approx score ----
        xpadT = jnp.concatenate(
            [x.T, jnp.zeros((C, _SPAN), jnp.float32)], axis=1)

        def refine_one(args):
            t, qa, mn = args
            base = t * HOP
            gstart = jnp.maximum(base - step, 0)
            pos = gstart + fine * jnp.arange(N_REFINE, dtype=jnp.int32)
            valid_g = ((pos <= base + step)
                       & (pos + total * FRAME <= n_sample_frames_d))
            span_starts = gstart + frames_j * FRAME
            spans = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(xpadT, s, _SPAN,
                                                       axis=1)
            )(span_starts)                                # (J, C, _SPAN)
            flat = spans.reshape(J * C, _SPAN)
            # ONE stacked matmul for all 65 fine windows
            W = jnp.stack(
                [jax.lax.slice_in_dim(flat, _SUB * k, _SUB * k + FRAME,
                                      axis=1) for k in range(N_REFINE)],
                axis=1)                                   # (J*C, 65, FRAME)
            fdb = spec_db(W.reshape(J * C * N_REFINE, FRAME))
            fdb = jnp.sum(fdb.reshape(J, C, N_REFINE, N_BANDS), axis=1)
            u = jnp.einsum("jpb,jb->pj", fdb, V[0::2])    # (65, J)
            dn = jnp.einsum("jpb,jb->pj", fdb, V[1::2])
            hv = valid_g.astype(jnp.float32)[:, None] * jnp.ones((1, J))
            if clip_mode:
                w_start = pos[:, None] + frames_j[None, :] * FRAME
                f_first = w_start * C
                f_last = (w_start + FRAME) * C
                hv = hv * (~((f_last < sil_first) | (f_first > sil_last))
                           ).astype(jnp.float32)
            u6 = jnp.sum((u * hv).reshape(N_REFINE, Params.sync_bits,
                                          n_pos), axis=2)
            d6 = jnp.sum((dn * hv).reshape(N_REFINE, Params.sync_bits,
                                           n_pos), axis=2)
            c6 = jnp.sum(hv.reshape(N_REFINE, Params.sync_bits, n_pos),
                         axis=2)
            fq = bitq_cnt(u6, d6, c6)
            aqg = jnp.where(valid_g, jnp.abs(fq - mn), -jnp.inf)
            bk = jnp.argmax(aqg)
            improve = aqg[bk] > jnp.abs(qa - mn)
            return (jnp.where(improve, pos[bk], base),
                    jnp.where(improve, fq[bk], qa))

        rpos, rq = jax.lax.map(refine_one, (tops, q_top, mean_top),
                               batch_size=4)

        out = {
            "t": tops,
            "q": q_top,
            "mean": mean_top,
            "refined_pos": rpos,
            "refined_q": rq,
            "eligible": eligible,
        }
        if not extract:
            return out

        # ---- chained raw soft-bit extraction at the refined starts ----
        # The CLI decode would otherwise pay a separate dispatch + fetch
        # round trip per chunk (and two per clip window pair) for the same
        # block spectrograms (src/wmget.cc:503-553).  Out-of-range starts
        # come back clamped/garbage; the host drops them by the exact
        # reference rule (index + frames_per_block*FRAME <= true frames).
        # CLIP candidates decode TWO consecutive blocks (src/wmget.cc clip
        # handling), so each slot ships an (2, n_coded) pair — and CLIP
        # selection keeps at most max(n_best, 5) candidates, so only the
        # leading quality-ordered slots extract (K slots would triple the
        # extraction work for candidates the host is guaranteed to drop).
        from .extract import block_raw_one

        n_extract = min(K, -(-max(Params.get_n_best, 5) // 2) * 2) \
            if clip_mode else K

        def raw_one(p):
            r1 = block_raw_one(x_flat, p, awin, dftm, lay_frame, lay_up,
                               lay_dn, fpb_block, use_dft, use_mix,
                               lay_group, Params.frames_per_bit, C)
            if clip_mode:
                r2 = block_raw_one(x_flat, p + fpb_block * FRAME, awin,
                                   dftm, lay_frame, lay_up, lay_dn,
                                   fpb_block, use_dft, use_mix, lay_group,
                                   Params.frames_per_bit, C)
                return jnp.stack([r1, r2])
            return r1

        out["raws"] = jax.lax.map(raw_one, rpos[:n_extract], batch_size=2)
        return out

    return search
