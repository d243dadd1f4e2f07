"""Single-dispatch speed scan: resample + mag matrix + offset compare for a
whole batch of center speeds in ONE jitted program.

The staged path (ops/speed.py prepare_mag_matrix + compare_speed_batch,
mirroring src/wmspeed.cc:204-382) moves ~70 MB host<->device per center
speed (resample upload/download, window upload, mag-matrix download and
re-upload) and pays one RPC per stage; scan1 alone visits 57 centers, which
made detect_speed ~7 minutes through the remote-TPU tunnel.  Here the clip
is uploaded once per scan and everything else stays on device:

  per center (lax.map):
    1. 16.48 fixed-point output positions p_j = j * (2/center), computed in
       int32 limb arithmetic from host-exact per-tile anchors (TPU has no
       int64/f64; the limbs make base indices exact to ~1e-10 relative, far
       below the 1e-6 speed grid).
    2. windowed-sinc resample at ratio center/2 (unified 96-tap kernel: the
       extra taps past the Blackman window are exactly zero, so one tap
       count serves every center in the scan range) with the reference's
       input truncation (scan_seconds/center) applied as a gather mask.
    3. hop-chunk window slices -> band-restricted windowed DFT (one matmul,
       same trick as ops/sync) -> dB -> up/down band sums (mag matrix D).
    4. the 16.16 fixed-point (state x entry) offset scan of
       src/wmspeed.cc:270-382 for all relative speeds (exact int32 hi/lo
       arithmetic, identical to ops/speed.compare_speed_batch).

Only the (centers, rels) quality grid leaves the device.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..params import Params
from ..utils.devcache import fetch_tree
from .speed import (OFFSET_SHIFT, SUB_FRAME, SUB_HOP, N_BANDS,
                    SpeedSyncBits, _bit_onehot, _sub_dft_matrix)

HALF_TAPS = 48            # covers half_width = 16/ratio for ratio > 1/3
N_TAPS = 2 * HALF_TAPS
T_TILE = 8192             # resample tile (bounds the gather intermediate)
# dense resample band: each _RS_KBLK-output block multiplies a (_RS_KBLK,
# rs_win) on-the-fly coefficient band against ONE contiguous input window.
# Window coverage needs (_RS_KBLK-1)/ratio + N_TAPS + 2 <= rs_win; the
# actual rs_win is computed per scan from the smallest ratio present
# (768 for the CLI scans, whose ratios stay >= ~0.40) and capped at
# _RS_WIN_MAX = 1024, which covers ratio >= 255/926 = 0.275 — strictly
# below MIN_RATIO, so every center the fused path accepts fits the cap.
# Columns past the coverage bound carry exactly-zero coefficients (the
# Blackman window vanishes outside 96 taps), so trimming them is exact.
_RS_KBLK = 256
_RS_WIN_MAX = 1024
# banded offset compare: within a _CB_BLK-state block, entry j's row
# indices idx(s, j) stay inside a (_CB_BLK + _CB_NSEL)-row contiguous band
# of its mag-matrix column (state offsets step by ~1/rel ~= 1 per state),
# so the compare fetches ONE contiguous band per (block, entry) — ~100x
# fewer gather indices than per-element lookups — and selects in-register
# from _CB_NSEL statically shifted views.  The in-band residual bound is
# PROVEN host-side per rel from the exact so_hi table (speed_scan falls
# back to the flat per-element form when |1/rel - 1| is too large).
_CB_BLK = 32
_CB_NSEL = 8
_CB_BAND = _CB_BLK + _CB_NSEL
_ROW_BUCKET = 512
_XPAD_BUCKET = 1 << 16
_LOG2_DB = 3.01029995663981
# Max resampled output samples per device dispatch.  The remote TPU worker
# kills (and restarts!) itself when ONE program runs for minutes — a 57-center
# scan1 in a single dispatch is ~216 s of device time and reliably crashed the
# axon worker, poisoning every later dispatch in the process.  8 scan1
# centers ≈ 27 s/dispatch, comfortably inside the watchdog; centers are
# chunked to stay under this budget (the clip upload is still paid once).
_DISPATCH_SAMPLE_BUDGET = 8 * 69 * T_TILE

# the unified tap count is only valid while the Blackman window vanishes
# inside it: half_width = HLEN/ratio <= HALF_TAPS  <=>  ratio >= 1/3
MIN_RATIO = 16.0 / HALF_TAPS + 1e-9


def _split48(v: int) -> Tuple[int, int, int]:
    """(int_part, frac_hi16, frac_lo16) of a 16.32 fixed-point value."""
    return (int(v) >> 32, (int(v) >> 16) & 0xFFFF, int(v) & 0xFFFF)


def _offset_tables(rels: Sequence[float], sync_bits: SpeedSyncBits):
    """The reference's exact 16.16 state/frame offsets as int32 hi/lo
    (src/wmspeed.cc:270-382; identical to ops/speed.compare_speed_batch)."""
    J = sync_bits.frame.size
    steps_per_frame = Params.frame_size // Params.sync_search_step
    pad_start = sync_bits.frames_per_block * steps_per_frame + steps_per_frame

    frames = sync_bits.frame.astype(np.float64)
    f_off = np.empty((len(rels), 3 * J), dtype=np.int64)
    for i, rel in enumerate(rels):
        inv = 1.0 / rel
        for block in range(3):
            val = ((block * sync_bits.frames_per_block + frames)
                   * steps_per_frame * inv + 0.5) * (1 << OFFSET_SHIFT)
            f_off[i, block * J:(block + 1) * J] = np.trunc(val)

    offs = np.arange(-pad_start, 0, dtype=np.float64)
    s_off = np.stack([
        np.trunc(offs * ((1 << OFFSET_SHIFT) / rel)).astype(np.int64)
        for rel in rels])

    def split(v):
        return ((v >> OFFSET_SHIFT).astype(np.int32),
                (v & 0xFFFF).astype(np.int32))

    return split(s_off) + split(f_off)


def _scan_body(xpad: jnp.ndarray,
               anchor_base: jnp.ndarray, anchor_f1: jnp.ndarray,
               anchor_f0: jnp.ndarray,
               inv_int: jnp.ndarray, inv_f1: jnp.ndarray,
               inv_f0: jnp.ndarray,
               in_limit: jnp.ndarray, rows: jnp.ndarray,
               fr: jnp.ndarray, half_width: jnp.ndarray,
               so_hi: jnp.ndarray, so_lo: jnp.ndarray,
               fo_hi: jnp.ndarray, fo_lo: jnp.ndarray,
               dmin: jnp.ndarray, p0: jnp.ndarray, st: jnp.ndarray,
               cols: jnp.ndarray, swap: jnp.ndarray,
               bit_onehot: jnp.ndarray, dftm: jnp.ndarray,
               v: jnp.ndarray, norm: jnp.ndarray,
               n_tiles: int, rows_bucket: int,
               dense: bool, banded: bool, rs_win: int,
               shift: bool = False, pmax: int = 0, padl: int = 0,
               width: int = 0) -> jnp.ndarray:
    """(K, R) best-over-offsets qualities.

    xpad: (Npad, C) clip with HALF_TAPS-1 leading zeros; anchor_*: (K,
    n_tiles) per-tile 16.32 position anchors; inv_*: (K,) 16.32 limbs of
    1/ratio; in_limit/rows: (K,) truncation bound (xpad index) and valid
    mag-matrix rows; so_*/fo_*: (R, states)/(R, Jk) 16.16 offset halves
    over the PRUNED entry axis (speed_scan drops (block, j) entries whose
    row index falls outside the clip for every state — the reference's
    have_mag==0 rows, src/wmspeed.cc:330-360 — which for a 25 s scan1 clip
    removes ~half the gather); cols/swap: (Jk,) per-entry mag-matrix
    column and B-block up/down swap flag.
    """
    C = xpad.shape[1]
    nblk = T_TILE // _RS_KBLK
    taps = jnp.arange(N_TAPS, dtype=jnp.int32)
    tap_rel = taps.astype(jnp.float32) - (HALF_TAPS - 1)

    def per_center(args):
        (ab, a1, a0, ii, i1, i0, ilim, rws, fr_c, hw_c) = args

        def per_tile(tile_args):
            ab_t, a1_t, a0_t = tile_args
            k = jnp.arange(T_TILE, dtype=jnp.int32)
            s0 = a0_t + k * i0
            f0 = s0 & 0xFFFF
            s1 = a1_t + k * i1 + (s0 >> 16)
            f1 = s1 & 0xFFFF
            base = ab_t + k * ii + (s1 >> 16)
            frac = (f1.astype(jnp.float32) * 65536.0
                    + f0.astype(jnp.float32)) * jnp.float32(2.0 ** -32)

            if not dense:
                # gather form: 96 taps fetched per output sample.  Random
                # gathers are cheap on CPU (the test platform) and 11x
                # slower than the dense band on TPU.
                idx = base[:, None] + taps[None, :]
                valid = (idx < ilim).astype(jnp.float32)
                g = xpad[jnp.clip(idx, 0, xpad.shape[0] - 1)]  # (T, taps, C)
                t = frac[:, None] - tap_rel[None, :]
                w_arg = t / hw_c
                win = jnp.where(jnp.abs(w_arg) >= 1.0, 0.0,
                                0.42 + 0.5 * jnp.cos(jnp.pi * w_arg)
                                + 0.08 * jnp.cos(2 * jnp.pi * w_arg))
                coeff = fr_c * jnp.sinc(t * fr_c) * win * valid
                return jnp.einsum("jmc,jm->jc", g, coeff,
                                  preferred_element_type=jnp.float32)

            base_b = base.reshape(nblk, _RS_KBLK)
            frac_b = frac.reshape(nblk, _RS_KBLK)

            # dense banded form (TPU): each 256-output block reads ONE
            # contiguous input window and builds its (256, rs_win)
            # coefficient band on the fly — no random gather (11x faster
            # than the 96-tap gather at scan1 geometry,
            # tools/gather_bench.py).  Taps outside the window's 96-sample
            # support get an exactly-zero Blackman coefficient, so the
            # extra columns add exact zeros — the same unified-tap
            # argument that fixed N_TAPS for every center.
            def per_blk(bb, fb):
                wstart = jnp.clip(bb[0], 0, xpad.shape[0] - rs_win)
                w = jax.lax.dynamic_slice(
                    xpad, (wstart, jnp.int32(0)), (rs_win, C))
                p = jnp.arange(rs_win, dtype=jnp.int32)
                # t for input sample wstart+p relative to output k: the
                # integer part stays in int32 (exact), matching the gather
                # form's frac - (m - (HALF_TAPS-1)) bit for bit
                tint = bb[:, None] - wstart - p[None, :] + (HALF_TAPS - 1)
                t = tint.astype(jnp.float32) + fb[:, None]
                w_arg = t / hw_c
                win = jnp.where(jnp.abs(w_arg) >= 1.0, 0.0,
                                0.42 + 0.5 * jnp.cos(jnp.pi * w_arg)
                                + 0.08 * jnp.cos(2 * jnp.pi * w_arg))
                gvalid = ((wstart + p) < ilim).astype(jnp.float32)
                coeff = fr_c * jnp.sinc(t * fr_c) * win * gvalid[None, :]
                return jnp.dot(coeff, w,
                               preferred_element_type=jnp.float32)

            return jax.vmap(per_blk)(base_b, frac_b).reshape(T_TILE, C)

        y = jax.lax.map(per_tile, (ab, a1, a0)).reshape(n_tiles * T_TILE, C)

        # windows r = y[r*128 : r*128+512] as 4 shifted hop-chunk slices
        w = jnp.concatenate(
            [y[i * SUB_HOP: i * SUB_HOP + rows_bucket * SUB_HOP]
             .reshape(rows_bucket, SUB_HOP, C) for i in range(4)], axis=1)
        spec = jnp.dot(w.transpose(0, 2, 1).reshape(rows_bucket * C,
                                                    SUB_FRAME),
                       dftm, preferred_element_type=jnp.float32)
        abs2 = (spec[:, :N_BANDS] ** 2 + spec[:, N_BANDS:] ** 2
                ).reshape(rows_bucket, C, N_BANDS)
        db = jnp.where(abs2 > 0, jnp.log2(abs2) * jnp.float32(_LOG2_DB),
                       jnp.float32(-96.0))
        D = jnp.dot(jnp.sum(db, axis=1), v.T,
                    preferred_element_type=jnp.float32)     # (rows, 2J)
        # (rows*J, 2) flattened so the lookup is ONE index vector fetching
        # contiguous (up, down) pairs: a single-index-array gather runs
        # 1.5x faster than the two-index-array advanced-indexing form at
        # scan1 geometry (tools/gather_bench.py), on top of the pair trick
        # that halved the index count
        Jfull = D.shape[1] // 2
        Dflat = D.reshape(-1, 2)
        if shift:
            # zero-padded transposed mag planes: (2*Jk, width), rows
            # minor — v was gathered host-side per kept entry, so D is
            # already (rows, 2*Jk) with up/down column halves.  Transpose
            # the SMALL (rows_bucket, 2Jk) matrix first and pad into the
            # wide buffer after: transposing the (width, 2Jk) padded form
            # crashed the TPU worker at specific width buckets (width
            # 25600 ran ~60 s then died; 24576 ran in ~1 s — an XLA/
            # Mosaic specialization cliff, bisected round 5)
            DT2 = jnp.zeros((D.shape[1], width), jnp.float32)
            DT2 = jax.lax.dynamic_update_slice(
                DT2, D.T, (jnp.int32(0), jnp.int32(padl)))
        if banded:
            # (2, J, rows + 2*BAND) plane-major view (up/down planes
            # LEADING, rows minor), zero-padded so a band whose clamp
            # would displace it is always fully masked (displacement only
            # happens when every state in the block indexes outside
            # [0, rows)).  Layout note: any tensor whose TPU minor dim is
            # the (up, down) pair pads 2 -> 128 lanes (64x memory — the
            # round-5 vmap-over-rels batch hit a 35 GB allocation on a
            # 0.5 GB logical gather); keeping rows minor here and the
            # 128-multiple entry axis minor in the fetched bands below
            # eliminates the padding entirely.
            Dt = D.reshape(D.shape[0], Jfull, 2).transpose(2, 1, 0)
            zpad = jnp.zeros((2, Jfull, _CB_BAND), jnp.float32)
            Dtp = jnp.concatenate([zpad, Dt, zpad], axis=2)
            rows_pad = rows_bucket + 2 * _CB_BAND

        expect = (jnp.arange(6) & 1).astype(jnp.float32)[None, :]

        def per_speed(sp_args):
            s_hi, s_lo, f_hi, f_lo, dm, p0_r, st_r = sp_args
            carry = (s_lo[:, None] + f_lo[None, :]) >> OFFSET_SHIFT
            idx = s_hi[:, None] + f_hi[None, :] + carry     # (states, Jk)
            mask = ((idx >= 0) & (idx < rws)).astype(jnp.float32)
            if shift:
                Jk = f_hi.shape[0]
                jj = jnp.arange(2 * Jk, dtype=jnp.int32)
                st2 = jnp.concatenate([st_r, st_r])

                def slice_row(j, s):
                    return jax.lax.dynamic_slice(
                        DT2, (j, s), (1, pmax))[0]

                # realigned planes: DshT[j, p] = D[st_r[j] + p - padl, j];
                # every slice is a contiguous row segment (the GOOD gather
                # shape: one shared index per 128-lane row)
                DshT = jax.vmap(slice_row)(jj, st2)       # (2Jk, pmax)
                Dsh = DshT.T                              # (pmax, 2Jk)
                A0 = jnp.take(Dsh, p0_r, axis=0)          # (S_pad, 2Jk)
                A1 = jnp.take(Dsh, p0_r + 1, axis=0)
                cb = carry == 1
                u_raw = jnp.where(cb, A1[:, :Jk], A0[:, :Jk])
                d_raw = jnp.where(cb, A1[:, Jk:], A0[:, Jk:])
            elif banded:
                S_pad, Jk = idx.shape
                NB = S_pad // _CB_BLK
                sh0 = s_hi.reshape(NB, _CB_BLK)[:, 0]
                start = sh0[:, None] + f_hi[None, :] + dm + _CB_BAND
                cst = jnp.clip(start, 0, rows_pad - _CB_BAND)  # (NB, Jk)

                def fetch(c, st):
                    return jax.lax.dynamic_slice(
                        Dtp, (jnp.int32(0), c, st),
                        (2, 1, _CB_BAND))[:, 0, :]           # (2, BAND)

                # out_axes place the 128-multiple entry axis MINOR:
                # G (NB, 2, BAND, Jk) — zero lane-padding waste, so the
                # gather result stays ~0.5 GB for an 8-rel batch instead
                # of 64x that (see the Dtp layout note above)
                G = jax.vmap(jax.vmap(fetch, in_axes=(0, 0), out_axes=-1),
                             in_axes=(None, 0))(cols, cst)

                o = jnp.arange(_CB_BLK, dtype=jnp.int32)
                d2 = (idx.reshape(NB, _CB_BLK, Jk)
                      + _CB_BAND - cst[:, None, :] - o[None, :, None])
                d2 = d2[:, None, :, :]                    # (NB, 1, BLK, Jk)
                acc = jnp.zeros((NB, 2, _CB_BLK, Jk), jnp.float32)
                for d in range(_CB_NSEL):
                    Vd = jax.lax.slice_in_dim(G, d, d + _CB_BLK, axis=2)
                    acc = acc + jnp.where(d2 == d, Vd, 0.0)
                u_raw = acc[:, 0].reshape(S_pad, Jk)
                d_raw = acc[:, 1].reshape(S_pad, Jk)
            else:
                cidx = jnp.clip(idx, 0, D.shape[0] - 1)
                g = Dflat[cidx * Jfull + cols[None, :]]     # (states, Jk, 2)
                u_raw = g[..., 0]
                d_raw = g[..., 1]
            u = jnp.where(swap[None, :] > 0, d_raw, u_raw) * mask
            d = jnp.where(swap[None, :] > 0, u_raw, d_raw) * mask
            u_bit = jnp.dot(u, bit_onehot,
                            preferred_element_type=jnp.float32)
            d_bit = jnp.dot(d, bit_onehot,
                            preferred_element_type=jnp.float32)
            cnt = jnp.dot(mask, bit_onehot,
                          preferred_element_type=jnp.float32)
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

        # batch_size=8: rels vectorize in chunks instead of one serial
        # while-loop step each — the per-step launch overhead (~15-20 ms
        # through the TPU runtime, nearly independent of geometry) was 83%
        # of the whole detect_speed scan (tools/speed_attrib.py round 5);
        # chunks of 8 bound the batched gather workspace (~0.4 GB at scan3
        # geometry) while amortizing the overhead 8x.  vmap does not
        # reorder per-rel reductions, so results stay bit-exact vs the
        # serial form (tests/test_speed_fused.py compares both paths).
        return jax.lax.map(per_speed,
                           (so_hi, so_lo, fo_hi, fo_lo, dmin, p0, st),
                           batch_size=8)

    return jax.lax.map(per_center, (anchor_base, anchor_f1, anchor_f0,
                                    inv_int, inv_f1, inv_f0,
                                    in_limit, rows, fr, half_width))


@partial(jax.jit, static_argnames=("n_tiles", "rows_bucket", "dense",
                                   "banded", "rs_win", "shift", "pmax",
                                   "padl", "width"))
def _speed_scan_core(*args, n_tiles: int, rows_bucket: int,
                     dense: bool, banded: bool, rs_win: int,
                     shift: bool = False, pmax: int = 0, padl: int = 0,
                     width: int = 0) -> jnp.ndarray:
    """Single-device scan: see _scan_body."""
    return _scan_body(*args, n_tiles=n_tiles, rows_bucket=rows_bucket,
                      dense=dense, banded=banded, rs_win=rs_win,
                      shift=shift, pmax=pmax, padl=padl, width=width)


def _dense_resample() -> bool:
    """Dense banded resample on TPU (random gathers are the scan's
    bottleneck there); gather form elsewhere (CPU gathers are cheap and
    the dense band's transcendental rectangle is ~8x the flops).
    AUDIOWMARK_SPEED_DENSE=0/1 overrides — tests compare both forms on
    CPU.  The flag is a jit static arg, so toggling it retraces."""
    import os
    ov = os.environ.get("AUDIOWMARK_SPEED_DENSE")
    if ov is not None:
        return ov not in ("0", "false")
    return jax.default_backend() == "tpu"


def _banded_compare() -> bool:
    """Banded offset compare on TPU (contiguous band slices + in-register
    select beat per-element gathers there); flat form elsewhere.
    AUDIOWMARK_SPEED_BANDED=0/1 overrides — tests compare both on CPU.
    speed_scan additionally requires the per-rel residual-bound proof."""
    import os
    ov = os.environ.get("AUDIOWMARK_SPEED_BANDED")
    if ov is not None:
        return ov not in ("0", "false")
    return jax.default_backend() == "tpu"


def _shift_compare() -> bool:
    """Shift-form offset compare (TPU default, round 5): per-entry
    contiguous row slices realign each mag-matrix column by its frame
    offset, then TWO shared-index row gathers (carry 0/1) fetch every
    (state, entry) value — no per-element gathers and no tensor with a
    small minor dim anywhere (the banded form's (..., 40, 2) gather output
    lane-pads 2 -> 128 on TPU: 64x memory, which both throttled the serial
    form and OOMed the rel-batched one).  Exact for ALL rels (no residual
    bound needed).  AUDIOWMARK_SPEED_SHIFT=0/1 overrides; an explicit
    AUDIOWMARK_SPEED_BANDED=1 (with no shift override) selects banded —
    tests compare all three forms on CPU."""
    import os
    ov = os.environ.get("AUDIOWMARK_SPEED_SHIFT")
    if ov is not None:
        return ov not in ("0", "false")
    if os.environ.get("AUDIOWMARK_SPEED_BANDED") not in ("", None):
        return False
    return jax.default_backend() == "tpu"


def scan_device_count() -> int:
    """Devices the speed scan shards its center axis over
    (AUDIOWMARK_MULTICHIP=0 disables, matching the sync-group gate)."""
    import os
    if os.environ.get("AUDIOWMARK_MULTICHIP", "1") in ("0", "false"):
        return 1
    return jax.device_count()


# index of the first center-sharded arg in _scan_body's signature (xpad is
# replicated; anchor_* through half_width carry the K axis; so_hi onward
# are replicated tables)
_N_CENTER_ARGS = 10


@lru_cache(maxsize=32)
def _speed_scan_core_sharded(n_dev: int, n_tiles: int, rows_bucket: int,
                             dense: bool, banded: bool, rs_win: int,
                             shift: bool = False, pmax: int = 0,
                             padl: int = 0, width: int = 0):
    """dp-sharded scan: centers split across an n_dev-device mesh, clip and
    offset tables replicated.  Per-center math is unchanged (each center
    runs the identical program on one device), so results are bitwise equal
    to the single-device core — asserted by tests/test_speed_multichip.py.
    Reference analogue: the ThreadPool jobs per SpeedSync
    (src/wmspeed.cc:433-492) fan out per center."""
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:         # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("centers",))
    body = partial(_scan_body, n_tiles=n_tiles, rows_bucket=rows_bucket,
                   dense=dense, banded=banded, rs_win=rs_win,
                   shift=shift, pmax=pmax, padl=padl, width=width)
    in_specs = ((P(),) + (P("centers"),) * _N_CENTER_ARGS
                + (P(),) * 13)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=P("centers"), check_vma=False)
    return jax.jit(fn)


@lru_cache(maxsize=8)
def _center_bucket(n: int) -> int:
    """Next power of two: padded centers run the full masked pipeline, so
    the pad must stay a small fraction (scan3 has K=1 — don't pad it)."""
    b = 1
    while b < n:
        b *= 2
    return b


def speed_scan(clip_samples: np.ndarray, n_channels: int,
               centers: Sequence[float], scan_seconds: float,
               rels: Sequence[float], sync_bits: SpeedSyncBits
               ) -> List[List[Tuple[float, float]]]:
    """Qualities for every (center, rel) pair, clip uploaded once.

    Centers are dispatched in watchdog-bounded groups (see
    _DISPATCH_SAMPLE_BUDGET); all device constants are uploaded once and
    reused across groups.  Returns, per center, [(quality, center*rel)] in
    rel order — the same values ops/speed.prepare_mag_matrix +
    compare_speed_batch produce stage-by-stage.  Falls back by raising
    ValueError when a ratio is out of the unified tap window's range
    (caller uses the staged path then); the geometry check runs before any
    device work so the fallback never sees a half-dispatched scan.
    """
    rate = Params.mark_sample_rate
    clip_frames = clip_samples.size // n_channels
    K_true = len(centers)

    geom = []
    for center in centers:
        ratio = center / 2.0
        if ratio < MIN_RATIO or ratio >= 1.0:
            raise ValueError("ratio %g outside fused speed-scan range"
                             % ratio)
        in_frames = min(clip_frames,
                        int(round(rate * scan_seconds / center)))
        out_frames = int(round(in_frames * ratio))
        rows = ((out_frames - SUB_FRAME - 1) // SUB_HOP + 1
                if out_frames > SUB_FRAME else 0)
        geom.append((ratio, in_frames, out_frames, rows))

    max_rows = max(r for _, _, _, r in geom)
    if max_rows <= 0:
        return [[(0.0, rel * c) for rel in rels] for c in centers]
    # dense-band window for THIS scan's ratios: columns past the coverage
    # bound are exactly zero, so the trim is exact (the CLI scans' ratios
    # stay >= ~0.40 => 768 instead of the 1024 worst-case cap — 25% less
    # coefficient work in the resample stage)
    min_ratio = min(r for r, _, _, _ in geom)
    needed = int(np.ceil((_RS_KBLK - 1) / min_ratio)) + N_TAPS + 2
    # snap to {768, 1024} only: rs_win is a jit static-shape axis, and a
    # 128-column granularity would retrace (multi-minute TPU compile) for
    # scans whose min ratio straddles a bucket edge — e.g. refine scans
    # around different detected speeds in one process.  Extra columns past
    # the coverage bound are exactly zero, so the coarser snap is exact.
    rs_win = 768 if needed <= 768 else _RS_WIN_MAX
    rows_bucket = -(-max_rows // _ROW_BUCKET) * _ROW_BUCKET
    y_len = rows_bucket * SUB_HOP + SUB_FRAME
    n_tiles = -(-y_len // T_TILE)

    x = clip_samples.astype(np.float32, copy=False).reshape(-1, n_channels)
    lead = HALF_TAPS - 1
    npad = -(-(lead + clip_frames + N_TAPS) // _XPAD_BUCKET) * _XPAD_BUCKET
    xpad = np.zeros((npad, n_channels), dtype=np.float32)
    xpad[lead: lead + clip_frames] = x

    so_hi, so_lo, fo_hi, fo_lo = _offset_tables(tuple(rels), sync_bits)
    norm = 1.0 / (min(Params.water_delta, 0.080) * 2.9)

    # prune (block, j) entries masked for EVERY state at every center in
    # this scan: valid needs 0 <= s_hi[s] + f_hi[j] + carry < rows for some
    # s, so any j with f_hi past max_rows - min(s_hi) (or before -max(s_hi)
    # - 1) never contributes (the clip is shorter than 3 blocks; scan1's
    # 25 s clip masks block 2 entirely and much of block 1).  Exact: the
    # kernel's own mask already zeroed these — they were pure gather cost.
    J = sync_bits.frame.size
    keep = np.zeros(3 * J, dtype=bool)
    for r in range(len(rels)):
        keep |= ((fo_hi[r] + int(so_hi[r, -1]) + 1 >= 0)
                 & (fo_hi[r] + int(so_hi[r, 0]) < max_rows))
    kept = np.nonzero(keep)[0]
    if kept.size == 0:
        return [[(0.0, rel * c) for rel in rels] for c in centers]
    jk = -(-kept.size // 128) * 128
    fo_hi_k = np.full((len(rels), jk), 1 << 28, dtype=fo_hi.dtype)
    fo_lo_k = np.zeros((len(rels), jk), dtype=fo_lo.dtype)
    fo_hi_k[:, :kept.size] = fo_hi[:, kept]
    fo_lo_k[:, :kept.size] = fo_lo[:, kept]
    cols_k = np.zeros(jk, dtype=np.int32)
    cols_k[:kept.size] = (kept % J).astype(np.int32)
    swap_k = np.zeros(jk, dtype=np.float32)
    swap_k[:kept.size] = (kept // J == 1).astype(np.float32)
    onehot_full = _bit_onehot(sync_bits)
    onehot_k = np.zeros((jk, 6), dtype=np.float32)
    onehot_k[:kept.size] = onehot_full[kept]

    # states pad to a multiple of _CB_BLK with always-masked sentinels
    # (so_hi = 1<<28 => idx >= rows) so the banded compare's blocks tile
    # evenly; the flat form tolerates them identically (masked rows score
    # quality 0, the floor of the max)
    R = len(rels)
    S = so_hi.shape[1]
    S_pad = -(-S // _CB_BLK) * _CB_BLK
    if S_pad != S:
        so_hi = np.concatenate(
            [so_hi, np.full((R, S_pad - S), 1 << 28, so_hi.dtype)], axis=1)
        so_lo = np.concatenate(
            [so_lo, np.zeros((R, S_pad - S), so_lo.dtype)], axis=1)
    # banded-compare precondition, proven from the exact so_hi table over
    # the REAL states: within every block, residual range + carry must fit
    # the _CB_NSEL select views.  Rels far from 1.0 (never produced by the
    # CLI scans) fail and use the flat per-element form instead.
    blocks = so_hi.reshape(R, -1, _CB_BLK).astype(np.int64)
    resid = blocks - blocks[:, :, :1] - np.arange(_CB_BLK, dtype=np.int64)
    real = (np.arange(S_pad) < S).reshape(-1, _CB_BLK)
    rr = resid[:, real]                                     # (R, n_real)
    dmin = rr.min(axis=1).astype(np.int32)
    shift = _shift_compare()
    banded = (not shift and _banded_compare()
              and bool(np.all(rr.max(axis=1) - dmin + 2 <= _CB_NSEL)))

    # shift-form tables (host-exact, see _shift_compare): per rel, entry
    # j's mag column realigns by st[r, j] so one slice covers every state;
    # states then read rows p0[r, s] (+carry) of the realigned matrix.
    # Sentinel entries/states clip into real data and are killed by the
    # same idx-bounds mask as the other forms.
    if shift:
        so_real = so_hi[:, :S].astype(np.int64)
        fo_real = fo_hi_k[:, :kept.size].astype(np.int64)
        smin = so_real.min(axis=1)                            # (R,)
        smax = so_real.max(axis=1)
        pmax = -(-(int((smax - smin).max()) + 2) // 512) * 512
        padl_need = int(max(0, -(fo_real + smin[:, None]).min()))
        padl = -(-padl_need // 128) * 128
        st_hi = int((fo_real + smin[:, None]).max()) + padl
        width_need = max(padl + rows_bucket, st_hi + pmax)
        width = -(-width_need // 8192) * 8192
        p0 = np.clip(so_hi.astype(np.int64) - smin[:, None], 0,
                     pmax - 2).astype(np.int32)               # (R, S_pad)
        st = np.clip(fo_hi_k.astype(np.int64) + smin[:, None] + padl, 0,
                     width - pmax).astype(np.int32)           # (R, jk)
        # sentinel (pruned) entries would clip to width - pmax, the
        # LARGEST slice start in the program; park them at 0 instead
        # (their gathered values are idx-masked) so the maximum start
        # stays the real entries' bound
        st[:, kept.size:] = 0
        # v rows gathered per kept entry: D comes out (rows, 2*jk) with
        # up columns [0, jk) and down columns [jk, 2*jk) — the cols
        # indirection moves to the host
        v_host = np.concatenate([sync_bits.v[2 * cols_k],
                                 sync_bits.v[2 * cols_k + 1]],
                                axis=0).astype(np.float32)
    else:
        pmax = padl = width = 0
        p0 = np.zeros((R, so_hi.shape[1]), np.int32)
        st = np.zeros((R, jk), np.int32)
        v_host = sync_bits.v

    # constants uploaded once, reused by every group dispatch
    xpad_d = jax.device_put(xpad)
    so_hi_d, so_lo_d = jax.device_put(so_hi), jax.device_put(so_lo)
    dmin_d = jax.device_put(dmin)
    fo_hi_d, fo_lo_d = jax.device_put(fo_hi_k), jax.device_put(fo_lo_k)
    p0_d, st_d = jax.device_put(p0), jax.device_put(st)
    cols_d, swap_d = jax.device_put(cols_k), jax.device_put(swap_k)
    onehot_d = jax.device_put(onehot_k)
    dftm_d = jax.device_put(_sub_dft_matrix())
    v_d = jax.device_put(v_host)

    # multi-chip: centers shard over the mesh, so each dispatch carries
    # n_dev x the per-device watchdog budget (every device still runs at
    # most `per_dev` centers of sequential work)
    n_dev = scan_device_count()
    per_dev = max(1, min(8, _DISPATCH_SAMPLE_BUDGET // (n_tiles * T_TILE)))
    group = per_dev * n_dev
    # every group dispatch is ENQUEUED before any result is fetched: the
    # device runs the groups back-to-back while the host builds the next
    # group's anchor tables, and the single batched fetch at the end pays
    # one synchronized RPC instead of one per group (~30 ms each through
    # the tunnel)
    pending: List[Tuple[object, List[float]]] = []
    for g0 in range(0, K_true, group):
        gc = centers[g0: g0 + group]
        gg = geom[g0: g0 + group]
        K = _center_bucket(len(gc)) if len(gc) < group else group
        if n_dev > 1:
            K = -(-K // n_dev) * n_dev     # centers must divide the mesh
        anchor_base = np.zeros((K, n_tiles), dtype=np.int32)
        anchor_f1 = np.zeros((K, n_tiles), dtype=np.int32)
        anchor_f0 = np.zeros((K, n_tiles), dtype=np.int32)
        inv_int = np.zeros(K, dtype=np.int32)
        inv_f1 = np.zeros(K, dtype=np.int32)
        inv_f0 = np.zeros(K, dtype=np.int32)
        in_limit = np.zeros(K, dtype=np.int32)
        rows_arr = np.zeros(K, dtype=np.int32)
        fr = np.ones(K, dtype=np.float32)
        half_width = np.full(K, HALF_TAPS, dtype=np.float32)

        for i, (center, (ratio, in_frames, _, rows)) in enumerate(
                zip(gc, gg)):
            inv_fp = int(round((2.0 / center) * (1 << 32)))
            inv_int[i], inv_f1[i], inv_f0[i] = _split48(inv_fp)
            for t in range(n_tiles):
                ab, a1, a0 = _split48(t * T_TILE * inv_fp)
                anchor_base[i, t] = ab
                anchor_f1[i, t] = a1
                anchor_f0[i, t] = a0
            in_limit[i] = in_frames + HALF_TAPS - 1
            rows_arr[i] = rows
            fr[i] = ratio
            half_width[i] = 16.0 / ratio

        core = (_speed_scan_core_sharded(n_dev, n_tiles, rows_bucket,
                                         _dense_resample(), banded, rs_win,
                                         shift, pmax, padl, width)
                if n_dev > 1 else
                partial(_speed_scan_core, n_tiles=n_tiles,
                        rows_bucket=rows_bucket, dense=_dense_resample(),
                        banded=banded, rs_win=rs_win, shift=shift,
                        pmax=pmax, padl=padl, width=width))
        pending.append((core(
            xpad_d,
            jnp.asarray(anchor_base), jnp.asarray(anchor_f1),
            jnp.asarray(anchor_f0),
            jnp.asarray(inv_int), jnp.asarray(inv_f1), jnp.asarray(inv_f0),
            jnp.asarray(in_limit), jnp.asarray(rows_arr),
            jnp.asarray(fr), jnp.asarray(half_width),
            so_hi_d, so_lo_d, fo_hi_d, fo_lo_d, dmin_d, p0_d, st_d,
            cols_d, swap_d, onehot_d, dftm_d, v_d, jnp.float32(norm)), gc))

    fetched = fetch_tree([q for q, _ in pending])
    per_center_rows: List[List[Tuple[float, float]]] = []
    for q_host, (_, gc) in zip(fetched, pending):
        q = np.asarray(q_host)
        per_center_rows.extend(
            [(float(q[i, r]), rel * center) for r, rel in enumerate(rels)]
            for i, center in enumerate(gc))

    return per_center_rows
