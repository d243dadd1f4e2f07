"""Sync finder: candidate selection pipeline over the device score sweep.

Mirrors SyncFinder (src/syncfinder.cc): approx search over all starts at
4 shifts -> local-mean subtraction -> local maxima -> opposite-sign false-
positive masking -> threshold/n-best -> +-256 step-8 refinement -> final
classification (quality = |raw - mean|, block type A for positive sign).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Tuple

import numpy as np

from ..codec.convcode import ConvBlockType
from ..crypto.keys import Key
from ..ops import sync as sync_ops
from ..params import Params
from ..tables import get_key_tables
from ..utils.devcache import fetch_tree


class SyncMode(Enum):
    BLOCK = 0
    CLIP = 1


@dataclass
class Score:
    index: int
    quality: float
    block_type: ConvBlockType
    # raw soft bits extracted in-kernel by the fused search at this score's
    # refined position (None when the staged/tiled path searched — the
    # decoder then runs its own extraction batch).  CLIP-mode scores also
    # carry raw2, the consecutive second block's bits.
    raw: Optional[np.ndarray] = None
    raw2: Optional[np.ndarray] = None


@dataclass
class KeyResult:
    key: Key
    sync_scores: List[Score] = field(default_factory=list)


@dataclass
class _SearchScore:
    index: int
    raw_quality: float
    local_mean: float
    raw: Optional[np.ndarray] = None
    raw2: Optional[np.ndarray] = None

    def abs_quality(self) -> float:
        return abs(self.raw_quality - self.local_mean)


def _frame_count(wav_data) -> int:
    return wav_data.n_values // wav_data.n_channels // Params.frame_size


def _scan_silence(samples: np.ndarray) -> Tuple[int, int]:
    """First/last non-zero raw sample-value indices
    (src/syncfinder.cc:155-169); returns (first, last) with last exclusive."""
    nz = np.nonzero(samples)[0]
    if nz.size == 0:
        return 0, 0
    return int(nz[0]), int(nz[-1]) + 1


def _select_local_maxima(abs_q: np.ndarray) -> np.ndarray:
    """Local-maxima mask matching the reference's sequential scan
    (src/syncfinder.cc:258-281): a selected peak skips its right neighbor,
    which on plateaus of equal values selects every other element.  That
    alternation restarts at each run of consecutive candidate positions, so
    it vectorizes as (position - run_start) even."""
    n = abs_q.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    q_prev = np.concatenate(([0.0], abs_q[:-1]))
    q_next = np.concatenate((abs_q[1:], [0.0]))
    mask = (abs_q >= q_prev) & (abs_q >= q_next)
    idx = np.arange(n)
    run_start = mask & np.concatenate(([True], ~mask[:-1]))
    start = np.maximum.accumulate(np.where(run_start, idx, -1))
    return mask & ((idx - start) % 2 == 0)


def _mask_avg_false_positives(indices: np.ndarray, raw: np.ndarray,
                              mean: np.ndarray) -> np.ndarray:
    """Keep-mask: drop candidates with an opposite-sign neighbor 3x larger
    within 23 steps (src/syncfinder.cc:283-332).  Scanned as 23 shifted
    array comparisons instead of the O(n*47) inner loop."""
    mask_distance = 20 + 3  # local_mean_distance + 3
    mask_factor = 3.0
    n = indices.size
    aq = np.abs(raw - mean)
    sign = np.where(raw - mean < 0, -1, 1)
    masked = np.zeros(n, dtype=bool)
    for d in range(1, min(mask_distance, n - 1) + 1):
        step_dist = (indices[d:] - indices[:-d]) // Params.sync_search_step
        opp = (step_dist <= mask_distance) & (sign[d:] != sign[:-d])
        masked[:-d] |= opp & (aq[d:] > aq[:-d] * mask_factor)
        masked[d:] |= opp & (aq[:-d] > aq[d:] * mask_factor)
    return ~masked


def _threshold_n_best_order(abs_q: np.ndarray, threshold: float) -> np.ndarray:
    """Positions ordered by descending quality, truncated to all-above-
    threshold or at least get_n_best (src/syncfinder.cc:364-383).  Stable
    sort keeps the reference's tie order (original index order)."""
    order = np.argsort(-abs_q, kind="stable")
    n_above = int(np.count_nonzero(abs_q > threshold))
    keep = n_above if n_above >= Params.get_n_best \
        else min(Params.get_n_best, abs_q.size)
    return order[:keep]


def _select_threshold_and_n_best(scores: List[_SearchScore],
                                 threshold: float) -> List[_SearchScore]:
    aq = np.array([s.abs_quality() for s in scores], dtype=np.float64)
    return [scores[i] for i in _threshold_n_best_order(aq, threshold)]


def _fake_sync(key_list: List[Key], wav_data, mode: SyncMode) -> List[KeyResult]:
    """--test-no-sync: exact expected positions (src/syncfinder.cc:460-485)."""
    result_scores = []
    if mode == SyncMode.BLOCK:
        tables = get_key_tables(key_list[0])
        expect0 = Params.frames_pad_start * Params.frame_size
        expect_step = tables.frames_per_block * Params.frame_size
        expect_end = _frame_count(wav_data) * Params.frame_size
        ab = 0
        idx = expect0
        while idx + expect_step < expect_end:
            result_scores.append(Score(
                idx, 1.0,
                ConvBlockType.b if (ab & 1) else ConvBlockType.a))
            ab += 1
            idx += expect_step
    return [KeyResult(key=key, sync_scores=list(result_scores))
            for key in key_list]


# fused-search health: a remote-TPU compile/dispatch fault (e.g. the tunnel's
# compile RPC dropping mid-stream on a large HLO) must degrade to the staged
# multi-dispatch path, not kill the CLI.  One retry covers transient drops;
# a second failure poisons the fused path for the process lifetime.
_fused_runtime_broken = False


def _runtime_error_types():
    import jax
    try:
        return (jax.errors.JaxRuntimeError,)
    except AttributeError:      # pragma: no cover - older jax
        return (RuntimeError,)


def search(key_list: List[Key], wav_data, mode: SyncMode) -> List[KeyResult]:
    """Candidate block starts per key.  Production path: the fused single-
    dispatch search kernel (ops/search_fused.py) with the exact selection
    semantics applied to its fetched (K,) outputs; falls back to the staged
    multi-dispatch path when the candidate slots saturate, the stream is
    too short for the kernel, or the fused compile/dispatch fails at
    runtime."""
    global _fused_runtime_broken
    if Params.test_no_sync:
        return _fake_sync(key_list, wav_data, mode)

    from ..utils import prof
    from ..utils.log import warning
    results: List[KeyResult] = []
    with prof.phase("get.search_%s" % mode.name.lower()):
        if _fused_runtime_broken:
            return search_staged(key_list, wav_data, mode)
        for key in key_list:
            try:
                r = _search_fused_one(key, wav_data, mode)
            except _runtime_error_types() as e:
                try:            # one retry: tunnel drops are often transient
                    r = _search_fused_one(key, wav_data, mode)
                except _runtime_error_types():
                    _fused_runtime_broken = True
                    warning("audiowmark: fused sync search unavailable "
                            "(%s); using the staged path\n" % e)
                    return search_staged(key_list, wav_data, mode)
            if r is None:
                return search_staged(key_list, wav_data, mode)
            results.append(r)
    return results


_K_CAP = 1024               # beyond this the staged path is the better tool


def _fused_k_for(T: int, frames_per_block: int, n_starts_s: int,
                 k_min: int = 0) -> Tuple[int, bool]:
    """Candidate slot count (>= k_min for saturation-escalation retries)
    and whether it covers EVERY start — complete coverage makes slot
    saturation impossible (reduced sync geometries can put hundreds of
    candidates above the approx threshold)."""
    from ..ops import search_fused
    K = min(n_starts_s,
            max(search_fused.top_k_for(T, frames_per_block),
                -(-max(Params.get_n_best, 1) // 8) * 8, k_min))
    return K, K >= n_starts_s


def _finalize_scores(key: Key, refined: List[_SearchScore]) -> KeyResult:
    """Refined candidates -> threshold/n-best -> index-ordered Scores
    (the tail of src/syncfinder.cc:393-458)."""
    refined.sort(key=lambda s: s.index)
    refined = _select_threshold_and_n_best(refined, Params.sync_threshold2)
    refined.sort(key=lambda s: s.index)

    result = KeyResult(key=key)
    for s in refined:
        qd = s.raw_quality - s.local_mean
        result.sync_scores.append(Score(
            index=s.index, quality=abs(qd),
            block_type=ConvBlockType.a if qd > 0 else ConvBlockType.b,
            raw=s.raw, raw2=s.raw2))
    return result


def _select_from_fused(key: Key, out_np: dict, K: int, clip: bool,
                       complete: bool = False):
    """Exact CLI selection from the fused kernel's fetched (K,) outputs;
    None -> slot saturation, the caller must use the staged path."""
    n_el = int(np.count_nonzero(out_np["eligible"]))
    q = np.asarray(out_np["q"], dtype=np.float64)[:n_el]
    mean = np.asarray(out_np["mean"], dtype=np.float64)[:n_el]
    rpos = np.asarray(out_np["refined_pos"])[:n_el]
    rq = np.asarray(out_np["refined_q"], dtype=np.float64)[:n_el]

    # approx threshold/n-best truncation (the kernel's top-K slots are
    # quality-descending with index tie order, exactly the host ordering)
    aq = np.abs(q - mean)
    n_above = int(np.count_nonzero(aq > Params.sync_threshold2 * 0.75))
    if n_el == K and n_above == K and not complete:
        return None          # slots saturated: candidates may be missing
    keep = n_above if n_above >= Params.get_n_best \
        else min(Params.get_n_best, n_el)
    if clip:
        keep = min(keep, max(Params.get_n_best, 5))

    raws = out_np.get("raws")
    refined = []
    for i in range(keep):
        s = _SearchScore(index=int(rpos[i]), raw_quality=float(rq[i]),
                         local_mean=float(mean[i]))
        if raws is not None:
            if clip:
                s.raw = np.asarray(raws[i][0], dtype=np.float32)
                s.raw2 = np.asarray(raws[i][1], dtype=np.float32)
            else:
                s.raw = np.asarray(raws[i], dtype=np.float32)
        refined.append(s)
    return _finalize_scores(key, refined)


def _search_fused_one(key: Key, wav_data, mode: SyncMode):
    """One-dispatch search for one key; None -> caller uses the staged path
    (slot saturation: more candidates above the approx threshold than the
    kernel's fixed top-K captured)."""
    import jax.numpy as jnp

    from ..ops import search_fused
    from ..utils.devcache import device_audio

    samples = wav_data.samples
    n_channels = wav_data.n_channels
    true_frames = samples.size // n_channels
    F = true_frames // Params.frame_size
    tables = get_key_tables(key)
    clip = mode == SyncMode.CLIP
    sync_bits = sync_ops.build_sync_bits(tables, clip)
    n_starts_true = sync_ops.SHIFTS * (F - 1 - sync_bits.total_frames)
    if n_starts_true <= 0:
        return KeyResult(key=key)

    T = search_fused.bucket_frames(F)
    if T > search_fused.MAX_FUSED_FRAMES:
        if clip:
            return None         # clips are short; oversize -> staged path
        return _search_fused_tiled(key, wav_data, tables, sync_bits,
                                   n_starts_true)
    n_starts_s = sync_ops.SHIFTS * (T - 1 - sync_bits.total_frames)

    if clip:
        sil_first, sil_last = _scan_silence(samples)
    else:
        sil_first, sil_last = 0, samples.size

    # FLAT across the jit boundary: a (n, 2) device array is 64x lane-padded
    x = device_audio(samples)
    pad_vals = T * Params.frame_size * n_channels - x.shape[0]
    if pad_vals:
        x = jnp.concatenate([x, jnp.zeros(pad_vals, jnp.float32)])

    # saturation escalation: retry with 4x the slots before giving the
    # stream to the staged path (reduced sync geometries overflow the
    # default top-K with above-threshold candidates)
    k_min = 0
    while True:
        K, complete = _fused_k_for(T, tables.frames_per_block, n_starts_s,
                                   k_min)
        searcher = search_fused.build_searcher(tables, clip, T,
                                               n_channels, K)
        if searcher is None:
            return None
        out = searcher(x, np.int32(n_starts_true), np.int32(true_frames),
                       np.int32(sil_first), np.int32(sil_last),
                       np.int32(0), np.int32(n_starts_s))
        out_np = fetch_tree(out)     # one overlapped transfer, not 6 RPCs
        r = _select_from_fused(key, out_np, K, clip, complete)
        if r is not None:
            return r
        if complete or K >= _K_CAP:
            return None
        k_min = K * 4


def _search_fused_tiled(key: Key, wav_data, tables, sync_bits,
                        n_starts_true: int):
    """BLOCK search for streams beyond MAX_FUSED_FRAMES (the production
    30-minute chunk, src/wavchunkloader.cc:74-97): overlapping fixed-shape
    tiles of MAX_FUSED_FRAMES frames, ONE fused dispatch each, eligibility
    restricted to disjoint core ranges, merged CLI-exact selection on host.

    Scores are exact everywhere (each start's span lies inside its tile's
    real audio); eligibility needs neighborhood context (+-20 local mean,
    +-23 opposite-sign mask), so each tile also scores a TILE_HALO ring it
    is not eligible to emit — results match the unbounded single-dispatch
    kernel except for exact-score-tie plateaus crossing a tile boundary.

    Transport: the chunk is uploaded ONCE (device_audio, reused later by
    the block decode); tiles are device-side slices, so the tile overlap
    (the block-long sync span + halo, ~14% at the production cap) never
    crosses the host link.  None -> staged path (slot saturation at the K
    cap or a degenerate tile geometry).

    Dispatch discipline (round-4 review weak #3 — search_block was 76 s of
    a 103 s 32-min decode): every tile ENQUEUES before any tile fetches
    (the device streams tile-to-tile with no fetch-RTT bubbles), tiles
    skip the in-kernel raw extraction (extract=False — cross-tile
    selection keeps ~n_best of K*n_tiles slots, so per-tile extraction was
    mostly discarded work; the decoder's batch extraction handles the
    survivors), and saturated tiles escalate K individually on fetch."""
    import jax.numpy as jnp

    from ..ops import search_fused
    from ..utils.devcache import device_audio

    samples = wav_data.samples
    C = wav_data.n_channels
    frame = Params.frame_size
    true_frames = samples.size // C            # per-channel samples
    T_tile = search_fused.MAX_FUSED_FRAMES
    HALO = search_fused.TILE_HALO
    shifts = sync_ops.SHIFTS
    n_starts_tile = shifts * (T_tile - 1 - sync_bits.total_frames)
    if n_starts_tile <= 2 * HALO + shifts:
        return None             # tile can't fit a core between its halos
    tile_vals = T_tile * frame * C

    x_full = device_audio(samples)

    # ---- phase 1: geometry + one optimistic dispatch per tile ----
    tiles = []                  # (g0, f0, core_lo, core_hi, x, args, K,
    #                              complete, out)
    g_core_lo = 0
    while g_core_lo < n_starts_true:
        f0 = max(g_core_lo - HALO, 0) // shifts
        g0 = shifts * f0
        core_lo = g_core_lo - g0
        n_valid = min(n_starts_tile, n_starts_true - g0)
        core_hi = n_valid if g0 + n_starts_tile >= n_starts_true \
            else n_starts_tile - HALO
        lo_v = f0 * frame * C
        seg_vals = min(tile_vals, samples.size - lo_v)
        x = x_full[lo_v: lo_v + seg_vals]      # device-side slice
        if seg_vals < tile_vals:
            x = jnp.concatenate(
                [x, jnp.zeros(tile_vals - seg_vals, jnp.float32)])
        n_samp_rel = true_frames - f0 * frame

        K, complete = _fused_k_for(T_tile, tables.frames_per_block,
                                   core_hi - core_lo)
        searcher = search_fused.build_searcher(tables, False, T_tile,
                                               C, K, extract=False)
        if searcher is None:
            return None
        args = (np.int32(n_valid), np.int32(n_samp_rel), np.int32(0),
                np.int32(seg_vals), np.int32(core_lo), np.int32(core_hi))
        out = searcher(x, *args)               # enqueued, NOT fetched
        tiles.append((g0, f0, core_lo, core_hi, x, args, K, complete, out))
        g_core_lo = g0 + core_hi

    # ---- phase 2: fetch in dispatch order; escalate saturated tiles ----
    cand = {k: [] for k in ("t", "q", "mean", "rpos", "rq")}
    for g0, f0, core_lo, core_hi, x, args, K, complete, out in tiles:
        while True:
            out_np = fetch_tree(out)
            n_el = int(np.count_nonzero(out_np["eligible"]))
            aq = np.abs(out_np["q"][:n_el].astype(np.float64)
                        - out_np["mean"][:n_el].astype(np.float64))
            n_above = int(np.count_nonzero(
                aq > Params.sync_threshold2 * 0.75))
            if not (n_el == K and n_above == K and not complete):
                break
            if K >= _K_CAP:
                return None    # saturated tile at the cap: staged path
            K, complete = _fused_k_for(T_tile, tables.frames_per_block,
                                       core_hi - core_lo, K * 4)
            searcher = search_fused.build_searcher(tables, False, T_tile,
                                                   C, K, extract=False)
            if searcher is None:
                return None
            out = searcher(x, *args)
        cand["t"].append(out_np["t"][:n_el].astype(np.int64) + g0)
        cand["q"].append(out_np["q"][:n_el].astype(np.float64))
        cand["mean"].append(out_np["mean"][:n_el].astype(np.float64))
        cand["rpos"].append(out_np["refined_pos"][:n_el].astype(np.int64)
                            + f0 * frame)
        cand["rq"].append(out_np["refined_q"][:n_el].astype(np.float64))

    # ---- merged CLI-exact selection: each tile's top-K slots are quality-
    # descending, but the host selection breaks quality ties by APPROX step
    # order, so sort the merged slots by global step first (cores are
    # disjoint, so steps are unique across tiles)
    order = np.argsort(np.concatenate(cand["t"]), kind="stable")
    q = np.concatenate(cand["q"])[order]
    mean = np.concatenate(cand["mean"])[order]
    rpos = np.concatenate(cand["rpos"])[order]
    rq = np.concatenate(cand["rq"])[order]
    sel = _threshold_n_best_order(np.abs(q - mean),
                                  Params.sync_threshold2 * 0.75)
    keep = [_SearchScore(index=int(rpos[i]), raw_quality=float(rq[i]),
                         local_mean=float(mean[i])) for i in sel]
    return _finalize_scores(key, keep)


def group_device_count() -> int:
    """Devices available for chunk-group data parallelism in the CLI get
    path (AUDIOWMARK_MULTICHIP=0 disables; single device -> 1)."""
    import os
    if os.environ.get("AUDIOWMARK_MULTICHIP", "1") in ("0", "false"):
        return 1
    import jax
    return jax.device_count()


def search_block_group(key_list: List[Key], wav_list) -> Optional[list]:
    """Multi-chip BLOCK search over a group of chunks: ONE dp-sharded
    dispatch per key scores every chunk in parallel (the production
    `get` chunk loop's device-parallel axis; reference analogue is the
    ThreadPool fan-out in src/syncfinder.cc:607-657).

    Returns per-chunk List[KeyResult] with results identical to calling
    `search(key_list, chunk, BLOCK)` per chunk, or None if any chunk needs
    the fallback path (saturated slots, degenerate sizes, --test-no-sync)
    — the caller then decodes chunk-by-chunk as usual."""
    if Params.test_no_sync or len(wav_list) < 2 or _fused_runtime_broken:
        return None
    from ..ops import search_fused

    n_dev = group_device_count()
    n_channels = wav_list[0].n_channels
    geom = []
    for wav in wav_list:
        true_frames = wav.samples.size // n_channels
        geom.append((true_frames, true_frames // Params.frame_size))
    T = max(search_fused.bucket_frames(f) for _, f in geom)
    if T > search_fused.MAX_FUSED_FRAMES:
        return None             # per-chunk staged path for very long chunks
    B = -(-len(wav_list) // n_dev) * n_dev

    per_chunk: list = [[] for _ in wav_list]
    for key in key_list:
        tables = get_key_tables(key)
        sync_bits = sync_ops.build_sync_bits(tables, False)
        n_starts_s = sync_ops.SHIFTS * (T - 1 - sync_bits.total_frames)
        if n_starts_s <= 0:
            return None

        # flat interleaved per chunk (see build_searcher's layout note)
        xs = np.zeros((B, T * Params.frame_size * n_channels), np.float32)
        n_starts = np.zeros(B, np.int32)
        frames = np.zeros(B, np.int32)
        sil_last = np.zeros(B, np.int32)
        for i, wav in enumerate(wav_list):
            true_frames, F = geom[i]
            xs[i, : wav.samples.size] = wav.samples
            n_starts[i] = max(
                sync_ops.SHIFTS * (F - 1 - sync_bits.total_frames), 0)
            frames[i] = true_frames
            sil_last[i] = wav.samples.size

        k_min = 0
        while True:
            K, complete = _fused_k_for(T, tables.frames_per_block,
                                       n_starts_s, k_min)
            searcher = search_fused.build_searcher_group(
                tables, False, T, n_channels, K, B, n_dev)
            if searcher is None:
                return None
            try:
                out = searcher(xs, n_starts, frames, np.zeros(B, np.int32),
                               sil_last, np.zeros(B, np.int32),
                               np.full(B, n_starts_s, np.int32))
            except _runtime_error_types():
                return None     # caller decodes per chunk (its own fallback)
            out_np = fetch_tree(out)
            key_rs = []
            for i in range(len(wav_list)):
                if n_starts[i] <= 0:
                    key_rs.append(KeyResult(key=key))
                    continue
                r = _select_from_fused(
                    key, {k: v[i] for k, v in out_np.items()}, K, False,
                    complete)
                if r is None:
                    break           # saturated chunk: escalate K
                key_rs.append(r)
            if len(key_rs) == len(wav_list):
                break
            if complete or K >= _K_CAP:
                return None
            k_min = K * 4
        for i, r in enumerate(key_rs):
            per_chunk[i].append(r)
    return per_chunk


def search_clip_pair_launch(key_list: List[Key], wav_list):
    """DISPATCH half of search_clip_pair: device-assemble the padded
    windows and enqueue one vmapped search dispatch per key, WITHOUT
    fetching.  Returns a zero-arg finish() that fetches + selects (with
    synchronous slot-saturation escalation retries), or None when the
    pair path is unavailable up front.

    The split lets the CLI enqueue the clip search BEFORE the block
    search's blocking fetch — through the remote-TPU tunnel the clip
    windows then score while the block results are in flight, instead of
    paying a second full dispatch+fetch round trip afterwards."""
    if Params.test_no_sync or _fused_runtime_broken or len(wav_list) < 2:
        return None
    import jax.numpy as jnp

    from ..ops import search_fused
    from ..utils import prof
    from ..utils.devcache import device_audio

    C = wav_list[0].n_channels
    sizes = [w.samples.size for w in wav_list]
    Fs = [s // C // Params.frame_size for s in sizes]
    T = max(search_fused.bucket_frames(F) for F in Fs)
    if T > search_fused.MAX_FUSED_FRAMES:
        return None              # clips are short; oversize -> per-window
    tile_vals = T * Params.frame_size * C
    B = len(wav_list)

    with prof.phase("get.search_clip"):
        sil = [_scan_silence(w.samples) for w in wav_list]
        xs = []
        for w in wav_list:
            x = device_audio(w.samples)
            if x.shape[0] < tile_vals:
                x = jnp.concatenate(
                    [x, jnp.zeros(tile_vals - x.shape[0], jnp.float32)])
            xs.append(x)
        xb = jnp.stack(xs)

        pending = []             # (key, geometry..., first dispatch output)
        for key in key_list:
            tables = get_key_tables(key)
            sync_bits = sync_ops.build_sync_bits(tables, True)
            n_starts_s = sync_ops.SHIFTS * (T - 1 - sync_bits.total_frames)
            if n_starts_s <= 0:
                return None
            n_starts = np.array(
                [max(sync_ops.SHIFTS * (F - 1 - sync_bits.total_frames), 0)
                 for F in Fs], np.int32)
            frames = np.array([s // C for s in sizes], np.int32)
            sfirst = np.array([a for a, _ in sil], np.int32)
            slast = np.array([b for _, b in sil], np.int32)
            args = (n_starts, frames, sfirst, slast,
                    np.zeros(B, np.int32), np.full(B, n_starts_s, np.int32))

            K, complete = _fused_k_for(T, tables.frames_per_block,
                                       n_starts_s)
            searcher = search_fused.build_searcher_group(
                tables, True, T, C, K, B, 1)
            if searcher is None:
                return None
            try:
                out = searcher(xb, *args)    # enqueued, NOT fetched
            except _runtime_error_types():
                return None  # caller searches per window (own fallback)
            pending.append((key, tables, n_starts_s, args, K, complete,
                            out))

    def finish() -> Optional[List[List[KeyResult]]]:
        with prof.phase("get.search_clip"):
            per_window: List[List[KeyResult]] = [[] for _ in wav_list]
            for key, tables, n_starts_s, args, K, complete, out in pending:
                n_starts = args[0]
                while True:
                    out_np = fetch_tree(out)
                    key_rs = []
                    for i in range(B):
                        if n_starts[i] <= 0:
                            key_rs.append(KeyResult(key=key))
                            continue
                        r = _select_from_fused(
                            key, {k: v[i] for k, v in out_np.items()}, K,
                            True, complete)
                        if r is None:
                            break   # saturated window: escalate K
                        key_rs.append(r)
                    if len(key_rs) == B:
                        break
                    if complete or K >= _K_CAP:
                        return None
                    # synchronous escalation retry (rare: reduced sync
                    # geometries overflowing the default slot count)
                    K, complete = _fused_k_for(T, tables.frames_per_block,
                                               n_starts_s, K * 4)
                    searcher = search_fused.build_searcher_group(
                        tables, True, T, C, K, B, 1)
                    if searcher is None:
                        return None
                    try:
                        out = searcher(xb, *args)
                    except _runtime_error_types():
                        return None
                for i, r in enumerate(key_rs):
                    per_window[i].append(r)
            return per_window

    return finish


def search_clip_pair(key_list: List[Key],
                     wav_list) -> Optional[List[List[KeyResult]]]:
    """CLIP search over the clip decoder's padded start/end windows in ONE
    vmapped dispatch per key (the windows share the searcher shape, so two
    separate dispatches pay a second ~0.3 s tunnel round trip for nothing).

    The windows are device-assembled (register_padded) slices of the
    chunk's cached upload — stacking them on device keeps the batch off
    the host link entirely.  Returns per-window List[KeyResult] with
    results identical to search(key_list, window, CLIP), or None when the
    caller must search per window (--test-no-sync, fused path poisoned,
    oversize window, slot saturation at the cap, runtime fault)."""
    fin = search_clip_pair_launch(key_list, wav_list)
    return fin() if fin is not None else None


def search_staged(key_list: List[Key], wav_data,
                  mode: SyncMode) -> List[KeyResult]:
    """Multi-dispatch reference path (oracle for the fused kernel and the
    saturation fallback)."""
    samples = wav_data.samples
    n_channels = wav_data.n_channels
    if mode == SyncMode.CLIP:
        silence_bounds = _scan_silence(samples)
    else:
        silence_bounds = None

    # one spectrogram shared by all keys
    S, have = sync_ops.hop_spectrogram(
        samples, n_channels,
        silence_bounds=silence_bounds if mode == SyncMode.CLIP else None)

    key_results: List[KeyResult] = []
    for key in key_list:
        tables = get_key_tables(key)
        sync_bits = sync_ops.build_sync_bits(tables, mode == SyncMode.CLIP)
        qualities = np.asarray(sync_ops.sync_score_sweep(S, have, sync_bits),
                               dtype=np.float64)
        means = np.asarray(sync_ops.local_mean(qualities), dtype=np.float64)

        # array-stage selection: no per-tau Python objects until only
        # ~n_best candidates remain
        abs_q = np.abs(qualities - means)
        sel = np.nonzero(_select_local_maxima(abs_q))[0]
        indices = sel * Params.sync_search_step
        keep = _mask_avg_false_positives(indices, qualities[sel], means[sel])
        sel = sel[keep]
        order = _threshold_n_best_order(abs_q[sel],
                                        Params.sync_threshold2 * 0.75)
        sel = sel[order]

        if mode == SyncMode.CLIP:
            # already quality-sorted; truncate (src/syncfinder.cc:528-533)
            sel = sel[:max(Params.get_n_best, 5)]

        scores = [
            _SearchScore(index=int(t) * Params.sync_search_step,
                         raw_quality=float(qualities[t]),
                         local_mean=float(means[t]))
            for t in sel
        ]

        # ---- refine: +-256 around each candidate in steps of 8 (grid of
        #      65 fine positions per candidate) in batched device passes ----
        grid_pos, grid_quals = sync_ops.refine_grid(
            samples, n_channels,
            np.asarray([s.index for s in scores], dtype=np.int64),
            sync_bits, silence_bounds)

        refined = []
        for score, positions, quals in zip(scores, grid_pos, grid_quals):
            best_quality = score.raw_quality
            best_index = score.index
            for pos, q in zip(positions, quals):
                if np.isnan(q):
                    continue
                if abs(q - score.local_mean) > abs(best_quality - score.local_mean):
                    best_quality = float(q)
                    best_index = int(pos)
            refined.append(_SearchScore(best_index, best_quality,
                                        score.local_mean))
        refined.sort(key=lambda s: s.index)

        refined = _select_threshold_and_n_best(refined, Params.sync_threshold2)
        refined.sort(key=lambda s: s.index)

        result = KeyResult(key=key)
        for s in refined:
            q = s.raw_quality - s.local_mean
            result.sync_scores.append(Score(
                index=s.index, quality=abs(q),
                block_type=ConvBlockType.a if q > 0 else ConvBlockType.b))
        key_results.append(result)
    return key_results
