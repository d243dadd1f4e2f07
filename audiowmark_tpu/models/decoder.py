"""Watermark decoder: block decoder, clip decoder, soft-bit extraction.

Reference behavior: src/wmget.cc — sync candidates from the sync finder, a
2226-frame FFT range per candidate, mix/linear soft-bit extraction with local
spectral background subtraction (minus the mean of the previous and next
frame's same bins), keyed de-interleaving, Viterbi decoding, A+B joining and
the greedy "all" block-chain merge.

TPU design: per-candidate soft-bit extraction is a batched windowed-FFT +
gather/segment-sum; all candidates' Viterbi decodes run as one batched
lax.scan via vmap.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..codec import ConvBlockType, code_size
from ..codec.dispatch import code_decode_soft_batch
from ..crypto.keys import Key
from ..ops.frames import FRAME, analysis_window
from ..ops.sync import dft_mode
from ..params import Params
from ..tables import KeyTables, get_key_tables, randomize_bit_order
from ..utils.devcache import (device_array, device_audio, memo_derived,
                              register_padded)
from . import syncfinder
from .resultset import PatternType, ResultSet
from .syncfinder import SyncMode


@partial(jax.jit, static_argnames=("count", "use_dft", "mix", "group",
                                   "fpb", "n_ch"))
def _block_raw_batch_dev(x: jnp.ndarray, indices: jnp.ndarray,
                         awin: jnp.ndarray, dftm: jnp.ndarray,
                         lay_frame: jnp.ndarray, lay_up: jnp.ndarray,
                         lay_dn: jnp.ndarray, count: int, use_dft: bool,
                         mix: bool, group: int, fpb: int,
                         n_ch: int) -> jnp.ndarray:
    """Per-candidate raw soft bits, fully on device: block dB spectrogram
    (reference fft_range, src/wmcommon.cc:123-141) -> prev/next background
    subtraction + channel sum -> keyed up/down band gathers -> per-bit sums
    (mix_decode/linear_decode, src/wmget.cc:67-152).

    Only the (K, n_coded) soft-bit matrix leaves the device — the dB tensor
    is K x count x C x 81 floats (tens of MB) and the host link may be
    bandwidth-bound (remote-TPU tunnel: ~14 MB/s down).
    On TPU the 81 bands come from one MXU matmul against the windowed
    band-restricted DFT matrix (~4x faster than a 513-bin rfft).

    x: (n, C); indices: (K,) int32.
    mix mode:    lay_frame/lay_up/lay_dn are (n_data*30,) mix entries.
    linear mode: lay_frame is (n_data_frames,), lay_up/lay_dn are
                 (n_data_frames, 30) band tables.

    x: (n*C,) float32 interleaved FLAT — a materialized (n, 2) array on
    TPU pads the minor dim to 128 lanes (64x memory; long chunks OOM);
    the per-candidate reshape fuses inside the kernel.
    """
    from ..ops.extract import block_raw_one

    def one(i):
        return block_raw_one(x, i, awin, dftm, lay_frame, lay_up, lay_dn,
                             count, use_dft, mix, group, fpb, n_ch)

    return jax.lax.map(one, indices)


def _block_raw_batch(samples: np.ndarray, n_channels: int,
                     indices: List[int], tables: KeyTables) -> dict:
    """Raw (pre-interleave) soft bits for each candidate start index;
    candidates reading past the end are dropped (reference skips them).
    Returns {index: raw (n_coded,)}.  K is bucketed to a power of two so
    XLA compiles once per (frame_count, bucket)."""
    frame_count = tables.frames_per_block
    n_sample_frames = samples.size // n_channels
    valid = [i for i in dict.fromkeys(indices)
             if i + frame_count * FRAME <= n_sample_frames]
    if not valid:
        return {}
    K = 1
    while K < len(valid):
        K *= 2
    idx = np.zeros(K, dtype=np.int32)
    idx[: len(valid)] = valid
    x_dev = device_audio(samples)          # flat; kernel reshapes inside
    from ..ops.sync import _dft_matrix

    def build_layout():
        if Params.mix:
            lay_frame = tables.mix_frame.astype(np.int32)
            lay_up = (tables.mix_up - Params.min_band).astype(np.int32)
            lay_dn = (tables.mix_dn - Params.min_band).astype(np.int32)
            group = Params.bands_per_frame * Params.frames_per_bit
        else:
            f = np.arange(tables.n_data_frames)
            lay_frame = tables.data_frame(f).astype(np.int32)
            lay_up = (tables.data_up - Params.min_band).astype(np.int32)
            lay_dn = (tables.data_dn - Params.min_band).astype(np.int32)
            group = 0
        return (jnp.asarray(lay_frame), jnp.asarray(lay_up),
                jnp.asarray(lay_dn), group)

    # one build + upload per key tables (each decode call would otherwise
    # re-derive and re-transfer ~600 KB of gather tables)
    lay_frame, lay_up, lay_dn, group = memo_derived(
        tables, ("decode_layout", bool(Params.mix), Params.min_band,
                 Params.bands_per_frame, Params.frames_per_bit),
        build_layout)
    from ..utils import prof
    with prof.phase("get.block_raw"):
        raws = np.asarray(_block_raw_batch_dev(
            x_dev, jnp.asarray(idx), device_array(analysis_window()),
            device_array(_dft_matrix()), lay_frame, lay_up, lay_dn,
            frame_count, dft_mode(), bool(Params.mix), group,
            Params.frames_per_bit, n_channels))
    return {i: raws[k].astype(np.float32) for k, i in enumerate(valid)}


def _raw_map_from_scores(samples: np.ndarray, n_channels: int, scores,
                         tables: KeyTables, clip: bool):
    """{index: raw} from the raws the fused search already extracted
    in-kernel at the refined positions (Score.raw/raw2), applying the same
    reads-past-the-end drop rule as _block_raw_batch; None when any score
    lacks them (staged/tiled search) — the caller batches its own
    extraction."""
    need2 = clip
    if not scores or any(ss.raw is None or (need2 and ss.raw2 is None)
                         for ss in scores):
        return None
    nsf = samples.size // n_channels
    cnt = tables.frames_per_block * FRAME
    raw_map = {}
    for ss in scores:
        if ss.index + cnt <= nsf:
            raw_map[ss.index] = ss.raw
        if clip and ss.index + 2 * cnt <= nsf:
            raw_map[ss.index + cnt] = ss.raw2
    return raw_map


def _background_subtract(db: np.ndarray) -> np.ndarray:
    """A[f] = db[f] - 0.5*(db[prev] + db[next]) with edge reflection
    (reference prev/next index clamping, src/wmget.cc:86-97)."""
    T = db.shape[0]
    nxt = np.arange(1, T + 1)
    nxt[-1] = T - 2 if T >= 2 else 0
    prv = np.arange(-1, T - 1)
    prv[0] = 1 if T >= 2 else 0
    return db - 0.5 * (db[prv] + db[nxt])


def mix_or_linear_decode(tables: KeyTables, db: np.ndarray) -> np.ndarray:
    """Soft bits from a block dB spectrogram (frames, C, bands).

    Host oracle for _block_raw_batch_dev (tests/test_dft_paths.py locks the
    equivalence); the production path extracts soft bits on device."""
    A = _background_subtract(db).sum(axis=1)      # sum over channels
    bpf = Params.bands_per_frame
    if Params.mix:
        u = A[tables.mix_frame, tables.mix_up - Params.min_band]
        d = A[tables.mix_frame, tables.mix_dn - Params.min_band]
        per_entry = u - d                          # (n_data*30,)
        group = bpf * Params.frames_per_bit
        raw = per_entry.reshape(-1, group).sum(axis=1)
    else:
        f = np.arange(tables.n_data_frames)
        frames = tables.data_frame(f)
        u = A[frames[:, None], tables.data_up - Params.min_band].sum(axis=1)
        d = A[frames[:, None], tables.data_dn - Params.min_band].sum(axis=1)
        raw = (u - d).reshape(-1, Params.frames_per_bit).sum(axis=1)
    return raw.astype(np.float32)


def normalize_soft_bits(soft_bits: np.ndarray) -> np.ndarray:
    """Rescale [-mean,+mean] -> [0,1] (src/wmget.cc:40-65)."""
    if Params.hard:
        return (soft_bits > 0).astype(np.float32)
    mean = float(np.mean(np.abs(soft_bits)))
    with np.errstate(invalid="ignore", divide="ignore"):
        # mean == 0 on degenerate (all-zero) input gives nan soft bits,
        # matching the reference's unchecked C++ float division
        return (0.5 * (soft_bits / mean + 1)).astype(np.float32)


# ---- block decoder -----------------------------------------------------------

class _DecodeJobs:
    """Queue of soft-bit Viterbi decodes (the reference runs these on its
    thread pool).  All block types flush in ONE batched trellis launch —
    a/b/ab groups have equal step counts, so their branch metrics concat
    into a single grid (convcode.conv_decode_soft_mixed).  Short payloads
    keep the per-type path (the exhaustive codeword match differs)."""

    def __init__(self):
        self.jobs = []

    def add(self, block_type: ConvBlockType, soft_bits: np.ndarray, emit):
        self.jobs.append((block_type, soft_bits, emit))

    def flush(self):
        if not self.jobs:
            return
        from ..utils import prof
        with prof.phase("get.viterbi"):
            self._flush_inner()

    def _flush_inner(self):
        if Params.payload_short:
            for bt in (ConvBlockType.a, ConvBlockType.b, ConvBlockType.ab):
                group = [(soft, emit) for t, soft, emit in self.jobs
                         if t == bt]
                if not group:
                    continue
                batch = np.stack([soft for soft, _ in group])
                for (bits, err), (_, emit) in zip(
                        code_decode_soft_batch(bt, batch), group):
                    if len(bits):
                        emit(bits, err)
            self.jobs = []
            return

        from ..codec.convcode import conv_decode_soft_mixed
        groups = []
        emits = []
        for bt in (ConvBlockType.a, ConvBlockType.b, ConvBlockType.ab):
            group = [(soft, emit) for t, soft, emit in self.jobs if t == bt]
            if not group:
                continue
            batch = np.stack([soft for soft, _ in group])
            # pad each group to a multiple of 4 rows: bounds the number of
            # compiled (B_a, B_b, B_ab) shape combinations
            pad = -len(group) % 4
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, batch.shape[1]), np.float32)])
            groups.append((bt, batch))
            emits.append([emit for _, emit in group])
        for (bits, errs), group_emits in zip(conv_decode_soft_mixed(groups),
                                             emits):
            for i, emit in enumerate(group_emits):
                if bits.shape[1]:
                    emit(bits[i], float(errs[i]))
        self.jobs = []


@dataclass
class _PatternRawBits:
    index: int
    quality: float
    raw_bit_vec: np.ndarray
    block_type: ConvBlockType


class BlockDecoder:
    def __init__(self, speed: float):
        self.speed = speed
        self.debug_sync_frame_count = 0
        self.key_results: List[syncfinder.KeyResult] = []

    def run(self, key_list: List[Key], wav_data, result_set: ResultSet,
            sync_results: List[syncfinder.KeyResult] = None, jobs=None):
        """sync_results: precomputed BLOCK KeyResults (the multi-chip chunk
        group path searches many chunks in one sharded dispatch and hands
        each chunk's results in here); None -> search now.
        jobs: a shared _DecodeJobs queue — the caller flushes (one batched
        Viterbi launch covers this decoder AND the clip decoder); None ->
        private queue, flushed here."""
        self.key_results = (sync_results if sync_results is not None
                            else syncfinder.search(key_list, wav_data,
                                                   SyncMode.BLOCK))
        n_channels = wav_data.n_channels
        samples = wav_data.samples

        shared_jobs = jobs is not None
        if not shared_jobs:
            jobs = _DecodeJobs()
        for key_result in self.key_results:
            key = key_result.key
            tables = get_key_tables(key)
            count = tables.frames_per_block
            pattern_raw: List[_PatternRawBits] = []

            raw_map = _raw_map_from_scores(
                samples, n_channels, key_result.sync_scores, tables,
                clip=False)
            if raw_map is None:
                raw_map = _block_raw_batch(
                    samples, n_channels,
                    [ss.index for ss in key_result.sync_scores], tables)
            for sync_score in key_result.sync_scores:
                raw_bits = raw_map.get(sync_score.index)
                if raw_bits is None:
                    continue
                raw_bits = randomize_bit_order(tables, raw_bits, encode=False)
                pattern_raw.append(_PatternRawBits(
                    sync_score.index, sync_score.quality, raw_bits,
                    sync_score.block_type))

                time = sync_score.index / wav_data.sample_rate

                def emit(bits, err, key=key, time=time, ss=sync_score):
                    result_set.add_pattern(
                        key, time, ss.quality, ss.block_type, bits, err,
                        PatternType.BLOCK, self.speed)

                jobs.add(sync_score.block_type,
                         normalize_soft_bits(raw_bits), emit)

            self._join_ab(key, tables, pattern_raw, wav_data, result_set,
                          jobs)
            self._all_chain(key, tables, pattern_raw, result_set, jobs)
        if not shared_jobs:
            jobs.flush()

        self.debug_sync_frame_count = (
            wav_data.n_values // wav_data.n_channels // FRAME)

    def _join_ab(self, key, tables, pattern_raw, wav_data, result_set, jobs):
        """A block followed by B block at the right distance -> AB decode."""
        count = tables.frames_per_block
        for i, pat_b in enumerate(pattern_raw):
            if pat_b.block_type != ConvBlockType.b:
                continue
            best_j = -1
            best_abs_dist = Params.frame_size // 2
            for j in range(i):
                if pattern_raw[j].block_type == ConvBlockType.a:
                    abs_dist = abs((pat_b.index - pattern_raw[j].index)
                                   - count * Params.frame_size)
                    if abs_dist < best_abs_dist:
                        best_j = j
                        best_abs_dist = abs_dist
            if best_j >= 0:
                a_pat = pattern_raw[best_j]
                ab_bits = np.empty(a_pat.raw_bit_vec.size * 2, np.float32)
                ab_bits[0::2] = a_pat.raw_bit_vec
                ab_bits[1::2] = pat_b.raw_bit_vec
                time = pat_b.index / wav_data.sample_rate
                quality = (a_pat.quality + pat_b.quality) / 2

                def emit(bits, err, key=key, time=time, quality=quality):
                    result_set.add_pattern(
                        key, time, quality, ConvBlockType.ab, bits, err,
                        PatternType.BLOCK, self.speed)

                jobs.add(ConvBlockType.ab, normalize_soft_bits(ab_bits),
                         emit)

    def _all_chain(self, key, tables, pattern_raw, result_set, jobs):
        """Greedy chain of blocks at expected spacing with A/B alternation;
        average soft bits over the best chain (src/wmget.cc:606-701)."""
        if not pattern_raw:
            return
        count = tables.frames_per_block
        best_all_blocks: List[int] = []

        def sync_sum(blocks):
            return sum(pattern_raw[b].quality for b in blocks)

        for i in range(len(pattern_raw)):
            max_block_idx = int(round(
                pattern_raw[-1].index / float(count * Params.frame_size) + 0.5))
            all_blocks = [i]
            block_idx = 1
            while block_idx <= max_block_idx:
                expect_start = pattern_raw[all_blocks[-1]].index \
                    + block_idx * count * Params.frame_size
                best_j = -1
                best_abs_dist = block_idx * Params.frame_size // 2
                expect_bt = pattern_raw[all_blocks[-1]].block_type
                if block_idx & 1:
                    expect_bt = (ConvBlockType.b
                                 if expect_bt == ConvBlockType.a
                                 else ConvBlockType.a)
                for j in range(all_blocks[-1], len(pattern_raw)):
                    abs_dist = abs(expect_start - pattern_raw[j].index)
                    if abs_dist < best_abs_dist:
                        if pattern_raw[j].block_type == expect_bt:
                            best_j = j
                            best_abs_dist = abs_dist
                if best_j >= 0:
                    all_blocks.append(best_j)
                    block_idx = 1
                else:
                    block_idx += 1
            if sync_sum(all_blocks) > sync_sum(best_all_blocks):
                best_all_blocks = all_blocks

        if len(best_all_blocks) > 1:
            n_ab = code_size(ConvBlockType.ab, Params.payload_size)
            raw_all = np.zeros(n_ab, dtype=np.float64)
            norm = [0, 0]
            quality = 0.0
            for bi in best_all_blocks:
                pat = pattern_raw[bi]
                quality += pat.quality
                ab = 1 if pat.block_type == ConvBlockType.b else 0
                raw_all[ab::2] += pat.raw_bit_vec
                norm[ab] += 1
            raw_all[0::2] /= max(norm[0], 1)
            raw_all[1::2] /= max(norm[1], 1)
            quality /= (norm[0] + norm[1])
            soft = normalize_soft_bits(raw_all.astype(np.float32))

            def emit(bits, err, key=key, quality=quality):
                result_set.add_pattern(
                    key, 0.0, quality, ConvBlockType.ab, bits, err,
                    PatternType.ALL, self.speed)

            jobs.add(ConvBlockType.ab, soft, emit)

    def debug_sync(self) -> str:
        """sync_match debug line (exactly one key; src/wmget.cc:707-734)."""
        if len(self.key_results) != 1:
            return ""
        tables = get_key_tables(self.key_results[0].key)
        sync_scores = self.key_results[0].sync_scores
        expect0 = Params.frames_pad_start * Params.frame_size
        expect_step = tables.frames_per_block * Params.frame_size
        expect_end = self.debug_sync_frame_count * Params.frame_size

        sync_match = 0
        expect_index = expect0
        while expect_index + expect_step < expect_end:
            for ss in sync_scores:
                if abs(ss.index + Params.test_cut - expect_index) \
                        < Params.frame_size // 2:
                    sync_match += 1
                    break
            expect_index += expect_step
        return "sync_match %d %d\n" % (sync_match, len(sync_scores))


# ---- clip decoder ------------------------------------------------------------

class ClipDecoder:
    def __init__(self, speed: float):
        self.speed = speed

    def _run_padded(self, key_list, wav_data, result_set, time_offset_sec,
                    sync_results=None, jobs=None):
        """sync_results: precomputed CLIP KeyResults (the start/end windows
        are searched together in one vmapped dispatch); None -> search.
        jobs: shared _DecodeJobs, flushed by the caller; None -> private."""
        key_results = (sync_results if sync_results is not None
                       else syncfinder.search(key_list, wav_data,
                                              SyncMode.CLIP))
        n_channels = wav_data.n_channels
        samples = wav_data.samples
        shared_jobs = jobs is not None
        if not shared_jobs:
            jobs = _DecodeJobs()
        for key_result in key_results:
            key = key_result.key
            tables = get_key_tables(key)
            count = tables.frames_per_block
            raw_map = _raw_map_from_scores(
                samples, n_channels, key_result.sync_scores, tables,
                clip=True)
            if raw_map is None:
                raw_map = _block_raw_batch(
                    samples, n_channels,
                    [i for ss in key_result.sync_scores
                     for i in (ss.index, ss.index + count * FRAME)], tables)
            for sync_score in key_result.sync_scores:
                index = sync_score.index
                r1 = raw_map.get(index)
                r2 = raw_map.get(index + count * FRAME)
                if r1 is None or r2 is None:
                    continue
                raw1 = randomize_bit_order(tables, r1, encode=False)
                raw2 = randomize_bit_order(tables, r2, encode=False)
                raw = np.empty(raw1.size * 2, dtype=np.float32)
                if sync_score.block_type == ConvBlockType.a:
                    raw[0::2], raw[1::2] = raw1, raw2
                else:
                    raw[0::2], raw[1::2] = raw2, raw1
                def emit(bits, err, key=key, ss=sync_score):
                    result_set.add_pattern(
                        key, time_offset_sec, ss.quality, ss.block_type,
                        bits, err, PatternType.CLIP, self.speed)

                jobs.add(ConvBlockType.ab, normalize_soft_bits(raw), emit)
        if not shared_jobs:
            jobs.flush()

    def _build_window(self, key_list, wav_data, pos: str):
        """Zero-padded ~2-block window at the stream start or end
        (src/wmget.cc clip handling); (wav, time_offset) or None."""
        tables = get_key_tables(key_list[0])
        frames_per_block = tables.frames_per_block
        n = (frames_per_block + 5) * FRAME * wav_data.n_channels
        pad_start = n
        pad_end = n
        if pos == "start":
            first_sample = 0
            last_sample = min(n, wav_data.n_values)
            if last_sample < n:
                pad_start += n - last_sample
        else:
            if wav_data.n_values <= n:
                return None
            first_sample = wav_data.n_values - n
            last_sample = wav_data.n_values
        time_offset = first_sample / wav_data.sample_rate / wav_data.n_channels
        ext = np.concatenate([
            np.zeros(pad_start, dtype=np.float32),
            wav_data.samples[first_sample:last_sample],
            np.zeros(pad_end, dtype=np.float32)])
        # the device copy is assembled from the chunk's cached upload —
        # these ~2-block windows would otherwise re-cross the host link
        register_padded(ext, wav_data.samples, first_sample, last_sample,
                        pad_start, pad_end)
        return wav_data.with_samples(ext), time_offset

    def launch(self, key_list, wav_data):
        """Dispatch half: build the padded windows and ENQUEUE the vmapped
        pair search without fetching; returns finish(result_set, jobs) or
        None when the stream is too long for clip decoding.  The CLI calls
        launch() before the block search's blocking fetch, so the clip
        windows score while the block results are in flight."""
        tables = get_key_tables(key_list[0])
        wav_frames = wav_data.n_values // (FRAME * wav_data.n_channels)
        if wav_frames >= tables.frames_per_block * 3.1:
            return None
        windows = [w for w in
                   (self._build_window(key_list, wav_data, pos)
                    for pos in ("start", "end")) if w is not None]
        # both windows in ONE vmapped search dispatch; None -> per-window
        pair_fin = (syncfinder.search_clip_pair_launch(
                        key_list, [w for w, _ in windows])
                    if len(windows) == 2 else None)

        def finish(result_set: ResultSet, jobs):
            pre = pair_fin() if pair_fin is not None else None
            for i, (l_wav, time_offset) in enumerate(windows):
                self._run_padded(key_list, l_wav, result_set, time_offset,
                                 sync_results=pre[i] if pre is not None
                                 else None, jobs=jobs)

        return finish

    def run(self, key_list, wav_data, result_set: ResultSet, jobs=None):
        fin = self.launch(key_list, wav_data)
        if fin is None:
            return
        shared_jobs = jobs is not None
        if not shared_jobs:
            jobs = _DecodeJobs()
        fin(result_set, jobs)
        if not shared_jobs:
            jobs.flush()
