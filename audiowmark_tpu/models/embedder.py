"""Watermark embedder: streaming add pipeline.

Reference behavior: src/wmadd.cc — per-1024-frame loop of
FFT -> apply_frame_mod -> iFFT/OLA -> mix -> limiter, with A/B block
alternation starting at frame 2*frames_per_block - 250 (partial B-block pad),
optional resampling to/from 44.1 kHz, a zero-frames skip path for HLS, and
informational output (Message/Strength/Time/Rate/Channels/Data Blocks/SNR).

TPU design: the per-frame loop becomes tiles of thousands of frames pushed
through ONE fused jit (window -> rfft -> magnitude-exponent delta -> irfft ->
overlap-add); per-tile carry state (2 ifft frames, limiter block state,
resampler tails) keeps it a true streaming pipeline for wav-pipe/stdin use
while each dispatch is large enough to saturate the chip.
"""

from __future__ import annotations

import numpy as np

from ..crypto.keys import Key
from ..io.streams import (AudioInputStream, AudioOutputStream,
                          create_input_stream, create_output_stream,
                          StreamError)
from ..ops.frames import FRAME, embed_delta_frames
from ..ops.limiter import StreamingLimiter
from ..ops.resample import StreamingResampler
from ..params import Encoding, Format, Params, RawFormat
from ..tables import get_key_tables
from ..utils.hexbits import bit_vec_to_str
from ..utils.log import error, info, warning
from .common import build_ab_frame_mods, parse_payload

# frames per device dispatch: ~2.4 s of audio per tile keeps streaming latency
# low while dispatches stay large; raise for pure-throughput batch use
DEFAULT_TILE_FRAMES = 512


class StreamingEmbedder:
    """Generates the watermark *delta* signal for an input stream, tile by
    tile (the reference's WatermarkGen + WatermarkSynth + WatermarkResampler
    rolled into one stateful pipeline)."""

    def __init__(self, key: Key, n_channels: int, input_rate: int,
                 bitvec: np.ndarray, tile_frames: int = DEFAULT_TILE_FRAMES):
        self.n_channels = n_channels
        self.tile_frames = tile_frames
        tables = get_key_tables(key)
        self.frames_per_block = tables.frames_per_block
        self.mods_ab = build_ab_frame_mods(tables, bitvec)   # (2*fpb, N_BINS)
        # start with a partial B-block as padding (src/wmadd.cc:293-296)
        self.frame_number = 2 * self.frames_per_block - Params.frames_pad_start
        self.m_data_blocks = 0
        self.water_delta = Params.water_delta
        # generator-frame budget for data-block counting, set at EOF from
        # the reference-loop simulation (_ref_generator_frame_cap): the
        # batched tile drain feeds zero pads past where the reference's
        # one-frame loop stops, and boundaries in that region must not
        # count.  None = unlimited (pre-EOF, or HLS zero_frames mode).
        self.count_cap = None
        self._fed = 0

        self.prev1 = None
        self.prev2 = None
        self.first_frame = True
        self._in_remainder = np.zeros(0, dtype=np.float32)

        self.need_resampler = input_rate != Params.mark_sample_rate
        if self.need_resampler:
            self.in_resampler = StreamingResampler(
                n_channels, input_rate, Params.mark_sample_rate)
            self.out_resampler = StreamingResampler(
                n_channels, Params.mark_sample_rate, input_rate)

    def _gen_frames(self, samples44: np.ndarray) -> np.ndarray:
        """Watermark-rate samples (whole frames) -> delta samples."""
        n_frames = samples44.size // (FRAME * self.n_channels)
        assert n_frames * FRAME * self.n_channels == samples44.size
        if n_frames == 0:
            return np.zeros(0, dtype=np.float32)
        frames = samples44.reshape(n_frames, FRAME, self.n_channels)
        frames = np.ascontiguousarray(frames.transpose(0, 2, 1))
        phases = (self.frame_number + np.arange(n_frames)) \
            % (2 * self.frames_per_block)
        mods = self.mods_ab[phases]
        out, self.prev1, self.prev2 = embed_delta_frames(
            frames, mods, self.water_delta, self.prev1, self.prev2)
        t = np.arange(n_frames)
        hit = (self.frame_number + t + 1) % self.frames_per_block == 0
        if self.count_cap is not None:
            hit &= (self._fed + t) < self.count_cap
        self.m_data_blocks += int(np.sum(hit))
        self._fed += n_frames
        self.frame_number += n_frames
        out = np.asarray(out).transpose(0, 2, 1).reshape(-1)
        if self.first_frame:
            self.first_frame = False
            out = out[FRAME * self.n_channels:]  # one-frame synth latency
        return out

    def run(self, samples: np.ndarray) -> np.ndarray:
        """Feed input-rate samples; returns available delta samples
        (input rate)."""
        if not self.need_resampler:
            self._in_remainder = np.concatenate([self._in_remainder, samples])
            vpf = FRAME * self.n_channels
            n_whole = self._in_remainder.size // vpf * vpf
            ready = self._in_remainder[:n_whole]
            self._in_remainder = self._in_remainder[n_whole:]
            return self._gen_frames(ready)

        self.in_resampler.write_frames(samples)
        vpf_frames = self.in_resampler.can_read_frames() // FRAME * FRAME
        if vpf_frames:
            r_samples = self.in_resampler.read_frames(vpf_frames)
            wm = self._gen_frames(r_samples)
            self.out_resampler.write_frames(wm)
        to_read = self.out_resampler.can_read_frames()
        return self.out_resampler.read_frames(to_read)

    def skip(self, zero_frames: int) -> int:
        """Skip a whole-frame zero lead-in, preserving PRNG frame phase
        (reference: src/wmadd.cc:251-263,318-325,408-425)."""
        assert zero_frames % FRAME == 0
        if not self.need_resampler:
            self.frame_number += zero_frames // FRAME
            if self.first_frame and zero_frames > 0:
                self.first_frame = False
                return zero_frames - FRAME
            return zero_frames
        out = self.in_resampler.skip(zero_frames)
        assert out % FRAME == 0
        self.frame_number += out // FRAME
        if self.first_frame and out > 0:
            self.first_frame = False
            out -= FRAME
        return self.out_resampler.skip(out)

    def data_blocks(self) -> int:
        return max(self.m_data_blocks - 1, 0)


def _ref_gen_frame_count(n_in_frames: int, no_limiter: bool,
                         block_size: int) -> int:
    """Frames the reference feeds WatermarkGen before its write loop breaks
    (src/wmadd.cc:520-588: 1024-frame reads, zero-pad until output catches
    up through the 1-frame synth latency and the limiter's 1-block hold).
    Data-block counting stops exactly here."""
    total_in = 0
    total_out = 0
    k = 0
    while True:
        got = min(FRAME, n_in_frames - total_in)
        total_in += got
        if got < FRAME and total_in == total_out:
            break
        k += 1
        synth_frames = max(k - 1, 0)
        if no_limiter:
            emitted = synth_frames * FRAME
        else:
            blocks = (synth_frames * FRAME) // block_size
            emitted = max(blocks - 1, 0) * block_size
        total_out = min(emitted, total_in)
    return k


def _ref_generator_frame_cap(n_in_frames: int, in_rate: int,
                             no_limiter: bool, block_size: int) -> int:
    """Generator (44.1 kHz) frames the reference's add loop feeds before
    it breaks, for ANY input rate: simulates the 1024-frame read loop
    (src/wmadd.cc:520-588) through the resampler pair's exact integer
    emission law (ops/resample.py StreamingResampler._produce, the zita
    protocol), the 1-frame synth latency and the limiter's 1-block hold.
    Data-block boundaries past this budget are never printed by the
    reference, however much zero padding the tile drain feeds."""
    mark = Params.mark_sample_rate
    if in_rate == mark:
        return _ref_gen_frame_count(n_in_frames, no_limiter, block_size)
    from ..ops.resample import _filter_params
    _, _, half_in, _ = _filter_params(mark / in_rate)
    _, _, half_out, _ = _filter_params(in_rate / mark)

    def res_out(in_total: int, half_taps: int, out_rate: int,
                in_r: int) -> int:
        avail = (in_total - half_taps) * out_rate
        return (avail - 1) // in_r + 1 if avail > 0 else 0

    total_in = 0
    total_out = 0
    it = 0
    gen = 0
    limit = n_in_frames // FRAME + 4096          # safety bound
    while it < limit:
        got = min(FRAME, n_in_frames - total_in)
        total_in += got
        if got < FRAME and total_in == total_out:
            break
        it += 1
        out44 = res_out(it * FRAME, half_in, mark, in_rate)
        gen = (out44 // FRAME) * FRAME           # whole generator frames
        synth = max(gen - FRAME, 0)              # one-frame synth latency
        back = res_out(synth, half_out, in_rate, mark)
        if no_limiter:
            emitted = back
        else:
            emitted = max(back // block_size - 1, 0) * block_size
        total_out = min(emitted, total_in)
    return gen // FRAME


# files longer than this fall back to the streaming tile path (the fused
# whole-file dispatch materializes the full spectrogram on device)
_FAST_PATH_MAX_FRAMES = 32768          # ~12.7 min at 44.1 kHz


def _add_file_fast(embedder: StreamingEmbedder,
                   in_stream: AudioInputStream,
                   out_stream: AudioOutputStream, n_channels: int):
    """Whole-file add in one device dispatch with int16 transfers where the
    sample grid allows (see ops/frames._add_file_core).  Returns the number
    of frames written."""
    from ..ops.frames import _add_file_core, analysis_window, \
        synthesis_window
    import jax
    import jax.numpy as jnp

    from ..io.ffshim import drain_stream
    from ..utils import prof
    with prof.phase("add.read"):
        samples = drain_stream(in_stream)
    n_frames_in = samples.size // n_channels
    n_out = n_frames_in * n_channels

    with prof.phase("add.hostprep"):
        G = max(-(-n_frames_in // FRAME), 1)
        # int16 upload when every sample sits exactly on the 16-bit grid
        # (16-bit PCM / FLAC / 8-bit sources); halves host->device bytes.
        # The grid check runs on the unpadded buffer so the zero-pad copy
        # happens in int16 (half the host memory traffic) when it passes.
        from ..utils.devcache import i16_grid
        i16 = i16_grid(samples)
        in_i16 = i16 is not None
        x = np.zeros(G * FRAME * n_channels,
                     dtype=np.int16 if in_i16 else np.float32)
        x[:samples.size] = i16 if in_i16 else samples

    writer = getattr(out_stream, "writer", None)
    out_i16 = bool(writer is not None and writer.bit_depth == 16
                   and writer.encoding == Encoding.SIGNED)

    phases = (embedder.frame_number + np.arange(G)) \
        % (2 * embedder.frames_per_block)
    mods = embedder.mods_ab[phases]

    block_size = Params.mark_sample_rate \
        * int(Params.limiter_block_size_ms) // 1000
    with prof.phase("add.device.upload"):
        xd = jnp.asarray(x)
        md = jnp.asarray(mods)
        if prof.enabled:            # sync so the phase shows transfer time
            float(xd[0])
    with prof.phase("add.device.compute"):
        out_dev = _add_file_core(
            xd, md,
            jnp.float32(embedder.water_delta),
            jnp.asarray(analysis_window()), jnp.asarray(synthesis_window()),
            jnp.float32(Params.limiter_ceiling),
            G, n_channels, n_out, bool(Params.test_no_limiter), in_i16,
            out_i16, block_size)
        if prof.enabled:
            float(out_dev[0])
    # out_i16: the device already applied the writer's trunc-clip
    # quantization; the int16 buffer goes to the writer as-is (bit-identical
    # to the f32 round trip, without 3 full-array conversions)

    # fetch/write overlap: slice the output on device, start EVERY slice's
    # host copy (copy_to_host_async), then write slice i while slice i+1
    # is still in flight — the host file write rides under the transfer
    # instead of after it (the tunnel link is half-duplex, so only
    # host-side work can hide; tools/duplex_probe.py)
    vals_per_frame = FRAME * n_channels
    n_pieces = min(4, max(n_out // (4 * 1024 * 1024 // 4), 1))
    bounds = [(n_out * p // n_pieces) // vals_per_frame * vals_per_frame
              for p in range(n_pieces)] + [n_out]
    pieces = [jax.lax.slice_in_dim(out_dev, a, b)
              for a, b in zip(bounds, bounds[1:]) if b > a]
    for p in pieces:
        p.copy_to_host_async()

    # reference data-block count: boundaries within the frames the 1-frame
    # reference loop would feed, NOT within our padded dispatch
    k_total = _ref_gen_frame_count(n_frames_in, bool(Params.test_no_limiter),
                                   block_size)
    t = np.arange(k_total)
    embedder.m_data_blocks += int(np.sum(
        (embedder.frame_number + t + 1) % embedder.frames_per_block == 0))
    embedder.frame_number += G

    for p in pieces:
        with prof.phase("add.device.fetch"):
            arr = np.asarray(p)
        with prof.phase("add.write"):
            out_stream.write_frames(arr)
    return n_frames_in


def _info_format(label: str, fmt: RawFormat):
    enc = {Encoding.SIGNED: "signed", Encoding.UNSIGNED: "unsigned",
           Encoding.FLOAT: "float"}[fmt.encoding()]
    endian = "little" if fmt.endian() == RawFormat.Endian.LITTLE else "big"
    info("%-13s %d Hz, %d Channels, %d Bit (%s %s-endian)\n"
         % (label + ":", fmt.sample_rate(), fmt.n_channels(),
            fmt.bit_depth(), enc, endian))


def add_stream_watermark(key: Key, in_stream: AudioInputStream,
                         out_stream: AudioOutputStream, bits: str,
                         zero_frames: int = 0) -> int:
    bitvec = parse_payload(bits)
    if bitvec is None:
        return 1

    if in_stream.sample_rate() != out_stream.sample_rate():
        error("audiowmark: input sample rate (%d) and output sample rate "
              "(%d) don't match\n"
              % (in_stream.sample_rate(), out_stream.sample_rate()))
        return 1
    if in_stream.n_channels() != out_stream.n_channels():
        error("audiowmark: input channels (%d) and output channels (%d) "
              "don't match\n"
              % (in_stream.n_channels(), out_stream.n_channels()))
        return 1

    info("Message:      %s\n" % bit_vec_to_str(bitvec))
    info("Strength:     %.6g\n\n" % (Params.water_delta * 1000))
    if in_stream.n_frames() is None:
        info("Time:         unknown\n")
    else:
        secs = in_stream.n_frames() // in_stream.sample_rate()
        info("Time:         %d:%02d\n" % (secs // 60, secs % 60))
    info("Sample Rate:  %d\n" % in_stream.sample_rate())
    info("Channels:     %d\n" % in_stream.n_channels())

    n_channels = in_stream.n_channels()
    from ..utils import prof as _prof
    with _prof.phase("add.init"):
        embedder = StreamingEmbedder(key, n_channels,
                                     in_stream.sample_rate(), bitvec)
        limiter = StreamingLimiter(n_channels, in_stream.sample_rate(),
                                   Params.limiter_block_size_ms,
                                   Params.limiter_ceiling)

    snr_delta_power = 0.0
    snr_signal_power = 0.0

    orig_fifo = np.zeros(0, dtype=np.float32)
    total_input_frames = 0
    total_output_frames = 0
    zero_frames_in = zero_frames
    zero_frames_out = zero_frames

    if zero_frames_in >= FRAME:
        skip_frames = zero_frames_in - zero_frames_in % FRAME
        total_input_frames += skip_frames
        out = embedder.skip(skip_frames)
        orig_fifo = np.zeros((skip_frames - out) * n_channels,
                             dtype=np.float32)
        out = limiter.skip(out)
        assert out < zero_frames_out
        zero_frames_out -= out
        total_output_frames += out
        zero_frames_in -= skip_frames

    # whole-file fast path: ONE fused device dispatch (embed+mix+limiter+
    # quantize) with int16 transfers where exact — the remote-TPU tunnel is
    # bandwidth-bound (~30/14 MB/s), so bytes moved dominate add wall time
    if (zero_frames == 0 and in_stream.n_frames() is not None
            and in_stream.sample_rate() == Params.mark_sample_rate
            and not Params.snr
            and in_stream.n_frames() <= _FAST_PATH_MAX_FRAMES * FRAME):
        total_output_frames = _add_file_fast(embedder, in_stream, out_stream,
                                             n_channels)
        info("Data Blocks:  %d\n" % embedder.data_blocks())
        expect_frames = in_stream.n_frames()
        if total_output_frames != expect_frames:
            msg = ("unexpected EOF; input frames (%d) != output frames (%d)"
                   % (expect_frames, total_output_frames))
            if Params.strict:
                error("audiowmark: error: %s\n" % msg)
                return 1
            warning("audiowmark: warning: %s\n" % msg)
        from ..utils import prof as _prof
        with _prof.phase("add.close"):
            out_stream.close()
        return 0

    # ramp the tile size up: small first tiles give low time-to-first-byte
    # for streaming use (the reference's 1-frame pipeline), large steady-state
    # tiles keep device dispatches big.  Known-length file inputs skip the
    # ramp entirely — every device round trip costs ~32 ms through a remote
    # TPU tunnel, so fewer, bigger tiles win when TTFB doesn't matter.
    if in_stream.n_frames() is None:
        tile_frames = 16
    else:
        embedder.tile_frames = 4096
        tile_frames = embedder.tile_frames
    eof = False
    while True:
        tile = tile_frames * FRAME
        tile_frames = min(tile_frames * 2, embedder.tile_frames)
        if zero_frames_in > 0:
            samples = in_stream.read_frames(tile - zero_frames_in)
            samples = np.concatenate([
                np.zeros(zero_frames_in * n_channels, dtype=np.float32),
                samples])
            zero_frames_in = 0
        else:
            samples = in_stream.read_frames(tile)
        got_frames = samples.size // n_channels
        total_input_frames += got_frames

        if got_frames < tile:
            eof = True
            if total_input_frames == total_output_frames:
                break
            # batched drain: zero-pad to the tile so the synth/limiter
            # tails flush in a couple of device dispatches (the extra pads
            # produce exactly-zero delta and the output is trimmed to the
            # input length, so the audio is unaffected); the data-block
            # count is bounded by the reference-loop simulation so the
            # over-feed never overcounts (src/wmadd.cc:520-546 feeds pads
            # one frame at a time only until output catches up)
            if embedder.count_cap is None and zero_frames == 0:
                embedder.count_cap = _ref_generator_frame_cap(
                    total_input_frames, in_stream.sample_rate(),
                    bool(Params.test_no_limiter),
                    in_stream.sample_rate()
                    * int(Params.limiter_block_size_ms) // 1000)
            pad_frames = tile - got_frames
            samples = np.concatenate([
                samples, np.zeros(pad_frames * n_channels, dtype=np.float32)])

        orig_fifo = np.concatenate([orig_fifo, samples])
        delta = embedder.run(samples)
        n = delta.size
        orig_samples, orig_fifo = orig_fifo[:n], orig_fifo[n:]

        if Params.snr:
            snr_delta_power += float(np.sum(np.square(delta.astype(np.float64))))
            snr_signal_power += float(np.sum(np.square(orig_samples.astype(np.float64))))

        mixed = delta + orig_samples
        if not Params.test_no_limiter:
            mixed = limiter.process(mixed)

        max_write = total_input_frames - total_output_frames
        if mixed.size > max_write * n_channels:
            mixed = mixed[: max_write * n_channels]

        cut_frames = min(mixed.size // n_channels, zero_frames_out)
        if cut_frames > 0:
            mixed = mixed[cut_frames * n_channels:]
            total_output_frames += cut_frames
            zero_frames_out -= cut_frames

        out_stream.write_frames(mixed)
        total_output_frames += mixed.size // n_channels
        if eof and total_input_frames == total_output_frames:
            break

    if Params.snr:
        info("SNR:          %f dB\n"
             % (10 * np.log10(snr_signal_power / snr_delta_power)))
    info("Data Blocks:  %d\n" % embedder.data_blocks())

    if in_stream.n_frames() is not None:
        expect_frames = in_stream.n_frames() + zero_frames
        if total_output_frames != expect_frames:
            msg = ("unexpected EOF; input frames (%d) != output frames (%d)"
                   % (expect_frames, total_output_frames))
            if Params.strict:
                error("audiowmark: error: %s\n" % msg)
                return 1
            warning("audiowmark: warning: %s\n" % msg)

    out_stream.close()
    return 0


def add_watermark(key: Key, infile: str, outfile: str, bits: str) -> int:
    from ..utils import prof
    try:
        with prof.phase("add.open"):
            in_stream = create_input_stream(infile)
    except (StreamError, OSError) as e:
        error("audiowmark: error opening %s: %s\n" % (infile, e))
        return 1

    out_bit_depth = in_stream.bit_depth()
    out_encoding = in_stream.encoding()
    if out_bit_depth < 16:
        out_bit_depth = 16
        out_encoding = Encoding.SIGNED
    try:
        with prof.phase("add.open"):
            out_stream = create_output_stream(
                outfile, in_stream.n_channels(), in_stream.sample_rate(),
                out_bit_depth, out_encoding, in_stream.n_frames())
    except (StreamError, OSError) as e:
        error("audiowmark: error writing to %s: %s\n" % (outfile, e))
        return 1

    info("Input:        %s\n" % (Params.input_label or infile))
    if Params.input_format == Format.RAW:
        _info_format("Raw Input", Params.raw_input_format)
    info("Output:       %s\n" % (Params.output_label or outfile))
    if Params.output_format == Format.RAW:
        _info_format("Raw Output", Params.raw_output_format)

    try:
        return add_stream_watermark(key, in_stream, out_stream, bits, 0)
    finally:
        in_stream.close()
