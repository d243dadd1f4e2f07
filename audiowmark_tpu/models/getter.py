"""Top-level watermark retrieval (`get`/`cmp`): chunk loop, speed handling,
result merging and reporting (reference: src/wmget.cc:886-1013)."""

from __future__ import annotations

from typing import List

from ..crypto.keys import Key
from ..io.streams import StreamError
from ..io.wavdata import WavData
from ..ops.resample import resample_ratio
from ..params import Params
from ..utils.log import error
from .chunkloader import WavChunkLoader
from .common import parse_payload
from .decoder import BlockDecoder, ClipDecoder, _DecodeJobs
from .resultset import ResultSet


def _decode(result_set: ResultSet, key_list: List[Key], wav_data: WavData,
            orig_bits, first_chunk: bool, block_sync=None):
    if Params.detect_speed or Params.detect_speed_patient or Params.try_speed > 0:
        from .speed import detect_speed
        if Params.detect_speed or Params.detect_speed_patient:
            speed_results = detect_speed(key_list, wav_data,
                                         print_results=bool(len(orig_bits)))
        else:
            speed_results = [(key, Params.try_speed) for key in key_list]

        for key, speed in speed_results:
            wav_speed = resample_ratio(wav_data, speed,
                                       int(Params.mark_sample_rate * speed))
            jobs = _DecodeJobs()
            block_decoder = BlockDecoder(speed)
            block_decoder.run([key], wav_speed, result_set, jobs=jobs)
            if first_chunk:
                clip_decoder = ClipDecoder(speed)
                clip_decoder.run([key], wav_speed, result_set, jobs=jobs)
            jobs.flush()

    # block + clip decodes share ONE batched Viterbi launch (the reference
    # fans both out on the same thread pool, src/wmget.cc:544), and the
    # clip pair search is ENQUEUED before the block search's blocking
    # fetch — the clip windows score on device while the block results are
    # in flight over the tunnel
    jobs = _DecodeJobs()
    clip_fin = None
    if first_chunk:
        clip_decoder = ClipDecoder(1)
        clip_fin = clip_decoder.launch(key_list, wav_data)

    block_decoder = BlockDecoder(1)
    block_decoder.run(key_list, wav_data, result_set,
                      sync_results=block_sync, jobs=jobs)

    if clip_fin is not None:
        clip_fin(result_set, jobs)
    jobs.flush()

    result_set.debug_sync = block_decoder.debug_sync()


def report(result_set: ResultSet, time_length: int, orig_bits) -> int:
    if Params.json_output:
        result_set.print_json(time_length, Params.json_output)
    if Params.json_output != "-":
        result_set.print()
    if len(orig_bits):
        match_count = result_set.print_match_count(list(orig_bits))
        if result_set.debug_sync:
            print(result_set.debug_sync, end="")
        if Params.expect_matches >= 0:
            print("expect_matches %d" % Params.expect_matches)
            if match_count != Params.expect_matches:
                return 1
        else:
            if not match_count:
                return 1
    return 0


def _load_one(loader: WavChunkLoader):
    """Advance the loader one chunk; (wav snapshot, time_offset) or None at
    stream end.  The snapshot pairs the samples array with the offset
    atomically — `load_next_chunk` replaces (never mutates) the array, so a
    snapshot stays valid while later chunks load."""
    loader.load_next_chunk()
    if loader.done():
        return None
    wav_data = loader.wav_data()
    assert wav_data.sample_rate == Params.mark_sample_rate
    return (wav_data.with_samples(wav_data.samples), loader.time_offset())


def get_watermark(key_list: List[Key], infile: str, orig_pattern: str) -> int:
    result_set = ResultSet()

    orig_bitvec = []
    if orig_pattern:
        parsed = parse_payload(orig_pattern)
        if parsed is None:
            return 1
        orig_bitvec = list(parsed)

    import os
    import threading

    from ..utils import prof
    from .syncfinder import group_device_count, search_block_group

    # multi-chip: with >1 device, chunks of a long file are searched in
    # device-parallel groups (one sharded dispatch covers group_cap
    # chunks); decode semantics per chunk are unchanged.  Speed flags keep
    # grouping: the group pre-search only feeds each chunk's speed-1.0
    # block decode, and the per-chunk speed scan shards its center axis
    # over the same mesh (ops/speed_fused.scan_device_count).
    group_cap = group_device_count()

    # chunk prefetch: while a chunk group decodes, a host thread loads the
    # next chunk (disk read / codec decode / resample are pure host work)
    # and starts its asynchronous device upload, so a multi-chunk file
    # overlaps chunk N+1's load+transfer under chunk N's search+decode.
    # The reference gets the same effect from its ThreadPool around the
    # chunk loop (src/wmget.cc:886-939 drives chunks serially; decode
    # threads run underneath).  AUDIOWMARK_PREFETCH=0 disables.
    prefetch_on = os.environ.get("AUDIOWMARK_PREFETCH", "1") not in (
        "0", "false")
    pending: list = []        # one result or exception from the thread
    thread = None

    def _prefetch_body():
        try:
            item = _load_one(loader)
            if item is not None:
                from ..utils.devcache import device_audio
                device_audio(item[0].samples)   # async upload starts now
            pending.append(item)
        except BaseException as e:   # re-raised on the main thread
            pending.append(e)

    def _take_next():
        nonlocal thread
        if thread is not None:
            with prof.phase("get.load_join"):
                thread.join()
            thread = None
            item = pending.pop()
            if isinstance(item, BaseException):
                raise item
            return item
        with prof.phase("get.load"):
            return _load_one(loader)

    first_chunk = True
    loader = WavChunkLoader(infile)
    end_of_stream = False
    while not end_of_stream:
        chunks = []           # [(wav_data snapshot, time_offset)]
        budget = 500_000_000  # samples held at once (~2 GB f32)
        while len(chunks) < group_cap:
            try:
                item = _take_next()
            except (StreamError, OSError) as e:
                error("audiowmark: error loading %s: %s\n" % (infile, e))
                return 1
            if item is None:
                end_of_stream = True
                break
            budget -= item[0].samples.size
            chunks.append(item)
            if budget <= 0:
                break
        if not chunks:
            break

        if prefetch_on and not end_of_stream:
            thread = threading.Thread(target=_prefetch_body, daemon=True)
            thread.start()

        presearched = None
        if len(chunks) > 1:
            with prof.phase("get.search_group"):
                presearched = search_block_group(
                    key_list, [w for w, _ in chunks])

        for i, (wav_data, time_offset) in enumerate(chunks):
            chunk_result_set = ResultSet()
            _decode(chunk_result_set, key_list, wav_data, orig_bitvec,
                    first_chunk,
                    block_sync=presearched[i] if presearched else None)
            chunk_result_set.apply_time_offset(time_offset)
            result_set.merge(chunk_result_set)
            first_chunk = False

    result_set.sort(key_list)
    time_length = int(round(loader.length()))
    return report(result_set, time_length, orig_bitvec)
