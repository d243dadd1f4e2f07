"""Fused single-dispatch detector + dp-sharded batch detection.

Runs on a reduced geometry (--short 12 payload, 10 sync frames per bit) so
the production kernels — hop spectrogram, band-sum sweep, local mean, grid
refine, block decode, batched A/B Viterbi — execute end-to-end in seconds
on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from audiowmark_tpu.codec.shortcode import short_encode_blk
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.models.common import parse_payload
from audiowmark_tpu.ops.detect_fused import DetectorConfig, build_detector
from audiowmark_tpu.ops.frames import FRAME
from audiowmark_tpu.params import Params
from audiowmark_tpu import tables as tables_mod
from audiowmark_tpu.parallel.batch import detect_batch, watermark_batch
from audiowmark_tpu.parallel.mesh import make_mesh

# short-12 geometry: 852 data + 60 sync = 912 frames per block; the first
# block starts at frames_pad_start=250, so 1200 frames covers block 0
B, T, C = 8, 1200, 2
PAYLOAD = "abc"


@pytest.fixture()
def mini_geometry():
    saved = (Params.payload_short, Params.payload_size,
             Params.sync_frames_per_bit)
    Params.payload_short = 12
    Params.payload_size = 12
    Params.sync_frames_per_bit = 10
    tables_mod.clear_cache()
    yield
    (Params.payload_short, Params.payload_size,
     Params.sync_frames_per_bit) = saved
    tables_mod.clear_cache()


def _watermarked_batch(key):
    rng = np.random.RandomState(7)
    audio = (rng.rand(B, T * FRAME, C).astype(np.float32) - 0.5) * 0.6
    return watermark_batch(key, audio, PAYLOAD, mesh=make_mesh(8))


def test_fused_detector_recovers_codeword(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)
    det = jax.jit(build_detector(key, DetectorConfig(n_frames=T,
                                                     n_channels=C, top_k=4)))
    out = {k: np.asarray(v) for k, v in
           det(marked[0].reshape(-1)).items()}

    codeword = short_encode_blk(parse_payload(PAYLOAD))
    expect0 = Params.frames_pad_start * FRAME
    # the strongest candidate sits on the first block start and decodes to
    # the exact GF(2) codeword
    best = int(np.argmax(out["qualities"]))
    assert abs(int(out["positions"][best]) - expect0) < FRAME // 2
    assert out["bits"][best].tolist() == list(codeword)
    assert out["errors"][best] < 0.2


def test_detect_batch_sharded_equals_unsharded(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)

    sharded = detect_batch(key, marked, mesh=make_mesh(8), top_k=4)

    det = build_detector(key, DetectorConfig(n_frames=T, n_channels=C,
                                             top_k=4))
    unsharded = jax.jit(jax.vmap(lambda x: det(x.reshape(-1))))(marked)

    for name in ("positions", "block_is_a", "bits"):
        np.testing.assert_array_equal(sharded[name], np.asarray(
            unsharded[name]), err_msg=name)
    np.testing.assert_allclose(sharded["qualities"],
                               np.asarray(unsharded["qualities"]),
                               rtol=1e-5, atol=1e-6)


def test_detect_batch_finds_payload_in_all_streams(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)
    out = detect_batch(key, marked, mesh=make_mesh(8), top_k=4)
    codeword = list(short_encode_blk(parse_payload(PAYLOAD)))
    for b in range(B):
        best = int(np.argmax(out["qualities"][b]))
        assert out["bits"][b][best].tolist() == codeword, b


def test_fused_detector_bf16_recovers_codeword(mini_geometry):
    """The TPU-production bf16 DFT path (dft_bf16=True forced on CPU)
    still recovers the exact codeword at the exact position — the e2e
    validation behind enabling bf16 by default on TPU backends."""
    key = Key()
    marked = _watermarked_batch(key)
    det = jax.jit(build_detector(
        key, DetectorConfig(n_frames=T, n_channels=C, top_k=4,
                            dft_bf16=True)))
    out = {k: np.asarray(v) for k, v in det(marked[0].reshape(-1)).items()}
    codeword = short_encode_blk(parse_payload(PAYLOAD))
    best = int(np.argmax(out["qualities"]))
    assert abs(int(out["positions"][best])
               - Params.frames_pad_start * FRAME) < FRAME // 2
    assert out["bits"][best].tolist() == list(codeword)
