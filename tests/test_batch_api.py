"""Batch watermarking API vs the streaming embedder (8-device CPU mesh)."""

import numpy as np

from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.models.common import parse_payload
from audiowmark_tpu.models.embedder import StreamingEmbedder
from audiowmark_tpu.ops.frames import FRAME
from audiowmark_tpu.ops.limiter import limiter_apply
from audiowmark_tpu.parallel.batch import watermark_batch
from audiowmark_tpu.parallel.mesh import make_mesh

MSG = "f0" * 16


def test_watermark_batch_matches_streaming():
    key = Key()
    mesh = make_mesh(8)
    dp, sp = mesh.devices.shape
    B = dp * 2
    T = sp * 16
    n = T * FRAME
    rng = np.random.RandomState(0)
    audio = (rng.rand(B, n, 2).astype(np.float32) * 2 - 1) * 0.9

    marked = watermark_batch(key, audio, MSG, mesh=mesh)
    assert marked.shape == audio.shape

    bitvec = parse_payload(MSG)
    for b in range(B):
        interleaved = audio[b].reshape(-1)
        emb = StreamingEmbedder(key, 2, 44100, bitvec)
        delta = [emb.run(interleaved)]
        for _ in range(3):
            delta.append(emb.run(np.zeros(FRAME * 2, np.float32)))
        d = np.concatenate(delta)[:interleaved.size]
        expect = limiter_apply(interleaved + d, 2, 44100).reshape(n, 2)
        # the sharded batch form computes OLA frame T-1's forward
        # contribution too; agreement holds away from the final frame
        np.testing.assert_allclose(marked[b][: n - FRAME], expect[: n - FRAME],
                                   rtol=1e-4, atol=1e-5)
