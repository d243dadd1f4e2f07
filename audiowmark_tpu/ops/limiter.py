"""Block-wise look-ahead soft limiter.

Reference behavior (src/limiter.cc): 1-second blocks; per block b the scale
ramps linearly from ceiling/max(M[b-1], M[b]) to ceiling/max(M[b], M[b+1]),
where M[b] = max(|x| over block b, ceiling); one block of latency.

TPU design: per-block maxes are one reshape+reduce; the per-sample ramp is an
iota multiply — the whole limiter is two fused elementwise passes over the
signal.  `limiter_apply` is the batch (whole-signal) form used by the file
embedder; `StreamingLimiter` carries the reference's exact block state for
chunked/streaming use (wav-pipe, HLS skip alignment).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("block_size", "n_channels"))
def _limiter_core(x: jnp.ndarray, block_size: int, n_channels: int,
                  ceiling: float, prev_max: jnp.ndarray):
    """x: (B*block_size*C,) interleaved, whole blocks. prev_max: scalar (last
    block max before this segment, already clamped >= ceiling)."""
    B = x.shape[0] // (block_size * n_channels)
    xb = x.reshape(B, block_size * n_channels)
    maxes = jnp.maximum(jnp.max(jnp.abs(xb), axis=1), ceiling)   # (B,)
    prev = jnp.concatenate([prev_max[None], maxes[:-1]])
    nxt = jnp.concatenate([maxes[1:], jnp.full((1,), ceiling)])
    scale_start = ceiling / jnp.maximum(prev, maxes)
    scale_end = ceiling / jnp.maximum(maxes, nxt)
    step = (scale_end - scale_start) / block_size
    i = jnp.arange(block_size, dtype=jnp.float32)
    scale = scale_start[:, None] + i[None, :] * step[:, None]     # (B, bs)
    out = xb.reshape(B, block_size, n_channels) * scale[:, :, None]
    return out.reshape(-1), maxes


def limiter_apply(samples: np.ndarray, n_channels: int, sample_rate: int,
                  block_size_ms: float = 1000, ceiling: float = 0.99
                  ) -> np.ndarray:
    """Whole-signal limiter, matching the streamed reference output.

    The reference's stream never flushes mid-signal; trailing zero padding
    pushes the final partial block through.  We pad to whole blocks (+1 block
    of zeros as "next"), process, and trim.
    """
    block_size = sample_rate * int(block_size_ms) // 1000
    n = samples.size
    vals_per_block = block_size * n_channels
    n_blocks = -(-n // vals_per_block)
    padded = np.zeros(n_blocks * vals_per_block, dtype=np.float32)
    padded[:n] = samples
    out, _ = _limiter_core(jnp.asarray(padded), block_size, n_channels,
                           ceiling, jnp.float32(ceiling))
    return np.asarray(out)[:n]


class StreamingLimiter:
    """Stateful streaming limiter with the reference's exact block protocol
    (process/skip/flush), vectorized per call."""

    def __init__(self, n_channels: int, sample_rate: int,
                 block_size_ms: float = 1000, ceiling: float = 0.99):
        self.n_channels = n_channels
        self.block_size = sample_rate * int(block_size_ms) // 1000
        self.ceiling = float(ceiling)
        self.buffer = np.zeros(0, dtype=np.float32)
        self.block_max_last = 0.0

    def process(self, samples: np.ndarray) -> np.ndarray:
        self.buffer = np.concatenate([self.buffer,
                                      np.asarray(samples, np.float32)])
        vpb = self.block_size * self.n_channels
        buffered_blocks = self.buffer.size // vpb
        if buffered_blocks < 2:
            return np.zeros(0, dtype=np.float32)
        todo = buffered_blocks - 1
        x = self.buffer[: (todo + 1) * vpb].reshape(todo + 1, vpb)
        maxes = np.maximum(np.max(np.abs(x), axis=1), self.ceiling)
        prev = np.concatenate([[max(self.block_max_last, self.ceiling)],
                               maxes[:-1]])
        out = np.empty(todo * vpb, dtype=np.float32)
        i = np.arange(self.block_size, dtype=np.float32)
        for b in range(todo):
            start = self.ceiling / max(prev[b], maxes[b])
            end = self.ceiling / max(maxes[b], maxes[b + 1])
            step = (end - start) / self.block_size
            scale = (start + i * step).astype(np.float32)
            blk = x[b].reshape(self.block_size, self.n_channels)
            out[b * vpb:(b + 1) * vpb] = (blk * scale[:, None]).reshape(-1)
        self.block_max_last = maxes[todo - 1]
        self.buffer = self.buffer[todo * vpb:].copy()
        return out

    def skip(self, zeros: int) -> int:
        """Fast path for a zero lead-in (reference: src/limiter.cc:69-88)."""
        vpb = self.block_size * self.n_channels
        buffer_size = self.buffer.size + zeros * self.n_channels
        buffered_blocks = buffer_size // vpb
        if buffered_blocks < 2:
            self.buffer = np.zeros(buffer_size, dtype=np.float32)
            return 0
        todo = buffered_blocks - 1
        self.buffer = np.zeros(buffer_size - todo * vpb, dtype=np.float32)
        return todo * self.block_size

    def flush(self) -> np.ndarray:
        out = []
        todo = self.buffer.size
        zblock = np.zeros(1024 * self.n_channels, dtype=np.float32)
        while todo > 0:
            block = self.process(zblock)
            if block.size > todo:
                block = block[:todo]
            out.append(block)
            todo -= block.size
        return (np.concatenate(out) if out
                else np.zeros(0, dtype=np.float32))
