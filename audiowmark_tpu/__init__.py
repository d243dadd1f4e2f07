"""audiowmark_tpu — TPU-native audio watermarking framework.

A from-scratch JAX/XLA/Pallas re-design of the audiowmark watermarking
pipeline (reference: swesterfeld/audiowmark v0.6.5): patchwork spread-spectrum
embedding in STFT magnitude space, keyed AES-CTR layout, rate-1/6 order-15
convolutional FEC with soft Viterbi decoding, correlation-based sync search,
clip decoding and replay-speed detection.

Design stance: the host (Python/C++) does I/O, key-derived table generation and
orchestration; the TPU does everything O(samples) — windowed STFT/iSTFT, delta
embedding, limiter, resampling, dB spectrograms, sync correlation sweeps,
Viterbi and the speed grid — as large batched XLA/Pallas computations.
"""

__version__ = "0.1.0"

from .params import Params  # noqa: F401
from .crypto.keys import Key  # noqa: F401
from .crypto.prng import Random, Stream  # noqa: F401
