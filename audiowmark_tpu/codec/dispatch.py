"""Payload codec dispatch: conv code (128-bit) vs short block codes.

Reference: src/shortcode.cc:117-133 — switches on Params.payload_short.
"""

from __future__ import annotations

import numpy as np

from ..params import Params
from .convcode import (ConvBlockType, conv_code_size, conv_encode,
                       conv_decode_soft)
from .shortcode import short_code_size, short_encode, short_decode_soft


def code_encode(block_type: ConvBlockType, in_bits) -> np.ndarray:
    if Params.payload_short:
        return short_encode(block_type, in_bits)
    return conv_encode(block_type, in_bits)


def code_size(block_type: ConvBlockType, msg_size: int) -> int:
    if Params.payload_short:
        return short_code_size(block_type, msg_size)
    return conv_code_size(block_type, msg_size)


def code_decode_soft(block_type: ConvBlockType, coded_bits,
                     return_error: bool = False):
    if Params.payload_short:
        return short_decode_soft(block_type, coded_bits, return_error)
    return conv_decode_soft(block_type, coded_bits, return_error)
