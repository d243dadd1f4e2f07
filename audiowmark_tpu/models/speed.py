"""Replay-speed detection (placeholder — full grid search lands next).

Reference: src/wmspeed.cc.  Implemented in the speed milestone; the getter
imports lazily so normal decode paths work without it.
"""

from __future__ import annotations

from typing import List, Tuple

from ..crypto.keys import Key
from ..io.wavdata import WavData


def detect_speed(key_list: List[Key], in_data: WavData,
                 print_results: bool) -> List[Tuple[Key, float]]:
    raise NotImplementedError("speed detection not yet implemented")
