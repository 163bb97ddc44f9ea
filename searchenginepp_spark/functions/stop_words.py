"""The reference's exact English stop-word list (1,155 unique entries,
including the deliberate "fly"), extracted from
/root/reference/src/normalizer/stop_words.cpp:3-99 as data.

The filter runs on the lowercased, pre-stem token
(/root/reference/src/normalizer/WordNormalizer.cpp:62-65).
"""

from __future__ import annotations

import os
from functools import lru_cache

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "stop_words.txt")


@lru_cache(maxsize=1)
def stop_words() -> frozenset[str]:
    with open(_DATA, encoding="utf-8") as fh:
        return frozenset(line.rstrip("\n") for line in fh if line.strip())
