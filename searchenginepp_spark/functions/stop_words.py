"""The reference's exact English stop-word list (1,155 unique entries,
including the deliberate "fly"), extracted from
/root/reference/src/normalizer/stop_words.cpp:3-99 as data.

The filter runs on the lowercased, pre-stem token
(/root/reference/src/normalizer/WordNormalizer.cpp:62-65).
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources


@lru_cache(maxsize=1)
def stop_words() -> frozenset[str]:
    # importlib.resources, not a __file__-relative path: executors importing
    # the package from a spark-submit --py-files ZIP have no directory to
    # open (found by the local-cluster spark-submit smoke, round 3)
    text = (resources.files("searchenginepp_spark") / "data"
            / "stop_words.txt").read_text(encoding="utf-8")
    return frozenset(line for line in text.splitlines() if line.strip())
