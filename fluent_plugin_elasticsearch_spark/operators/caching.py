"""Fan-out persist registry.

The candidate generators (shingle / band / LSH self-joins) persist their
fan-out DataFrame because Spark gives self-joins no ReusedExchange — both
sides re-execute the full upstream pipeline otherwise (measured 4x wall on
the 600k corpus, see dedup.py). But the persisted intermediate outlives the
returned pair DataFrame: in a long-lived session repeated calls accumulate
cached blocks in executor storage memory until eviction pressure degrades
other jobs.

``pin(df)`` = persist + register; the registry auto-unpersists the OLDEST
pin beyond ``MAX_PINS`` (a returned pair DataFrame that is materialized
promptly never notices), and callers that want deterministic cleanup call
``release_pins()`` after collecting/writing their result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_PINS = 8

_PINS: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist a fan-out DataFrame and register it for later release."""
    df = df.persist()
    _PINS.append(df)
    while len(_PINS) > MAX_PINS:
        try:
            _PINS.pop(0).unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_pins(blocking: bool = False) -> int:
    """Unpersist every registered fan-out DataFrame; returns how many."""
    n = len(_PINS)
    while _PINS:
        try:
            _PINS.pop().unpersist(blocking)
        except Exception:
            pass
    return n
