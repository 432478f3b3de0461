from . import logging
from .logging import scoped


def pad_to(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (tile/lane alignment)."""
    return ((x + m - 1) // m) * m


__all__ = ["logging", "scoped", "pad_to"]
