from . import logging
from .logging import scoped

__all__ = ["logging", "scoped"]
