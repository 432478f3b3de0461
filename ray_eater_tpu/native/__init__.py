from . import loader

__all__ = ["loader"]
