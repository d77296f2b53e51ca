from . import shift

__all__ = ["shift"]
