from .tools import pair, check_sizes

__all__ = ["pair", "check_sizes"]
