from . import dcn, deform, lstm, shift, window

__all__ = ["dcn", "deform", "lstm", "shift", "window"]
