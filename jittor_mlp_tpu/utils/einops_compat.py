"""einops compatibility surface.

The reference vendors a full einops engine with a custom Jittor backend
(/root/reference/models_jittor/einops_my/ — ~2k LoC of recipe machinery,
_backends.py:626-690). On TPU none of that is needed: every Rearrange in the
model zoo is compiled away as a static reshape/transpose (see the model files),
and the installed ``einops`` package already speaks JAX natively for users who
want the API. This module re-exports that surface plus layer-style wrappers so
reference code using ``einops_my`` imports keeps working against jnp arrays.
"""

from __future__ import annotations

from einops import parse_shape, rearrange, reduce, repeat


class Rearrange:
    """Layer-style einops rearrange (einops_my/layers/jittor.py:14-32 analog)."""

    def __init__(self, pattern, **axes_lengths):
        self.pattern = pattern
        self.axes_lengths = axes_lengths

    def __call__(self, x):
        return rearrange(x, self.pattern, **self.axes_lengths)

    def __repr__(self):
        return f"Rearrange({self.pattern!r})"


class Reduce:
    """Layer-style einops reduce (einops_my/layers/jittor.py:35-52 analog)."""

    def __init__(self, pattern, reduction, **axes_lengths):
        self.pattern = pattern
        self.reduction = reduction
        self.axes_lengths = axes_lengths

    def __call__(self, x):
        return reduce(x, self.pattern, self.reduction, **self.axes_lengths)

    def __repr__(self):
        return f"Reduce({self.pattern!r}, {self.reduction!r})"


__all__ = ["rearrange", "reduce", "repeat", "parse_shape", "Rearrange", "Reduce"]
