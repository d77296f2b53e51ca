from ..core.init import trunc_normal
from .tools import pair, check_sizes, sized_kwargs


def trunc_normal_(shape, mean=0.0, std=1.0, a=-2.0, b=2.0, seed=0):
    """Functional counterpart of the reference's trunc_normal_
    (/root/reference/models_jittor/utils/init.py:6-60): returns a fresh
    truncated-normal array instead of mutating a tensor in place."""
    import numpy as np

    return trunc_normal(np.random.default_rng(seed), shape, mean, std, a, b)


__all__ = ["pair", "check_sizes", "trunc_normal", "trunc_normal_"]
