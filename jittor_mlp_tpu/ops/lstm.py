"""Bidirectional LSTM via lax.scan, importing torch nn.LSTM weight layout.

Replaces the reference's cuDNN LSTM (sequencer.py:34-35). torch layout:
weight_ih_l0 (4H, C), weight_hh_l0 (4H, H), bias_ih_l0/bias_hh_l0 (4H,), and
``_reverse`` twins; gate order i, f, g, o. All B·W row-sequences scan together
so the per-step matmuls stay MXU-sized (SURVEY §7 hard part 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.nnf import _prec


def _lstm_scan(x, w_ih, w_hh, b, reverse=False):
    """x: (N, T, C) → outputs (N, T, H)."""
    N, T, C = x.shape
    H = w_hh.shape[1]
    # precompute input projections for all steps: (N, T, 4H)
    xp = jnp.einsum("ntc,gc->ntg", x, w_ih, precision=_prec()) + b
    xp = jnp.swapaxes(xp, 0, 1)  # (T, N, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h, w_hh.T, precision=_prec())
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((N, H), x.dtype),
        jnp.zeros((N, H), x.dtype),
    )
    _, ys = lax.scan(step, init, xp, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (N, T, H)


def bilstm(p, x):
    """torch nn.LSTM(bidirectional=True, batch_first=True) forward.

    p holds weight_ih_l0 / weight_hh_l0 / bias_ih_l0 / bias_hh_l0 and the
    _reverse twins. Returns (N, T, 2H) with [forward, backward] concat.
    """
    fwd = _lstm_scan(
        x,
        p["weight_ih_l0"],
        p["weight_hh_l0"],
        p["bias_ih_l0"] + p["bias_hh_l0"],
        reverse=False,
    )
    bwd = _lstm_scan(
        x,
        p["weight_ih_l0_reverse"],
        p["weight_hh_l0_reverse"],
        p["bias_ih_l0_reverse"] + p["bias_hh_l0_reverse"],
        reverse=True,
    )
    return jnp.concatenate([fwd, bwd], axis=-1)
