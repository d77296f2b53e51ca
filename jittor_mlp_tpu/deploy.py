"""Ahead-of-time model export: serialize a jitted forward to StableHLO.

The deployment artifact serving infrastructure wants is a self-contained
compiled-model blob, not a Python package + checkpoint. ``export_forward``
traces ``apply(params, x)`` once with the weights baked in as module
constants and returns a ``jax.export.Exported``; ``save_exported`` /
``load_exported`` round-trip its portable serialization, so a server can
run the model with nothing but jax installed — no model code, no importer,
no checkpoint plumbing. The reference has no deployment surface at all
(SURVEY §1: no serving/CLI layer).

    jm.deploy.save_exported(model, "mixer_b16.shlo", batch_size=8)
    ...
    fwd = jm.deploy.load_exported("mixer_b16.shlo")
    logits = fwd(images)          # (8, 3, 224, 224) -> (8, 1000)

Exports are per-platform (tpu/cpu — StableHLO is portable but lowering is
checked against the target) and fixed-shape (static shapes are what the TPU
compiler wants; pair with serving.Predictor-style pad-to-batch feeding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_forward(model, batch_size=8, image_size=224, in_channels=3,
                   dtype=jnp.float32, platform=None, int8=False):
    """Trace model.apply into a jax.export.Exported with weights embedded.

    platform: 'tpu' / 'cpu' / None (current default backend). The input is
    NCHW ``(batch_size, in_channels, image_size, image_size)`` of ``dtype``.
    ``int8=True`` traces under config.int8_mode, baking the dynamic-W8A8
    dense path (int8×int8→int32 MXU contractions) into the artifact.
    """
    from contextlib import nullcontext

    from . import config

    params = model.params
    apply = model.apply

    def fwd(x):
        return apply(params, x)

    spec = jax.ShapeDtypeStruct(
        (batch_size, in_channels, image_size, image_size), dtype
    )
    platforms = [platform] if platform else None
    with config.int8_mode() if int8 else nullcontext():
        return jax.export.export(jax.jit(fwd), platforms=platforms)(spec)


def save_exported(model, path, **kwargs):
    """Serialize export_forward(model, **kwargs) to ``path``; returns path."""
    blob = export_forward(model, **kwargs).serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path):
    """Load a save_exported blob; returns a callable ``fwd(x) -> logits``.

    The callable runs under jit on the current backend and accepts exactly
    the shape/dtype the export was traced with."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    def fwd(x):
        return exp.call(jnp.asarray(x, exp.in_avals[0].dtype))

    return fwd
