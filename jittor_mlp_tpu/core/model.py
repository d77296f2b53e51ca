"""Model wrapper: a pure apply fn + params pytree behind a torch-zoo-like facade.

Replaces the nn.Module object graph of the reference with a functional core.
``Model.__call__`` accepts NCHW fp32 batches (the reference's input convention,
compare.py:23-27) and runs a jitted forward; parity/benchmark harnesses can also
reach ``apply``/``params`` directly or shard them with jax.sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import nnf, pytree


class Model:
    """A built model: config-closed apply function plus parameters.

    apply_fn(params, x_nchw, train=False, rng=None) -> logits
    importer(state_dict_nested) -> params  (defaults to identity structure)
    """

    def __init__(self, name, apply_fn, params, importer=None, exporter=None,
                 init_sd=None):
        self.name = name
        self.apply = apply_fn
        self.params = params
        self._importer = importer or (lambda nested: nested)
        self._exporter = exporter
        self._init_sd = init_sd  # flat torch-name → array template (export)
        self._jit_cache = {}
        self.training = False
        self.mesh = None

    # -- torch-compat surface -------------------------------------------------

    def load_torch_state_dict(self, state_dict):
        """Import a torch ``state_dict`` (tensors or ndarrays) as our params."""
        nested = pytree.nest(state_dict)
        self.params = self._importer(nested)
        self._jit_cache.clear()
        return self

    def export_torch_state_dict(self, tensors=True, strict=True,
                                return_dropped=False):
        """Export params as a torch ``state_dict`` — the reverse direction:
        train/convert here, deploy in torch. The inverse weight map is traced
        through the importer (core/export.py), so this works for every zoo
        model without per-model code. Returns torch tensors (or numpy arrays
        with ``tensors=False``); ``return_dropped=True`` additionally returns
        the names whose values are template passthroughs because the importer
        drops them (reference-dead parameters)."""
        from . import export as _export

        assert self._init_sd is not None, (
            "model was built without an init_sd template"
        )
        sd, dropped = _export.export_state_dict(
            self.params, self._init_sd, self._importer, strict=strict
        )
        if tensors:
            import torch

            sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd.items()}
        return (sd, dropped) if return_dropped else sd

    def eval(self):
        self.training = False
        return self

    def train(self, mode=True):
        self.training = mode
        return self

    def param_count(self):
        return pytree.param_count(self.params)

    def flops(self, input_shape=(1, 3, 224, 224)):
        """Forward-pass FLOPs from XLA's cost analysis (the counterpart of the
        reference's hand-written .flops() methods, e.g. swin_mlp.py:163-179).

        Scanned blocks are fully unrolled for the analysis — XLA counts a
        lax.scan body once regardless of trip count, which undercounted deep
        models ~depth×. (Inner recurrences like the Sequencer LSTM time scan
        still count once per step-body; all block-level repetition is exact.)
        """
        from . import nnf

        nnf._FULL_UNROLL = True
        try:
            lowered = jax.jit(lambda p, x: self.apply(p, x)).lower(
                self.params, jnp.zeros(input_shape, jnp.float32)
            )
        finally:
            nnf._FULL_UNROLL = False
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))

    def to_bf16(self):
        self.params = pytree.cast_floats(self.params, jnp.bfloat16)
        self._jit_cache.clear()
        return self

    def shard(self, mesh, min_dim=512):
        """Distribute the model over a ('data', 'model') mesh.

        Tensor parallelism: wide FF hidden dimensions shard over 'model',
        small tensors replicate (heuristic in parallel.train.shard_params —
        works for every zoo model's params tree; ``min_dim`` is the smallest
        axis worth sharding). Data parallelism: ``__call__`` shards the input
        batch over 'data' (batch size must be divisible by the data-axis
        size). XLA's SPMD partitioner inserts the ICI collectives."""
        from ..parallel.train import shard_params

        self.params = jax.device_put(
            self.params, shard_params(self.params, mesh, min_dim=min_dim)
        )
        self.mesh = mesh
        self._jit_cache.clear()
        return self

    # -- forward --------------------------------------------------------------

    def _jitted(self):
        # the active block runner (nnf.block_runner_scope) changes the traced
        # graph — without it in the key, a model first called densely would
        # silently reuse its dense trace inside a pipeline/SP scope
        key = (config.compute_dtype, config.matmul_precision, config.remat,
               self.training, config.fast_compile, config.int8_matmul,
               config.pallas_bwd, nnf._block_runner)
        fn = self._jit_cache.get(key)
        if fn is None:
            train = self.training

            def fwd(params, x, rng):
                x = x.astype(config.compute_dtype)
                return self.apply(params, x, train=train, rng=rng)

            opts = None
            if config.fast_compile:
                opts = {"exec_time_optimization_effort": -1.0,
                        "memory_fitting_effort": -1.0}
            fn = jax.jit(fwd, compiler_options=opts)
            # bounded: the runner key is object identity, so per-call
            # runner closures would otherwise pin executables (and their
            # meshes) without limit — reuse one runner across calls to
            # avoid the recompile itself
            if len(self._jit_cache) >= 8:
                self._jit_cache.pop(next(iter(self._jit_cache)))
            self._jit_cache[key] = fn
        return fn

    def __call__(self, x, rng=None):
        if hasattr(x, "detach"):  # torch tensor
            x = x.detach().cpu().numpy()
        if not isinstance(x, jax.Array):
            x = jnp.asarray(np.asarray(x))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            x = jax.device_put(
                x,
                NamedSharding(
                    self.mesh, PartitionSpec("data", *[None] * (x.ndim - 1))
                ),
            )
        return self._jitted()(self.params, x, rng)
