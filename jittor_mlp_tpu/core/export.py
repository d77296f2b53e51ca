"""Params → torch state_dict export (the reverse of load_torch_state_dict).

The importers are element-permutations of the torch tensors (nest, stack,
reshape, transpose — never arithmetic), so the inverse map can be *traced*
generically instead of hand-written 22 times: push a state dict whose every
element is a unique integer index through the model's importer, observe where
each index lands in the params tree, and scatter the real parameter values
back into flat torch tensors.

Aux leaves the importers plant from config (drop-path rates, roll steps) are
recognized — their tagged values are not valid index sets — and skipped.
Leaves whose torch span is not fully recovered raise, so a silent partial
export is impossible. BN ``num_batches_tracked`` buffers (dropped on import,
pytree.nest) are re-synthesized as zeros so ``torch_model.load_state_dict``
accepts the result strictly.
"""

from __future__ import annotations

import numpy as np

from . import pytree

# Tag base: far above any config-derived integer aux leaf, while keeping
# BASE + n_elements within int32 (jnp.stack demotes int64 when x64 is off).
_BASE = 1 << 30


def trace_export_map(init_sd, importer):
    """Return (spans, tagged_params): spans maps torch name → (offset, size),
    tagged_params is the importer's output on the index-tagged state dict."""
    spans = {}
    tagged_flat = {}
    offset = 0
    for name, arr in init_sd.items():
        arr = np.asarray(arr)
        spans[name] = (offset, arr.size, arr.shape, arr.dtype)
        tagged_flat[name] = (
            np.arange(offset, offset + arr.size, dtype=np.int64) + _BASE
        ).reshape(arr.shape)
        offset += arr.size
    tagged_params = importer(pytree.nest(tagged_flat))
    return spans, tagged_params, offset


def export_state_dict(params, init_sd, importer, strict=True):
    """Invert the importer: params pytree → ({torch name: numpy array},
    dropped_names).

    A *fully* unmapped tensor means the importer dropped it — the reference
    constructs parameters its forward never reads (e.g. sparse_mlp's
    last-stage PatchMerging); those are emitted with their template (init)
    values so torch's strict loading succeeds, and reported in
    ``dropped_names``. A *partially* mapped tensor can only mean the importer
    did arithmetic on it — that raises (or drops under strict=False)."""
    spans, tagged_params, total = trace_export_map(init_sd, importer)
    flat = np.empty(total, np.float64)
    filled = np.zeros(total, bool)

    def walk(tag, val, path):
        if isinstance(tag, dict):
            for k, t in tag.items():
                if not isinstance(val, dict) or k not in val:
                    raise KeyError(f"params missing {path + (k,)}")
                walk(t, val[k], path + (k,))
            return
        if isinstance(tag, (list, tuple)):
            assert isinstance(val, (list, tuple)) and len(val) == len(tag), path
            for i, (t, v) in enumerate(zip(tag, val)):
                walk(t, v, path + (i,))
            return
        t = np.asarray(tag)
        if not np.issubdtype(t.dtype, np.integer):
            return  # importer-planted float aux (e.g. drop-path rates)
        idx = t.ravel().astype(np.int64) - _BASE
        if idx.size == 0 or idx.min() < 0 or idx.max() >= total:
            return  # config-derived integer aux, not an index map
        v = np.asarray(val)
        if v.shape != t.shape:
            raise ValueError(
                f"shape drift at {path}: tagged {t.shape} vs params {v.shape}"
            )
        flat[idx] = v.astype(np.float64).ravel()
        filled[idx] = True

    walk(tagged_params, params, ())

    out = {}
    dropped = []
    for name, (off, size, shape, dtype) in spans.items():
        got = filled[off:off + size]
        out_dtype = dtype if np.issubdtype(dtype, np.floating) else np.float32
        if not got.any():
            dropped.append(name)
            out[name] = np.asarray(init_sd[name], out_dtype).reshape(shape)
        elif not got.all():
            if strict:
                raise ValueError(
                    f"export could only partially recover '{name}' "
                    f"({int((~got).sum())}/{size} elements unmapped — "
                    "the importer did arithmetic on it, not a permutation)"
                )
            continue
        else:
            out[name] = flat[off:off + size].reshape(shape).astype(out_dtype)
        if name.endswith("running_var"):
            # module also carries the bookkeeping buffer torch expects
            out[name.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.asarray(
                0, np.int64
            )
    return out, dropped
