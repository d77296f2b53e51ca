"""Weight-only int8 quantization: compact checkpoints and cheap weight
transport, dequantized on device to bf16/fp32.

The zoo's weights are small enough to replicate (SURVEY §2.4), but on a
tunneled runtime the host→device link — not HBM — is the expensive hop, and
checkpoint storage scales with the fleet. Symmetric per-output-channel int8
cuts both by 4× at ≤0.4% per-weight error (below bf16 resolution for
activations that follow); dequantization is a fused multiply on device, run
once at load.

    q = quantize_tree(model.params)          # int8 payload + f32 scales
    params = dequantize_tree(q, jnp.bfloat16)  # on-device, one pass
    save_quantized(model, "m.int8.npz"); load_quantized(model, "m.int8.npz")

Leaves too small or too sensitive to quantize (biases, norm params, anything
1-D or < min_size elements) ride along in their original dtype. Accuracy is
pinned by tests/test_quant.py: pretrained-ConvMLP argmax agreement and logit
deviation vs the fp32 forward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_QKEY = "__q_int8__"
_SKEY = "__q_scale__"


def _quantize_leaf(x):
    """Symmetric per-channel int8. Returns a marker dict.

    Scale granularity: the leading TWO axes when the remaining block still
    amortizes the f32 scale (≥8 weights per scale), else axis 0 only. The
    two-axis case covers depth-stacked scanned-block leaves (L, O, I...) —
    most of the zoo — which would otherwise degrade to per-layer whole-matrix
    scaling and break the per-channel error bound; (O, I, 1, 1) pointwise
    convs stay per-O so the scales never outweigh the int8 payload."""
    xf = jnp.asarray(x, jnp.float32)
    n_scale = 2 if xf.ndim >= 3 and int(np.prod(xf.shape[2:])) >= 8 else 1
    absmax = jnp.max(
        jnp.abs(xf), axis=tuple(range(n_scale, xf.ndim)), keepdims=True
    )
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return {_QKEY: q, _SKEY: scale.astype(jnp.float32)}


def _eligible(x, min_size):
    x = jnp.asarray(x)
    return (
        jnp.issubdtype(x.dtype, jnp.floating)
        and x.ndim >= 2
        and x.size >= min_size
    )


def quantize_tree(params, min_size=2048):
    """Quantize every eligible weight leaf; others pass through unchanged."""

    def walk(node):
        if isinstance(node, dict):
            if _QKEY in node:
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [walk(v) for v in node]
            return type(node)(vals) if isinstance(node, list) else tuple(vals)
        if _eligible(node, min_size):
            return _quantize_leaf(node)
        return node

    return walk(params)


def dequantize_tree(qparams, dtype=jnp.bfloat16):
    """Inverse of quantize_tree: int8·scale → dtype, one fused pass per leaf.
    Non-quantized float leaves are cast to dtype; aux/int leaves untouched."""

    @jax.jit
    def _deq(q, s):
        return (q.astype(jnp.float32) * s).astype(dtype)

    def walk(node):
        if isinstance(node, dict):
            if _QKEY in node:
                return _deq(node[_QKEY], node[_SKEY])
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [walk(v) for v in node]
            return type(node)(vals) if isinstance(node, list) else tuple(vals)
        if jnp.issubdtype(jnp.asarray(node).dtype, jnp.floating):
            return jnp.asarray(node, dtype)
        return node

    return walk(qparams)


def dynamic_int8_matmul(x, wt):
    """``x @ wt`` as a dynamic W8A8 int8 contraction (inference serving).

    Per-token symmetric activation scales (absmax over the contracted axis,
    computed from the live tensor — no calibration pass to go stale) and
    per-output-channel weight scales; the contraction itself is an
    int8×int8→int32 ``lax.dot_general``, which the TPU MXU executes at 2×
    its bf16 FLOP rate. The f32 rescale epilogue fuses into the matmul.

    x: (..., I); wt: (I, O) → (..., O) in x's dtype. Used by the nnf dense
    ops under ``config.int8_mode()``; per-element input error is ≤ absmax/254
    (≈0.4% relative for normal data), pinned end-to-end by tests/test_int8.py.
    """
    xf = jnp.asarray(x, jnp.float32)
    wf = jnp.asarray(wt, jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    aw = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    sw = jnp.where(aw > 0, aw / 127.0, 1.0)
    qx = jnp.round(xf / sx).astype(jnp.int8)  # |xf| ≤ ax → no clip needed
    qw = jnp.round(wf / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * sw).astype(jnp.asarray(x).dtype)


def quantized_nbytes(qparams):
    """Total payload bytes (int8 + scales + passthrough leaves)."""
    return sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(qparams)
    )


def save_quantized(model, path, min_size=2048):
    """Snapshot model.params as an int8 npz (≈4× smaller than fp32)."""
    q = quantize_tree(jax.tree.map(np.asarray, model.params), min_size)
    leaves, treedef = jax.tree_util.tree_flatten(q)
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, __treedef__=str(treedef), **arrays)
    return path


def load_quantized(model, path, dtype=jnp.bfloat16):
    """Restore a save_quantized snapshot into an identically-built Model.

    The int8 payload is uploaded raw and dequantized on device, so the host
    link carries a quarter of the fp32 bytes."""
    ref_q = quantize_tree(model.params)
    leaves, treedef = jax.tree_util.tree_flatten(ref_q)
    with np.load(path) as data:
        stored = [k for k in data.files if k.startswith("leaf_")]
        assert len(stored) == len(leaves), (
            f"checkpoint has {len(stored)} leaves, model expects "
            f"{len(leaves)} — build the model with the same config first"
        )
        new = [jnp.asarray(data[f"leaf_{i:05d}"]) for i in range(len(leaves))]
    q = jax.tree_util.tree_unflatten(treedef, new)
    model.params = dequantize_tree(q, dtype)
    model._jit_cache.clear()
    return model
