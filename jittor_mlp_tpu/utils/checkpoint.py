"""Checkpoint load/migration utilities.

Covers the reference's checkpoint surface (SURVEY §5):
- torch checkpoint loading with the ``['model']`` unwrap convention
  (wave_mlp.py:147-148, morph_mlp.py:150-151)
- GFNet's format-migration helpers: pos-embed grid resize and the
  patch-embed reshape filter (gfnet.py:391-426)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def load_torch_checkpoint(path_or_url, map_location="cpu"):
    """torch.load a local path or URL; unwrap {'model': sd} containers.

    A bare filename (or a path that doesn't exist locally) is additionally
    resolved against JITTOR_MLP_TPU_CKPT_DIR, so the reference's
    path-style ``pretrained=`` arguments (wave_mlp.py:147-148,
    morph_mlp.py:150-151 take a checkpoint PATH, not a URL) work on
    air-gapped pods with pre-staged checkpoint directories."""
    import os

    import torch

    if str(path_or_url).startswith(("http://", "https://")):
        from torch.hub import load_state_dict_from_url

        sd = load_state_dict_from_url(path_or_url, map_location=map_location)
    else:
        path = str(path_or_url)
        cache_dir = os.environ.get("JITTOR_MLP_TPU_CKPT_DIR")
        if not os.path.exists(path) and cache_dir:
            staged = os.path.join(cache_dir, os.path.basename(path))
            if os.path.exists(staged):
                path = staged
        sd = torch.load(path, map_location=map_location)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return sd


def load_pretrained(filename, url, map_location="cpu"):
    """Resolve a published checkpoint: local cache dir first, then URL.

    Production TPU pods are typically air-gapped (no egress); pre-stage the
    published .pth files in a directory and point JITTOR_MLP_TPU_CKPT_DIR at
    it — the file is then served from disk and the URL is never touched.
    Mirrors the reference's load_state_dict_from_url usage
    (/root/reference/models_pytorch/conv_mlp.py:278-285) with the offline
    path the reference lacks.
    """
    import os

    cache_dir = os.environ.get("JITTOR_MLP_TPU_CKPT_DIR")
    if cache_dir:
        path = os.path.join(cache_dir, filename)
        if os.path.exists(path):
            return load_torch_checkpoint(path, map_location)
    return load_torch_checkpoint(url, map_location)


def resize_pos_embed(posemb, n_tokens_new, has_cls_token=True):
    """Bilinear-resize a (1, N, D) position-embedding grid (gfnet.py:391-408)."""
    posemb = jnp.asarray(np.asarray(posemb))
    if has_cls_token:
        tok, grid = posemb[:, :1], posemb[0, 1:]
        n_tokens_new -= 1
    else:
        tok, grid = posemb[:, :0], posemb[0]
    gs_old = int(math.sqrt(grid.shape[0]))
    gs_new = int(math.sqrt(n_tokens_new))
    grid = grid.reshape(1, gs_old, gs_old, -1)
    grid = jax.image.resize(
        grid, (1, gs_new, gs_new, grid.shape[-1]), method="bilinear"
    )
    grid = grid.reshape(1, gs_new * gs_new, -1)
    return jnp.concatenate([tok, grid], axis=1)


def gfnet_checkpoint_filter(state_dict, model):
    """gfnet.py:411-426: reshape pre-conv patch-embed weights; resize pos_embed
    when the checkpoint grid differs from the model's."""
    out = {}
    if "model" in state_dict:
        state_dict = state_dict["model"]
    target_pe = model.params.get("pos_embed")
    for k, v in state_dict.items():
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if "patch_embed.proj.weight" in k and arr.ndim < 4:
            O = arr.shape[0]
            w = model.params["patch_embed"]["weight"]
            arr = arr.reshape(O, -1, w.shape[2], w.shape[3])
        elif k == "pos_embed" and target_pe is not None and arr.shape != target_pe.shape:
            arr = np.asarray(
                resize_pos_embed(arr, target_pe.shape[1], has_cls_token=False)
            )
        out[k] = arr
    return out
