"""Production training recipes for the zoo: augmentation-in-loss, EMA, LR
schedules, and an extended sharded train step with on-device metrics.

The reference is an inference-only zoo (SURVEY §0), but every paper it
implements trains with the same DeiT-style recipe (mixup/cutmix, label
smoothing, cosine LR with warmup, EMA). These are the TPU-native versions:
everything here is jit-compatible with static shapes — mixing happens inside
the compiled step on device, labels become dense soft distributions, and the
EMA is a tree_map the SPMD partitioner shards like the params themselves.

    recipe = Recipe(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1,
                    ema_decay=0.9999)
    schedule = make_lr_schedule(base_lr=1e-3, warmup_steps=500,
                                total_steps=100_000)
    optimizer = optax.adamw(schedule, weight_decay=0.05)
    step = make_recipe_train_step(model.apply, optimizer, num_classes,
                                  recipe)
    state = init_recipe_state(params, optimizer, mesh)
    state, metrics = step(state, batch, rng)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .parallel.train import (
    init_sharded,
    merge_params,
    split_params,
)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def soft_cross_entropy(logits, soft_labels):
    """CE against dense label distributions (mixup/cutmix/smoothed targets)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.sum(soft_labels * logp, axis=-1))


def smooth_labels(labels, num_classes, smoothing=0.0):
    """One-hot with label smoothing: on = 1-s+s/K, off = s/K (torch
    F.cross_entropy(label_smoothing=s) semantics)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * (on - off) + off


# ---------------------------------------------------------------------------
# mixup / cutmix (on-device, static shapes)
# ---------------------------------------------------------------------------


def _cutmix_mask(rng, h, w, lam):
    """Rectangular mask of area ≈ (1-lam), centered uniformly; built from
    iota comparisons so box coordinates may be traced values."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * h).astype(jnp.int32)
    cut_w = (ratio * w).astype(jnp.int32)
    kc, kr = jax.random.split(rng)
    cy = jax.random.randint(kc, (), 0, h)
    cx = jax.random.randint(kr, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    # exact area correction, as in timm's Mixup: lam from the realized box
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
    return inside, lam_adj.astype(jnp.float32)


def mixup_cutmix(
    rng,
    images,
    soft_labels,
    mixup_alpha=0.8,
    cutmix_alpha=1.0,
    switch_prob=0.5,
):
    """Apply mixup or cutmix (coin-flipped per batch) to NCHW images and dense
    soft labels. Static shapes: the mixing partner is the batch reversed, the
    cutmix box is a traced mask. Either alpha set to 0 disables that mode.

    Returns (mixed_images, mixed_labels)."""
    if mixup_alpha <= 0.0 and cutmix_alpha <= 0.0:
        return images, soft_labels
    k_mode, k_beta1, k_beta2, k_box = jax.random.split(rng, 4)
    b, _, h, w = images.shape
    flipped_img = images[::-1]
    flipped_lab = soft_labels[::-1]

    use_cutmix = jnp.logical_and(
        cutmix_alpha > 0.0,
        jnp.logical_or(
            mixup_alpha <= 0.0,
            jax.random.bernoulli(k_mode, switch_prob),
        ),
    )

    lam_mix = (
        jax.random.beta(k_beta1, mixup_alpha, mixup_alpha)
        if mixup_alpha > 0.0
        else jnp.float32(1.0)
    )
    lam_cut = (
        jax.random.beta(k_beta2, cutmix_alpha, cutmix_alpha)
        if cutmix_alpha > 0.0
        else jnp.float32(1.0)
    )

    inside, lam_cut_adj = _cutmix_mask(k_box, h, w, lam_cut)
    img_cut = jnp.where(
        inside[None, None, :, :], flipped_img, images
    )
    img_mix = (
        lam_mix * images.astype(jnp.float32)
        + (1.0 - lam_mix) * flipped_img.astype(jnp.float32)
    ).astype(images.dtype)

    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    mixed_images = jnp.where(use_cutmix, img_cut, img_mix)
    mixed_labels = lam * soft_labels + (1.0 - lam) * flipped_lab
    return mixed_images, mixed_labels


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------


def ema_update(ema, new, decay):
    """Polyak average: ema ← decay·ema + (1-decay)·new. Apply to the
    trainable partition; shardings follow the params."""
    return jax.tree.map(
        lambda e, p: (decay * e + (1.0 - decay) * p).astype(e.dtype), ema, new
    )


def swap_in_ema(params, ema_train):
    """Return a full params tree with the trainable partition replaced by its
    EMA (for eval/checkpoint export)."""
    train, aux, treedef, n = split_params(params)
    return merge_params(ema_train, aux, treedef, n)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------


def make_lr_schedule(
    base_lr,
    total_steps,
    warmup_steps=0,
    kind="cosine",
    min_lr=0.0,
):
    """Linear-warmup + {cosine, linear, constant} decay — the schedule family
    every paper in the zoo trains with."""
    if kind == "cosine":
        decay = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_steps, 1), alpha=min_lr / base_lr
        )
    elif kind == "linear":
        decay = optax.linear_schedule(
            base_lr, min_lr, max(total_steps - warmup_steps, 1)
        )
    elif kind == "constant":
        decay = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown schedule kind {kind!r}")
    if warmup_steps <= 0:
        return decay
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


# ---------------------------------------------------------------------------
# extended train step
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Recipe:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    ema_decay: float = 0.0  # 0 disables EMA


class RecipeState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Any  # trainable-partition EMA tree, or None
    step: jnp.ndarray


def init_recipe_state(params, optimizer, mesh, recipe=Recipe()):
    """Place params on the mesh (DP×TP heuristic shardings) and build the
    optimizer + EMA state over the trainable partition."""
    params, opt_state, _ = init_sharded(params, optimizer, mesh)
    train, _, _, _ = split_params(params)
    ema = jax.tree.map(jnp.copy, train) if recipe.ema_decay > 0.0 else None
    return RecipeState(params, opt_state, ema, jnp.zeros((), jnp.int32))


def make_recipe_train_step(apply_fn, optimizer, num_classes, recipe=Recipe(),
                           compute_dtype=None):
    """Jitted (state, batch, rng) -> (state, metrics).

    batch: {'image': NCHW float, 'label': int labels}. Metrics are scalars
    computed on device: loss, top-1 accuracy against the hard labels, and
    grad l2 norm. Mesh-agnostic: sharding propagates from the inputs.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: f32 master
    weights/grads/optimizer/EMA, bf16 forward+backward (see
    parallel.train.make_train_step)."""
    from .parallel.train import cast_floating

    def step(state, batch, rng):
        params, opt_state, ema, it = state
        k_mix, k_model = jax.random.split(jax.random.fold_in(rng, it))
        train, aux, treedef, n = split_params(params)

        labels = batch["label"]
        soft = smooth_labels(labels, num_classes, recipe.label_smoothing)
        images, soft = mixup_cutmix(
            k_mix,
            batch["image"],
            soft,
            mixup_alpha=recipe.mixup_alpha,
            cutmix_alpha=recipe.cutmix_alpha,
            switch_prob=recipe.switch_prob,
        )

        def loss_fn(train):
            full = merge_params(train, aux, treedef, n)
            x = images
            if compute_dtype is not None:
                full = cast_floating(full, compute_dtype)
                x = x.astype(compute_dtype)
            logits = apply_fn(full, x, train=True, rng=k_model)
            return soft_cross_entropy(logits, soft), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(train)
        updates, opt_state = optimizer.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)

        if recipe.ema_decay > 0.0:
            ema = ema_update(ema, train, recipe.ema_decay)

        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "accuracy": acc, "grad_norm": gnorm}
        new_state = RecipeState(
            merge_params(train, aux, treedef, n), opt_state, ema, it + 1
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
