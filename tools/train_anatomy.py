"""Training-step cost anatomy for the slow-train-tail models (VERDICT r2
item 2): decompose WHERE the backward time goes, per model.

For each model it measures, with the scalar-fetch t(N)-t(1) protocol
(utils/timing.py semantics, all loops jitted):

  fwd        — bf16 eval forward (the BENCHMARKS.md fps column)
  fwd_train  — bf16 train-mode forward only (BN batch stats, droppath)
  grad       — value_and_grad of the train loss (fwd + bwd, no optimizer)
  step       — full mixed-precision train step (fwd + bwd + adamw)
  grad_remat — grad under config.remat_mode() (recompute cost)

and prints the HLO op-time shares the static analyzer attributes to the
backward (transpose/copy/fusion counts from the compiled module) so
un-folded backward relayouts are visible.

Usage: python tools/train_anatomy.py --model conv_mixer [--batch 32]
       python tools/train_anatomy.py --tail   # the four sub-500 img/s rows
"""

import argparse
import os
import sys
from collections import Counter

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

TAIL = ["conv_mixer", "dyna_mlp", "repmlpnet", "hire_mlp"]


def _timed_loop(fn_step, init_carry, iters):
    """t(iters)-t(1) of a jitted fori_loop with a data-dependent carry."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(carry, steps):
        def body(i, c):
            return fn_step(i, c)

        out = lax.fori_loop(0, steps, body, carry)
        # reduce over EVERY leaf: the carry holds pass-through params plus
        # the data-dependent accumulator, and only a returned value keeps
        # the loop body from being dead-code-eliminated
        total = jnp.float32(0)
        for v in jax.tree.leaves(out):
            if hasattr(v, "astype"):
                total = total + jnp.sum(v.astype(jnp.float32))
        return total

    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(init_carry, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t(1)  # compile
    dt = t(iters) - t(1)
    if dt <= 0:
        iters *= 4
        dt = t(iters) - t(1)
    return dt / max(iters - 1, 1)


def anatomy(name, batch=32, iters=8, image_size=224):
    import optax

    import jax
    import jax.numpy as jnp

    import compare
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.parallel.train import (
        cast_floating,
        cross_entropy_loss,
        merge_params,
        split_params,
    )

    ours = compare.build_ours(name)
    apply = ours.apply
    train0, aux, treedef, n = split_params(ours.params)
    optimizer = optax.adamw(1e-4)
    opt0 = optimizer.init(train0)
    x = np.random.default_rng(0).standard_normal(
        (batch, 3, image_size, image_size)
    ).astype(np.float32)
    labels = np.zeros((batch,), np.int32)

    results = {}
    with config.bf16_mode():
        xb = jnp.asarray(x)
        lb = jnp.asarray(labels)

        # params always travel in the loop carry (returned unchanged), so
        # they are jit ARGUMENTS — closing over them inlines the whole tree
        # as MLIR constants and blows the remote-compile payload limit on
        # large models (repmlpnet 68M params -> HTTP 413)
        def loss_fn(train, acc, rng):
            full = merge_params(train, aux, treedef, n)
            full = cast_floating(full, jnp.bfloat16)
            xi = (xb + acc * 1e-8).astype(jnp.bfloat16)
            logits = apply(full, xi, train=True, rng=rng)
            return cross_entropy_loss(logits, lb)

        # fwd (eval, bf16 weights)
        bf16_params = cast_floating(ours.params, jnp.bfloat16)

        def fwd_step(i, c):
            p, acc = c
            out = apply(p, (xb + acc * 1e-8).astype(jnp.bfloat16))
            return (p, jnp.sum(out.astype(jnp.float32)))

        results["fwd"] = _timed_loop(
            fwd_step, (bf16_params, jnp.float32(0)), iters * 2
        )

        # fwd in train mode
        def fwdt_step(i, c):
            train, acc = c
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            full = cast_floating(merge_params(train, aux, treedef, n),
                                 jnp.bfloat16)
            out = apply(full, (xb + acc * 1e-8).astype(jnp.bfloat16),
                        train=True, rng=rng)
            return (train, jnp.sum(out.astype(jnp.float32)))

        results["fwd_train"] = _timed_loop(
            fwdt_step, (train0, jnp.float32(0)), iters
        )

        def _try(key, fn, *a):
            # the no-remat backward can exceed HBM (conv_mixer: 55 GB of
            # scan-stacked activations at b32) — record the OOM instead of
            # dying so the rest of the tail still measures
            try:
                results[key] = fn(*a)
            except Exception as e:
                msg = str(e)
                if ("RESOURCE_EXHAUSTED" in msg or "hbm" in msg
                        or "out of memory" in msg.lower()):
                    results[key] = None
                    print(f"  [{key}: HBM OOM — skipped]")
                else:
                    raise

        # grad only
        def grad_step(i, c):
            train, acc = c
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            loss, grads = jax.value_and_grad(loss_fn)(train, acc, rng)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return (train, loss + 1e-12 * gsum)

        _try("grad", _timed_loop, grad_step, (train0, jnp.float32(0)), iters)

        with config.remat_mode():
            _try("grad_remat", _timed_loop, grad_step,
                 (train0, jnp.float32(0)), iters)

        # full step
        def full_step(i, c):
            train, opt_state, acc = c
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            loss, grads = jax.value_and_grad(loss_fn)(train, acc, rng)
            updates, opt_state = optimizer.update(grads, opt_state, train)
            return (optax.apply_updates(train, updates), opt_state,
                    acc + loss)

        _try("step", _timed_loop, full_step, (train0, opt0, jnp.float32(0)),
             iters)
        if results.get("step") is None:
            with config.remat_mode():
                _try("step_remat", _timed_loop, full_step,
                     (train0, opt0, jnp.float32(0)), iters)

    print(f"== {name} (b{batch}) ==")
    f = results["fwd"]
    for k in ("fwd", "fwd_train", "grad", "grad_remat", "step", "step_remat"):
        v = results.get(k)
        if v is None:
            continue
        print(f"{k:>10}: {v*1e3:8.2f} ms  {batch/v:8.0f} img/s  "
              f"({v/f:4.1f}x fwd)")
    return results


def hlo_histogram(name, batch=32, image_size=224, top=12):
    """Op-category histogram of the compiled backward module."""
    import optax

    import jax
    import jax.numpy as jnp

    import compare
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.parallel.train import (
        cast_floating,
        cross_entropy_loss,
        merge_params,
        split_params,
    )

    ours = compare.build_ours(name)
    apply = ours.apply
    train0, aux, treedef, n = split_params(ours.params)
    x = jnp.zeros((batch, 3, image_size, image_size), jnp.float32)
    labels = jnp.zeros((batch,), jnp.int32)

    with config.bf16_mode():

        def loss_fn(train):
            full = cast_floating(
                merge_params(train, aux, treedef, n), jnp.bfloat16
            )
            logits = apply(full, x.astype(jnp.bfloat16), train=True,
                           rng=jax.random.PRNGKey(0))
            return cross_entropy_loss(logits, labels)

        lowered = jax.jit(jax.grad(loss_fn)).lower(train0)
        compiled = lowered.compile()
    txt = compiled.as_text()
    ops = Counter()
    for line in txt.splitlines():
        line = line.strip()
        if "=" not in line or line.startswith("HloModule"):
            continue
        rhs = line.split("=", 1)[1].strip()
        op = rhs.split("(", 1)[0].split()[-1] if "(" in rhs else ""
        if op:
            ops[op] += 1
    print(f"== {name}: compiled grad module op histogram (top {top}) ==")
    for op, cnt in ops.most_common(top):
        print(f"  {op:<24} {cnt}")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"  flops={ca.get('flops', 0):.3e}  "
              f"bytes={ca.get('bytes accessed', 0):.3e}")
    except Exception as e:
        print("  cost_analysis unavailable:", e)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--tail", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hlo", action="store_true")
    args = ap.parse_args()
    from jittor_mlp_tpu import config as _cfg

    _cfg.enable_compile_cache()
    names = TAIL if args.tail else [args.model or "conv_mixer"]
    for m in names:
        if args.hlo:
            hlo_histogram(m, batch=args.batch)
        else:
            anatomy(m, batch=args.batch)
