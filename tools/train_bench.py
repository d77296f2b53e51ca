"""Training-step throughput on the local chip: full fwd+bwd+adamw.

Protocol mirrors bench.py: N real optimizer steps inside one jitted
``lax.fori_loop`` carrying (trainable params, opt state), loss reduced to a
scalar fetched to host, t(N) − t(1) to cancel dispatch/sync. Prints one JSON
line per mode. Usage: python tools/train_bench.py [--batch 128] [--iters 10]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(model, batch, dtype_name, iters):
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from jittor_mlp_tpu.parallel.train import (
        cast_floating,
        cross_entropy_loss,
        merge_params,
        split_params,
    )

    optimizer = optax.adamw(1e-3)
    apply = model.apply
    train0, aux, treedef, n = split_params(model.params)
    opt0 = optimizer.init(train0)
    B = batch

    @jax.jit
    def run(train, opt_state, steps):
        x = jax.random.normal(
            jax.random.PRNGKey(0), (B, 3, 224, 224),
            jnp.bfloat16 if dtype_name == "bf16" else jnp.float32,
        )
        labels = jnp.zeros((B,), jnp.int32)

        def body(i, carry):
            train, opt_state, acc = carry
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)

            def loss_fn(train):
                full = merge_params(train, aux, treedef, n)
                xi = x + (acc * 1e-8).astype(x.dtype)
                if dtype_name == "mixed":  # f32 master, bf16 compute
                    full = cast_floating(full, jnp.bfloat16)
                    xi = xi.astype(jnp.bfloat16)
                logits = apply(full, xi, train=True, rng=rng)
                return cross_entropy_loss(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(train)
            updates, opt_state = optimizer.update(grads, opt_state, train)
            train = optax.apply_updates(train, updates)
            return train, opt_state, acc + loss

        _, _, acc = lax.fori_loop(0, steps, body, (train, opt_state,
                                                   jnp.float32(0.0)))
        return acc

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(train0, opt0, k))
            best = min(best, time.perf_counter() - t0)
        return best

    timed(1)
    dt = timed(iters) - timed(1)
    return B * (iters - 1) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config

    config.enable_compile_cache()

    from jittor_mlp_tpu.core import nnf

    # f32 at batch 128 holds every layer's 196x3072 hidden alive through the
    # backward (25.6 GB > 15.75 GB HBM): block remat is the production
    # memory fit. bf16 rides the fused Pallas forward + XLA backward.
    remat_runner = lambda f, p, x: nnf.scan_blocks(f, p, x, remat=True)
    for mode in ("f32", "mixed", "bf16"):
        model = jm.MLPMixerForImageClassification(
            d_model=768, depth=12, token_dim=384,
            block_runner=remat_runner if mode == "f32" else None,
        )
        if mode == "bf16":
            model.to_bf16()
        if mode in ("bf16", "mixed"):
            with config.bf16_mode():
                fps = measure(model, args.batch, mode, args.iters)
        else:
            fps = measure(model, args.batch, mode, args.iters)
        print(json.dumps({
            "metric": f"mixer_b16_224_train_step_images_per_sec_{mode}",
            "value": round(fps, 1),
            "unit": "images/sec/chip",
            "batch": args.batch,
            "remat": mode == "f32",
        }))


if __name__ == "__main__":
    main()
