"""Benchmark: Mixer-B/16 @224 forward throughput, batch 256, on the local chip.

Protocol: ITERS forwards inside one jitted ``lax.fori_loop`` with a data
dependency between iterations, reduced to a scalar that is fetched to host —
the only reliable sync on this runtime (block_until_ready does not wait on the
axon tunnel, and bulk device→host transfers are pathologically slow, so nothing
bigger than a scalar crosses the link). Timing is t(ITERS) − t(1) to cancel
dispatch/sync overhead. Input is generated on-device. This mirrors the
reference's synced 100-forward loop (compare.py:148-176) measured on-chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 5000.0  # BASELINE.md north-star target for v5e
BATCH = 256
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config

    config.enable_compile_cache()

    model = jm.MLPMixerForImageClassification(d_model=768, depth=12, token_dim=384)
    model.to_bf16()
    params = model.params
    apply = model.apply

    with config.bf16_mode():

        @jax.jit
        def run(params, seed, n):
            x = jax.random.normal(
                jax.random.PRNGKey(seed), (BATCH, 3, 224, 224), jnp.bfloat16
            )

            def body(i, carry):
                acc, x = carry
                # keep the perturbed input bf16 (f32 would silently upcast the
                # whole model and disable the fused kernel path)
                xp = x + (acc * 1e-8).astype(jnp.bfloat16)
                out = apply(params, xp)
                return acc + out[0, 0].astype(jnp.float32), x

            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), x))
            return acc

        def timed(n):
            t0 = time.perf_counter()
            np.asarray(run(params, 0, n))  # scalar fetch = true sync
            return time.perf_counter() - t0

        timed(1)  # compile + params upload
        timed(ITERS)  # compile the long-loop variant... (n is traced: same exe)
        base = min(timed(1) for _ in range(3))
        total = min(timed(ITERS) for _ in range(2))
        dt = total - base

    img_s = BATCH * (ITERS - 1) / dt
    print(
        json.dumps(
            {
                "metric": "mixer_b16_224_fwd_images_per_sec",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
