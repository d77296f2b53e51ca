"""CPU-vs-TPU fp32 numerics attribution for a zoo model (default AS-MLP).

Round-2 verdict item 1: on-chip f32 parity drift (~6e-3 AS-MLP) was asserted
to be "hardware numerics" without evidence. This tool produces the evidence:

1. stage bisect — run the SAME weights+input through the probed forward on
   the in-process CPU backend and on the TPU, and report per-stage
   accumulated max-abs/max-rel drift (comparisons run ON the TPU; only
   scalars cross the tunnel).
2. op micro-probes — feed stage-scale random tensors through the individual
   primitives (group-norm stats, rsqrt vs 1/sqrt, matmul accumulation, gelu)
   on both backends to name the per-op error source.

Usage:  python tools/tpu_numerics.py [--model as_mlp] [--batch 2]
"""

import argparse
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def stage_bisect(name, batch):
    import jax
    import jax.numpy as jnp

    import compare
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.utils.probes import capture
    from ref_loader import recalibrate_ref_bn, ref_model

    assert jax.default_backend() != "cpu", "needs the TPU visible"
    cpu = jax.devices("cpu")[0]

    ref_mod, ref_cls, our_name, kwargs = compare.CONFIGS[name]
    ours = compare.build_ours(name)
    ref = ref_model(ref_mod, ref_cls, **kwargs)
    recalibrate_ref_bn(ref, image_size=224)
    ours.load_torch_state_dict(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)

    with config.parity_mode():
        with jax.default_device(cpu):
            p_cpu = jax.device_put(ours.params, cpu)
            out_c, probes_c = capture(ours.apply, p_cpu, jnp.asarray(x))
            probes_c = [(t, np.asarray(v)) for t, v in probes_c]
            out_c = np.asarray(out_c)
        out_t, probes_t = capture(
            ours.apply, jax.device_put(ours.params), jnp.asarray(x)
        )

    @jax.jit
    def stats(a, b):
        d = jnp.abs(a - b)
        rel = d / jnp.maximum(jnp.abs(b), 1e-6)
        return d.max(), rel.max(), jnp.abs(b).max()

    print(f"== {name}: accumulated CPU-vs-TPU drift per stage ==")
    rows = []
    for (tag, v_t), (tag_c, v_c) in zip(probes_t, probes_c):
        assert tag == tag_c
        ma, mr, sc = (float(s) for s in stats(v_t, jax.device_put(jnp.asarray(v_c))))
        rows.append((tag, ma, mr, sc))
        print(f"{tag:>12}: max_abs {ma:.3e}  max_rel {mr:.3e}  scale {sc:.3e}")
    ma, mr, sc = (float(s) for s in stats(out_t, jax.device_put(jnp.asarray(out_c))))
    print(f"{'logits':>12}: max_abs {ma:.3e}  max_rel {mr:.3e}  scale {sc:.3e}")
    return rows


def op_probes():
    """Name the per-op fp32 error: each primitive on CPU vs TPU."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from jittor_mlp_tpu import config

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(2)

    def drift(fn, *args):
        with config.parity_mode():
            with jax.default_device(cpu):
                want = np.asarray(jax.jit(fn)(*[
                    jax.device_put(jnp.asarray(a), cpu) for a in args
                ]))
            got = jax.jit(fn)(*[jax.device_put(jnp.asarray(a)) for a in args])

            @jax.jit
            def rel(a, b):
                return (jnp.abs(a - b) / jnp.maximum(jnp.abs(b), 1e-6)).max()

            return float(rel(got, jax.device_put(jnp.asarray(want))))

    x = rng.standard_normal((2, 56, 56, 96)).astype(np.float32)
    w = (rng.standard_normal((96, 96)) / np.sqrt(96)).astype(np.float32)
    v = np.abs(rng.standard_normal((2, 56, 56, 1))).astype(np.float32) + 0.1

    print("== op micro-probes (max rel, CPU vs TPU, f32 highest) ==")
    print(f"mean over HWC   : {drift(lambda a: a.mean(axis=(1, 2, 3)), x):.3e}")
    print(f"var two-pass    : "
          f"{drift(lambda a: jnp.mean(jnp.square(a - a.mean((1, 2, 3), keepdims=True)), (1, 2, 3)), x):.3e}")
    print(f"lax.rsqrt       : {drift(lambda a: lax.rsqrt(a), v):.3e}")
    print(f"1/sqrt          : {drift(lambda a: 1.0 / jnp.sqrt(a), v):.3e}")
    print(f"matmul (96)     : {drift(lambda a, b: jnp.matmul(a, b, precision='highest'), x, w):.3e}")
    print(f"gelu (erf)      : {drift(lambda a: jax.nn.gelu(a, approximate=False), x):.3e}")
    print(f"tanh            : {drift(lambda a: jnp.tanh(a), x):.3e}")
    gw = np.ones((96,), np.float32)
    def gnorm(a, wt):
        mu = a.mean(axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(a - mu), axis=(1, 2, 3), keepdims=True)
        return (a - mu) * lax.rsqrt(var + 1e-5) * wt
    print(f"group_norm g=1  : {drift(gnorm, x, gw):.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="as_mlp")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ops-only", action="store_true")
    args = ap.parse_args()
    if not args.ops_only:
        stage_bisect(args.model, args.batch)
    op_probes()
