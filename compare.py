"""Parity + speed harness — the TPU-native equivalent of the reference's
compare.py (/root/reference/compare.py).

Where the reference builds a model in PyTorch and Jittor, copies weights, and
asserts mean relative error < 1e-3 with an FPS comparison (compare.py:140-186),
this harness builds the torch reference model (CPU) and the jittor_mlp_tpu
model, imports the state_dict, reports max/mean deviation against the ≤1e-4
target, and times the JAX forward with the scalar-fetch sync protocol
(see bench.py for why block_until_ready is insufficient on this runtime).

Usage:
  python compare.py --model mlp_mixer [--batch 32] [--iters 100] [--device tpu]
  python compare.py --all --json results.json
  python compare.py --list

Parity gate: strict max-abs OR max-rel ≤ 1e-4, full size, no escapes. For
BN-bearing models the reference's running stats are first recalibrated on a
few batches (ref_loader.recalibrate_ref_bn) — untrained mean=0/var=1 stats
let activation scale cascade to ~1e5 in eval mode, where absolute error is
meaningless; with calibrated stats every model meets the strict gate on CPU.
With --device tpu the same strict gate passes 23/23 (PARITY_TPU.md):
under parity_mode (precision=highest) with on-device diff statistics the
worst on-chip row is ConvMixer at 7.3e-5 max-abs; see PARITY_TPU.md's
numerics note for the per-op attribution of the residual drift.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

# model name -> (ref module, ref class, our factory name, kwargs) using the
# reference harness's benchmark configs (compare.py:35-138) scaled as given.
CONFIGS = {
    # Mixer-B/16 — the driver metric model (BASELINE.json configs[0])
    "mlp_mixer": ("mlp_mixer", "MLPMixerForImageClassification",
                  "MLPMixerForImageClassification",
                  dict(image_size=224, patch_size=16, d_model=768, depth=12)),
    "g_mlp": ("g_mlp", "gMLPForImageClassification", "gMLPForImageClassification",
              dict(image_size=224, patch_size=16, d_model=256, d_ffn=1536, depth=30)),
    # ResMLP-S24 (BASELINE.json configs[1])
    "res_mlp": ("res_mlp", "ResMLPForImageClassification",
                "ResMLPForImageClassification",
                dict(image_size=224, patch_size=16, d_model=384, depth=24)),
    "vip": ("vip", "ViP", "ViP",
            dict(image_size=224, patch_size=14, d_model=256, depth=30, segments=16,
                 weighted=True)),
    # ConvMixer-768/32 (BASELINE.json configs[2])
    "conv_mixer": ("conv_mixer", "ConvMixer", "ConvMixer",
                   dict(dim=768, depth=32, kernel_size=7, patch_size=7)),
    "s2_mlp_v2": ("s2_mlp_v2", "S2MLPv2", "S2MLPv2",
                  dict(image_size=224, patch_size=[7, 2], d_model=[192, 384],
                       depth=[4, 14], expansion_factor=[3, 3])),
    "sparse_mlp": ("sparse_mlp", "SparseMLP", "SparseMLP", dict()),
    "hire_mlp": ("hire_mlp", "HireMLP", "HireMLP", dict()),
    "gfnet": ("gfnet", "GFNet", "GFNet", dict()),
    # GFNet-H-B (BASELINE.json configs[4]): hierarchical pyramid variant
    "gfnet_h_b": ("gfnet", "GFNetPyramid", "GFNetPyramid",
                  dict(embed_dim=[96, 192, 384, 768], depth=[3, 3, 27, 3],
                       init_values=1e-6)),
    "cycle_mlp": ("cycle_mlp", "CycleMLP_B2", "CycleMLP_B2", dict()),
    "as_mlp": ("as_mlp", "AS_MLP", "AS_MLP", dict()),
    "swin_mlp": ("swin_mlp", "SwinMLP", "SwinMLP", dict(drop_path_rate=0.0)),
    "repmlpnet": ("repmlpnet", "create_RepMLPNet_B224", "create_RepMLPNet_B224", dict()),
    "wave_mlp": ("wave_mlp", "WaveMLP", "WaveMLP", dict(model_name="T")),
    "ms_mlp": ("ms_mlp", "MS_MLP", "MS_MLP", dict(drop_path_rate=0.0)),
    "morph_mlp": ("morph_mlp", "MorphMLP", "MorphMLP", dict(model_name="T")),
    "dyna_mlp": ("dyna_mlp", "DynaMixer", "DynaMixer", dict(model_name="T")),
    "sequencer": ("sequencer", "Sequencer2D", "Sequencer2D", dict(model_name="S")),
    "active_mlp": ("active_mlp", "ActivexTiny", None, dict()),
    "s2_mlp_v1": ("s2_mlp_v1", "S2MLPv1_wide", "S2MLPv1_wide", dict()),
    "conv_mlp": ("conv_mlp", "convmlp_m", "convmlp_m", dict()),  # ConvMLP-M (configs[2])
    "raft_mlp": ("raft_mlp", "RaftMLP", "RaftMLP",
                 dict(layers=[
                     {"depth": 2, "dim": 64, "patch_size": 4, "raft_size": 2},
                     {"depth": 2, "dim": 128, "patch_size": 2, "raft_size": 2},
                 ])),
}


def build_ours(name):
    import jittor_mlp_tpu as jm

    ref_mod, ref_cls, our_name, kwargs = CONFIGS[name]
    factory = getattr(jm, our_name) if our_name else getattr(
        jm.models.active_mlp, ref_cls
    )
    return factory(**kwargs)


def run_parity(name, batch=2, image_size=224, cache_ref=None):
    """Full-size strict parity for one config; returns a metrics dict.

    Gate: max-abs OR max-rel ≤ 1e-4 (stricter than the reference's own
    mean-rel < 1e-3 acceptance, /root/reference/compare.py:179-186). BN
    running stats are recalibrated on the reference first (see module
    docstring), then imported, so the scales are sane and the strict gate
    is meaningful.

    ``cache_ref``: directory caching the torch side (recalibrated
    state_dict + reference output for the deterministic seed-1 input), so
    the on-chip sweep doesn't re-pay the host-CPU reference forwards the
    CPU sweep already ran.
    """
    import os

    import torch

    from jittor_mlp_tpu import config

    ref_mod, ref_cls, our_name, kwargs = CONFIGS[name]
    ours = build_ours(name)
    cache = None
    if cache_ref:
        os.makedirs(cache_ref, exist_ok=True)
        cache = os.path.join(cache_ref, f"{name}_{image_size}_{batch}.pt")
    if cache and os.path.exists(cache):
        blob = torch.load(cache, map_location="cpu", weights_only=False)
        want = blob["want"]
        recalibrated = blob["recalibrated"]
        t_ref = blob["t_ref"]
        ours.load_torch_state_dict(blob["sd"])
    else:
        from ref_loader import recalibrate_ref_bn, ref_model

        if name in ("s2_mlp_v1", "s2_mlp_v2"):
            # torch-CPU cascades on the reference's overlapping in-place
            # shifts (UB); patch in the functional semantics the Jittor
            # reference executes — pinned bit-exactly by the golden
            # statement-semantics emulation in tests/test_s2_jittor_golden.py
            from test_vip_s2mlp import _patch_s2_shifts

            _patch_s2_shifts()
        ref = ref_model(ref_mod, ref_cls, **kwargs)
        recalibrated = recalibrate_ref_bn(ref, image_size=image_size)
        ours.load_torch_state_dict(ref.state_dict())
        torch.manual_seed(1)
        xr = torch.randn(batch, 3, image_size, image_size)
        with torch.no_grad():
            t0 = time.perf_counter()
            want = ref(xr).numpy()
            t_ref = time.perf_counter() - t0
        if cache:
            torch.save(
                {"want": want, "sd": ref.state_dict(),
                 "recalibrated": recalibrated, "t_ref": t_ref},
                cache,
            )
    torch.manual_seed(1)  # deterministic input — identical on cache hits
    x = torch.randn(batch, 3, image_size, image_size)
    with config.parity_mode():
        got = ours(x)

    # diff statistics computed ON the executing device, fetching scalars
    # only: bulk device→host transfers over the tunneled-TPU runtime are
    # pathologically slow, and the logits never need to leave the chip
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _stats(got, want):
        diff = jnp.abs(got - want)
        rel = diff / jnp.maximum(jnp.abs(want), 1e-6)
        # also the reference's own acceptance metric for comparison:
        # mean relative error on outputs+1 (compare.py:179-186)
        ref_rel = jnp.mean(diff / jnp.maximum(jnp.abs(want + 1), 1e-6))
        # one stacked fetch: each device→host round-trip over the tunnel
        # costs seconds, so never fetch the five stats separately
        return jnp.stack([diff.max(), diff.mean(), rel.max(), ref_rel,
                          jnp.abs(want).max()])

    max_abs, mean_abs, max_rel, ref_rel, out_scale = (
        float(s)
        for s in np.asarray(_stats(got, jax.device_put(jnp.asarray(want))))
    )
    return {
        "model": name,
        "params": ours.param_count(),
        "max_abs": max_abs,
        "mean_abs": mean_abs,
        "max_rel": max_rel,
        "ref_mean_rel": ref_rel,
        "out_scale": out_scale,
        "bn_recalibrated": bool(recalibrated),
        "parity_ok": bool(max_abs < 1e-4 or max_rel < 1e-4),
        "torch_cpu_fwd_ms": t_ref * 1e3,
        "fast_compile": bool(config.fast_compile),
    }


def run_throughput(name, batch=32, iters=20, image_size=224, int8=False):
    """bf16 images/sec via the shared scalar-fetch protocol (utils/timing.py).

    ``int8=True`` measures the dynamic W8A8 serving path instead
    (config.int8_mode: dense contractions as int8×int8→int32 on the MXU)."""
    from contextlib import nullcontext

    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.utils.timing import throughput

    ours = build_ours(name)
    ours.to_bf16()
    with config.bf16_mode(), (config.int8_mode() if int8 else nullcontext()):
        return throughput(
            ours.apply, ours.params,
            (batch, 3, image_size, image_size),
            iters=iters,
        )


def run_serving_numerics(name, batch=64, image_size=224):
    """Serving-precision audit: one deterministic batch, three precisions.

    f32 logits under ``config.parity_mode()`` are the audited ground truth
    (PARITY_TPU.md gates that path against the torch reference at ≤1e-4 —
    /root/reference/compare.py:179-186 is the analogous acceptance); bf16 is
    the serving default (``config.bf16_mode`` + bf16 params); int8 stacks
    ``config.int8_mode`` (dynamic W8A8) on top. Reports abs deviation
    normalized by the f32 logit absmax plus top-1 argmax agreement for
    bf16-vs-f32, int8-vs-f32 and int8-vs-bf16. All statistics are computed
    on the executing device and fetched as one stacked scalar read (bulk
    device→host transfers over the tunneled runtime cost seconds)."""
    import jax
    import jax.numpy as jnp

    from jittor_mlp_tpu import config

    ours = build_ours(name)
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal(
        (batch, 3, image_size, image_size)).astype(np.float32))

    with config.parity_mode():
        f32 = ours(x)
    ours.to_bf16()
    with config.bf16_mode():
        b16 = ours(x)
    with config.bf16_mode(), config.int8_mode():
        q8 = ours(x)

    @jax.jit
    def _stats(f32, b16, q8):
        f = f32.astype(jnp.float32)
        b = b16.astype(jnp.float32)
        q = q8.astype(jnp.float32)
        scale = jnp.maximum(jnp.abs(f).max(), 1e-6)
        af, ab, aq = f.argmax(-1), b.argmax(-1), q.argmax(-1)
        agree = lambda u, v: jnp.mean((u == v).astype(jnp.float32))
        return jnp.stack([
            jnp.abs(b - f).max() / scale, jnp.abs(b - f).mean() / scale,
            agree(ab, af),
            jnp.abs(q - f).max() / scale, jnp.abs(q - f).mean() / scale,
            agree(aq, af), agree(aq, ab),
        ])

    (bf16_max, bf16_mean, bf16_agree, int8_max, int8_mean, int8_agree,
     int8_agree_bf16) = (float(s) for s in np.asarray(_stats(f32, b16, q8)))
    return {
        "numerics_batch": batch,
        "bf16_max_rel": bf16_max, "bf16_mean_rel": bf16_mean,
        "bf16_argmax_agree": bf16_agree,
        "int8_max_rel": int8_max, "int8_mean_rel": int8_mean,
        "int8_argmax_agree": int8_agree,
        "int8_argmax_agree_vs_bf16": int8_agree_bf16,
    }


def run_train_throughput(name, batch=32, iters=10, image_size=224,
                         try_remat=False):
    """Mixed-precision training img/s: full fwd+bwd+adamw steps inside one
    jitted fori_loop (f32 masters, bf16 compute — the production recipe),
    timed t(N)−t(1) with a scalar fetch. Models whose backward doesn't fit
    HBM retry under config.remat_mode() (zoo-wide block checkpointing);
    returns (img_s, remat_used).

    ``try_remat=True`` measures the remat step even when the plain one fits
    and reports whichever is faster: recomputing blocks can BEAT storing
    their activations when the stored intermediates have TPU-hostile
    layouts (measured on dyna_mlp: 301 plain vs 394 img/s remat — the
    backward of 16k-batched 16×16 matmuls reloads tiny-tile buffers at
    worse cost than re-running the forward)."""
    from jittor_mlp_tpu import config as _cfg

    try:
        plain = _run_train_throughput(name, batch, iters, image_size)
        if try_remat:
            with _cfg.remat_mode():
                rem = _run_train_throughput(name, batch, iters, image_size)
            if rem > plain:
                return rem, True
        return plain, False
    except Exception as e:
        # retry ONLY explicit memory failures — anything else is a real bug
        # whose original error must surface, not a mislabeled '(remat)' rerun
        # (a generic compile-helper match here once relabeled compile bugs
        # as OOM; the original exception still chains via __context__ if the
        # remat retry fails too)
        msg = str(e)
        if not any(k in msg for k in (
            "RESOURCE_EXHAUSTED", "hbm", "HBM", "Ran out of memory",
        )):
            raise
        with _cfg.remat_mode():
            return _run_train_throughput(name, batch, iters, image_size), True


def _run_train_throughput(name, batch, iters, image_size):
    import optax

    import jax
    import jax.numpy as jnp
    from jax import lax

    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.parallel.train import (
        cast_floating,
        cross_entropy_loss,
        merge_params,
        split_params,
    )

    ours = build_ours(name)
    optimizer = optax.adamw(1e-4)
    apply = ours.apply
    train0, aux, treedef, n = split_params(ours.params)
    opt0 = optimizer.init(train0)

    with config.bf16_mode():

        @jax.jit
        def run(train, opt_state, steps):
            x = jax.random.normal(
                jax.random.PRNGKey(0), (batch, 3, image_size, image_size),
                jnp.float32,
            )
            labels = jnp.zeros((batch,), jnp.int32)

            def body(i, carry):
                train, opt_state, acc = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(1), i)

                def loss_fn(train):
                    full = merge_params(train, aux, treedef, n)
                    full = cast_floating(full, jnp.bfloat16)
                    xi = (x + acc * 1e-8).astype(jnp.bfloat16)
                    logits = apply(full, xi, train=True, rng=rng)
                    return cross_entropy_loss(logits, labels)

                loss, grads = jax.value_and_grad(loss_fn)(train)
                updates, opt_state = optimizer.update(grads, opt_state, train)
                return optax.apply_updates(train, updates), opt_state, acc + loss

            _, _, acc = lax.fori_loop(
                0, steps, body, (train, opt_state, jnp.float32(0.0))
            )
            return acc

        def timed(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = np.asarray(run(train0, opt0, k))
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), f"{name}: non-finite training loss"
            return best

        timed(1)
        dt = timed(iters) - timed(1)
        if dt <= 0:  # per-step time below dispatch noise: widen the window
            iters *= 4
            dt = timed(iters) - timed(1)
        assert dt > 0, f"{name}: unstable train timing (dt={dt:.4f}s)"
        return batch * (iters - 1) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp_mixer")
    ap.add_argument("--all", action="store_true", help="run every config")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-throughput", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="also measure mixed-precision training img/s")
    ap.add_argument("--int8", action="store_true",
                    help="also measure forward throughput under "
                         "config.int8_mode (dynamic W8A8 serving path)")
    ap.add_argument("--serving-numerics", action="store_true",
                    help="also audit bf16/int8 serving logits vs the f32 "
                         "parity-mode forward (deviation + argmax agreement)")
    ap.add_argument("--try-remat", action="store_true",
                    help="with --train: also measure the remat step and "
                         "report the faster of the two")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="append one JSON record per model to PATH "
                         "(machine-readable BENCHMARKS sweep)")
    ap.add_argument("--cache-ref", default=None, metavar="DIR",
                    help="cache the torch-reference side (state_dict + "
                         "output) per config in DIR")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    if args.list:
        print("\n".join(sorted(CONFIGS)))
        return

    if args.all:
        import subprocess

        if args.json:
            open(args.json, "w").close()  # children append
        base = [a for a in sys.argv[1:] if a != "--all" and not a.startswith("--model")]
        rc = 0
        for name in sorted(CONFIGS):
            r = subprocess.run([sys.executable, __file__, "--model", name, *base])
            rc = rc or r.returncode
        sys.exit(rc)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from jittor_mlp_tpu import config

    config.enable_compile_cache()

    print(f"== {args.model} ==")
    record = {"model": args.model}
    if not args.skip_parity:
        record.update(run_parity(args.model, image_size=args.image_size,
                                 cache_ref=args.cache_ref))
        status = "OK" if record["parity_ok"] else "FAIL"
        print(f"params: {record['params']:,}")
        print(f"parity: max abs {record['max_abs']:.3e}  "
              f"mean abs {record['mean_abs']:.3e}  "
              f"max rel {record['max_rel']:.3e}  "
              f"ref-mean-rel {record['ref_mean_rel']:.3e}  [{status}]  "
              f"(torch cpu fwd {record['torch_cpu_fwd_ms']:.0f} ms"
              f"{', bn recalibrated' if record['bn_recalibrated'] else ''})")

    if not args.skip_throughput:
        fps = run_throughput(args.model, batch=args.batch, iters=args.iters,
                             image_size=args.image_size)
        record.update(fps=fps, batch=args.batch,
                      backend=jax.default_backend())
        print(f"throughput: {fps:,.0f} images/sec (batch {args.batch}, "
              f"{args.iters} iters, {jax.default_backend()})")
        if args.int8:
            qfps = run_throughput(args.model, batch=args.batch,
                                  iters=args.iters,
                                  image_size=args.image_size, int8=True)
            record.update(int8_fps=qfps)
            print(f"int8 throughput: {qfps:,.0f} images/sec "
                  f"(dynamic W8A8, {qfps / fps:.2f}x bf16)")

    if args.serving_numerics:
        nrec = run_serving_numerics(args.model, image_size=args.image_size)
        record.update(nrec)
        print(f"bf16 vs f32: max {nrec['bf16_max_rel']:.2e} "
              f"mean {nrec['bf16_mean_rel']:.2e} "
              f"argmax {100 * nrec['bf16_argmax_agree']:.1f}%  |  "
              f"int8 vs f32: max {nrec['int8_max_rel']:.2e} "
              f"argmax {100 * nrec['int8_argmax_agree']:.1f}% "
              f"(vs bf16 {100 * nrec['int8_argmax_agree_vs_bf16']:.1f}%)")

    if args.train:
        try:
            tfps, remat = run_train_throughput(
                args.model, batch=args.batch, iters=max(args.iters // 2, 5),
                image_size=args.image_size, try_remat=args.try_remat,
            )
            record.update(train_fps=tfps, train_batch=args.batch,
                          train_remat=remat)
            print(f"train: {tfps:,.0f} images/sec (mixed precision, "
                  f"batch {args.batch}"
                  f"{', block remat' if remat else ''})")
        except Exception as e:  # OOM etc. — record, don't kill the sweep
            record.update(train_error=str(e).split("\n")[0][:200])
            print(f"train: ERROR {record['train_error']}")

    if args.json:
        import json

        with open(args.json, "a") as f:
            f.write(json.dumps(record) + "\n")
    if not record.get("parity_ok", True):
        sys.exit(1)


if __name__ == "__main__":
    main()
