"""End-to-end training example: any zoo model on synthetic (or real) data.

Demonstrates the full framework loop the reference never had (SURVEY §0: the
reference is an inference-only zoo): native-C++ host batch prep (or on-device
preprocessing), DP×TP mesh sharding, jitted train step with stochastic depth,
periodic eval.

  python examples/train.py --model MLPMixerForImageClassification \
      --image-size 64 --batch 64 --steps 50

With --data-dir pointing at an ImageFolder-style tree (class subdirectories
of images), batches come from data.ImageFolderDataset through the prefetching
BatchIterator and the jit-compiled on-device augmentation (random crop +
flip + normalize); otherwise synthetic class-separable data is used.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MLPMixerForImageClassification")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--pipeline-stages", type=int, default=0,
                    help="GPipe pipeline parallelism: shard each block stack "
                         "into this many stages over the 'model' mesh axis "
                         "(20/22 families, docs/USAGE.md; overrides "
                         "--model-parallel)")
    ap.add_argument("--microbatches", type=int, default=4,
                    help="microbatches streamed through the pipeline "
                         "(--pipeline-stages only; batch must divide)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mixed-precision", action="store_true",
                    help="bf16 forward/backward, f32 master weights")
    ap.add_argument("--remat", choices=["auto", "on", "off"], default="auto",
                    help="block rematerialization: 'auto' uses the measured "
                         "best-known setting for this model "
                         "(jittor_mlp_tpu.tuned, from the on-chip train "
                         "sweep); on TPU remat is often faster, not just "
                         "smaller (docs/PERFORMANCE.md)")
    ap.add_argument("--data-dir", default=None,
                    help="ImageFolder-style dataset root (default: synthetic)")
    ap.add_argument("--metrics", default=None,
                    help="append per-step JSON metrics to this .jsonl file")
    ap.add_argument("--ckpt-dir", default=None,
                    help="orbax train-state dir: save every --ckpt-every "
                         "steps and auto-resume from it (preemption-safe)")
    ap.add_argument("--ckpt-every", type=int, default=25)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.parallel.train import (
        batch_sharding,
        init_sharded,
        make_train_step,
    )

    config.enable_compile_cache()

    kwargs = {}
    if args.model == "MLPMixerForImageClassification":
        kwargs = dict(image_size=args.image_size, patch_size=8, d_model=128,
                      depth=6, num_classes=args.classes)
    else:
        from jittor_mlp_tpu.utils import sized_kwargs

        kwargs = sized_kwargs(getattr(jm, args.model),
                              image_size=args.image_size,
                              num_classes=args.classes)
    model = getattr(jm, args.model)(**kwargs)
    print(f"{args.model}: {model.param_count():,} params")

    if args.remat == "auto":
        from jittor_mlp_tpu.tuned import train_settings

        ts = train_settings(args.model)
        use_remat = bool(ts and ts["remat"])
        if ts:
            print(f"remat: {'on' if use_remat else 'off'} "
                  f"(measured best, {ts['img_s']:,.0f} img/s at "
                  f"b{ts['batch']} on v5e)")
    else:
        use_remat = args.remat == "on"
    # trace-time flag: must be set before the train step's first call
    config.remat = use_remat

    n_dev = len(jax.devices())
    pp = args.pipeline_stages
    mp = pp if pp > 1 else args.model_parallel
    mesh = make_mesh((n_dev // mp) * mp, model_parallel=mp)
    optimizer = optax.adamw(args.lr)
    runner_scope = None
    if pp > 1:
        # GPipe: stages own contiguous layers of every block stack
        # ('model' axis); microbatches stream over ICI, DP over 'data'
        from jittor_mlp_tpu.parallel import (
            block_runner_scope,
            pipeline_runner,
            pipeline_shardings,
        )
        from jittor_mlp_tpu.parallel.train import split_params

        if args.batch % args.microbatches:
            raise SystemExit("--batch must divide by --microbatches")
        params = jax.device_put(
            model.params, pipeline_shardings(model.params, mesh)
        )
        train, _, _, _ = split_params(params)
        opt_state = optimizer.init(train)
        runner_scope = block_runner_scope(pipeline_runner(
            mesh, microbatches=args.microbatches, data_axis="data"
        ))
        print(f"pipeline: {pp} stages x {args.microbatches} microbatches")
    else:
        params, opt_state, _ = init_sharded(model.params, optimizer, mesh)
    bsh = batch_sharding(mesh)

    # BN running-stat EMA can't cross the pipeline runner's shard_map (and
    # GPipe's per-microbatch stats would diverge from torch's per-batch EMA);
    # freeze the buffers under PP and refresh with recalibrate_bn afterwards.
    bn_momentum = None if pp > 1 else 0.1
    if pp > 1:
        print("pipeline: BN running stats frozen (bn_momentum=None); refresh "
              "after training with train_utils.recalibrate_bn if the model "
              "uses BatchNorm")
    train_step = make_train_step(
        model.apply, optimizer,
        compute_dtype=jnp.bfloat16 if args.mixed_precision else None,
        bn_momentum=bn_momentum,
    )

    rng = jax.random.PRNGKey(0)

    if args.data_dir:
        from jittor_mlp_tpu.data import (
            BatchIterator,
            ImageFolderDataset,
            make_augment,
        )

        ds = ImageFolderDataset(
            args.data_dir, decode_size=args.image_size + args.image_size // 8
        )
        augment = make_augment(image_size=args.image_size)
        # epoch/position derive from the step (seed=epoch reshuffle), so a
        # resumed run consumes exactly the batches an uninterrupted run
        # would — the iterator fast-forwards to the resume position instead
        # of restarting the stream at epoch 0
        bpe = max(len(ds) // args.batch, 1)
        stream = {"epoch": -1, "it": None, "pos": 0}

        def make_batch(step):
            epoch, pos = divmod(step, bpe)
            if stream["epoch"] != epoch or stream["pos"] > pos:
                stream["epoch"] = epoch
                stream["it"] = iter(BatchIterator(ds, args.batch, seed=epoch))
                stream["pos"] = 0
            while stream["pos"] < pos:  # resume: skip already-consumed batches
                next(stream["it"])
                stream["pos"] += 1
            raw = next(stream["it"])
            stream["pos"] += 1
            # step-derived key: augmentation stream is resume-deterministic
            sub = jax.random.fold_in(rng, 1_000_000 + step)
            return {
                "image": jax.device_put(augment(sub, raw["image"]), bsh["image"]),
                "label": jax.device_put(jnp.asarray(raw["label"]), bsh["label"]),
            }
    else:
        # synthetic class-separable data so loss visibly descends
        rng_np = np.random.default_rng(0)
        protos = rng_np.standard_normal(
            (args.classes, 3, args.image_size, args.image_size)
        )

        def make_batch(step):
            rs = np.random.default_rng(1000 + step)  # resume-deterministic
            labels = rs.integers(0, args.classes, args.batch)
            imgs = protos[labels] + 0.5 * rs.standard_normal(
                (args.batch, 3, args.image_size, args.image_size)
            )
            return {
                "image": jax.device_put(jnp.asarray(imgs, jnp.float32), bsh["image"]),
                "label": jax.device_put(jnp.asarray(labels), bsh["label"]),
            }

    logger = None
    if args.metrics:
        from jittor_mlp_tpu.utils.metrics import MetricsLogger

        logger = MetricsLogger(
            args.metrics, extra={"model": args.model, "batch": args.batch}
        )

    start = 0
    ckpt_dir = None
    if args.ckpt_dir:
        import os as _os
        import shutil as _shutil

        from jittor_mlp_tpu.utils.serialization import (
            restore_train_state,
            save_train_state,
        )

        if args.ckpt_every < 1:
            raise SystemExit("--ckpt-every must be >= 1")
        ckpt_dir = _os.path.abspath(args.ckpt_dir)
        _os.makedirs(ckpt_dir, exist_ok=True)

        def _step_dirs():
            return sorted(
                d for d in _os.listdir(ckpt_dir) if d.startswith("step_")
            )

        have = _step_dirs()
        if have:
            latest = _os.path.join(ckpt_dir, have[-1])
            params, opt_state, start = restore_train_state(
                latest, params, opt_state
            )
            start = int(start)
            print(f"resumed from {latest} at step {start}")

        def save_ckpt(step1):
            # step-numbered dirs: orbax finalizes each atomically, and the
            # previous checkpoint is only pruned AFTER the new one exists —
            # a preemption mid-save can never destroy the only checkpoint
            save_train_state(
                _os.path.join(ckpt_dir, f"step_{step1:08d}"),
                params, opt_state, step1,
            )
            for d in _step_dirs()[:-2]:
                _shutil.rmtree(_os.path.join(ckpt_dir, d), ignore_errors=True)

    t0 = time.time()
    t_step = time.time()
    import contextlib

    with mesh, (runner_scope or contextlib.nullcontext()):
        for step in range(start, args.steps):
            # per-step derivation (not split-chaining) so a resumed run's
            # dropout/augment stream is identical to an uninterrupted one
            sub = jax.random.fold_in(rng, step)
            params, opt_state, loss = train_step(
                params, opt_state, make_batch(step), sub
            )
            if logger is not None:
                now = time.time()
                logger.log(step, loss=float(loss),
                           images_per_sec=args.batch / max(now - t_step, 1e-9))
                t_step = now
            if step % 10 == 0 or step == args.steps - 1:
                print(f"step {step:4d}  loss {float(loss):.4f}")
            if ckpt_dir and ((step + 1) % args.ckpt_every == 0
                             or step == args.steps - 1):
                save_ckpt(step + 1)
    if logger is not None:
        logger.flush()
    print(f"{args.steps - start} steps in {time.time()-t0:.1f}s "
          f"on {n_dev} device(s)")


if __name__ == "__main__":
    main()
