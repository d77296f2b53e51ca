"""Gradient parity vs torch autograd, fp64 on CPU (run as a subprocess).

The reference zoo is inference-only, but our framework adds a trainer
(parallel/train.py); this check pins its backward correctness directly
against torch autograd instead of only fused-vs-plain agreement. Executed in
its own process so jax_enable_x64 never leaks into the main pytest run.

For one LN model (MLP-Mixer) and one BN model (WaveMLP):
  (a) elementwise dL/dx parity — exercises every layer's backward rule;
  (b) parameter-space directional derivatives dL/dθ·v (torch-gradient
      direction + random directions): our side is jax.jvp with the exact
      tangent import(θ+v) − import(θ). These models' importers are linear
      weight-layout reshuffles (reshape/transpose/stack), so this equals the
      pushforward of v through the import map with no finite-difference
      noise (central differences plateaued at ~1e-4 relative; jvp agrees
      with torch to ~1e-8).
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import torch

TOL = 1e-5


def check_model(name, ref, ours, input_shape, n_random_dirs=2):
    from jittor_mlp_tpu import config

    ref = ref.double().eval()
    ours.load_torch_state_dict(ref.state_dict())
    assert next(iter(jax.tree.leaves(ours.params))).dtype == jnp.float64

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal(input_shape)
    x_t = torch.tensor(x_np, requires_grad=True)
    out_t = ref(x_t)
    w_np = rng.standard_normal(tuple(out_t.shape))
    loss_t = (out_t * torch.tensor(w_np)).sum()
    loss_t.backward()
    gx_t = x_t.grad.numpy()

    w_j = jnp.asarray(w_np)
    apply = ours.apply

    def loss_fn(params, x):
        return jnp.sum(apply(params, x) * w_j)

    x_j = jnp.asarray(x_np)
    with config.parity_mode():
        lj, gx_j = jax.value_and_grad(loss_fn, argnums=1)(ours.params, x_j)

    l_err = abs(float(lj) - float(loss_t)) / max(1.0, abs(float(loss_t)))
    assert l_err <= TOL, f"{name}: loss mismatch rel {l_err:.3e}"

    gx_err = float(np.abs(np.asarray(gx_j) - gx_t).max())
    gx_scale = max(float(np.abs(gx_t).max()), 1e-12)
    assert gx_err <= TOL * gx_scale, (
        f"{name}: input-grad max abs {gx_err:.3e} vs scale {gx_scale:.3e}"
    )
    print(f"{name}: loss rel {l_err:.2e}, input-grad {gx_err/gx_scale:.2e} rel — ok")

    # (b) directional derivatives in torch parameter space
    g_t = {n: p.grad.detach().clone() for n, p in ref.named_parameters()
           if p.grad is not None}
    base = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    def normalized(v):
        norm = torch.sqrt(sum((vi ** 2).sum() for vi in v.values()))
        return {k: vi / norm for k, vi in v.items()}

    tgen = torch.Generator().manual_seed(11)
    dirs = [("grad", normalized(g_t))]
    for i in range(n_random_dirs):
        dirs.append((f"rand{i}", normalized({
            k: torch.randn(v.shape, generator=tgen, dtype=torch.float64)
            for k, v in g_t.items()
        })))

    p_base = ours.params
    for dname, v in dirs:
        dot_t = float(sum((g_t[n] * v[n]).sum() for n in v))
        sd_plus = {k: (base[k] + v[k] if k in v else base[k]) for k in base}
        p_plus = ours.load_torch_state_dict(sd_plus).params
        tangent = jax.tree.map(lambda a, b: b - a, p_base, p_plus)
        with config.parity_mode():
            _, dL = jax.jvp(lambda p: loss_fn(p, x_j), (p_base,), (tangent,))
        err = abs(float(dL) - dot_t) / max(1.0, abs(dot_t))
        assert err <= TOL, (
            f"{name}/{dname}: dL·v torch {dot_t:.8e} vs ours {float(dL):.8e} "
            f"(rel {err:.3e})"
        )
        print(f"{name}: dL·v[{dname}] rel err {err:.2e} — ok")
    ours.load_torch_state_dict(base)


def main():
    from ref_loader import load_ref, ref_model

    import jittor_mlp_tpu as jm
    import jittor_mlp_tpu.models.wave_mlp as jm_wave

    # LN model: MLP-Mixer (cites /root/reference/models_pytorch/mlp_mixer.py)
    kwargs = dict(image_size=32, patch_size=8, d_model=32, depth=2,
                  num_classes=10)
    check_model(
        "mlp_mixer",
        ref_model("mlp_mixer", "MLPMixerForImageClassification", **kwargs),
        jm.MLPMixerForImageClassification(use_pallas=False, **kwargs),
        (2, 3, 32, 32),
    )

    # BN model: WaveMLP (cites /root/reference/models_pytorch/wave_mlp.py);
    # small settings injected on both sides as in tests/test_morph_wave_dyna.py
    WAVE_XS = [[1, 1, 1, 1], [2, 2, 2, 2]]
    load_ref("wave_mlp").wavemlp_settings["XS"] = WAVE_XS
    jm_wave.wavemlp_settings["XS"] = WAVE_XS
    check_model(
        "wave_mlp",
        ref_model("wave_mlp", "WaveMLP", model_name="XS", num_classes=10),
        jm.WaveMLP(model_name="XS", num_classes=10),
        (2, 3, 64, 64),
    )

    # deformable model: CycleMLP (cites /root/reference/models_pytorch/
    # cycle_mlp.py) — pins the masked-matmul CycleFC lowering's backward
    # against torch autograd through deform_conv2d
    cyc = dict(layers=[1, 2], embed_dims=[16, 32], transitions=[True, True],
               mlp_ratios=[2, 2], num_classes=10)
    check_model(
        "cycle_mlp",
        ref_model("cycle_mlp", "CycleNet", **cyc),
        jm.models.cycle_mlp.CycleNet(**cyc),
        (2, 3, 32, 32),
    )

    # recurrent model: Sequencer2D (cites /root/reference/models_pytorch/
    # sequencer.py) — pins the lax.scan BiLSTM backward against cuDNN-layout
    # torch LSTM autograd
    import jittor_mlp_tpu.models.sequencer as jm_seq

    SEQ_XS = [[1, 1], [16, 32], [8, 8], 2]
    load_ref("sequencer").sequencer_settings["XS"] = SEQ_XS
    jm_seq.sequencer_settings["XS"] = SEQ_XS
    check_model(
        "sequencer",
        ref_model("sequencer", "Sequencer2D", model_name="XS", num_classes=10),
        jm.Sequencer2D(model_name="XS", num_classes=10),
        (2, 3, 28, 28),
    )

    # shift model: AS-MLP (cites /root/reference/models_pytorch/as_mlp.py) —
    # pins the axial-shift backward (the functional lowering whose Pallas
    # custom VJP mirrors it on TPU, ops/pallas/shift_kernel.py)
    askw = dict(img_size=32, patch_size=4, embed_dim=16, depths=[1, 1],
                shift_size=3, mlp_ratio=2.0, num_classes=10,
                drop_path_rate=0.0)
    check_model(
        "as_mlp",
        ref_model("as_mlp", "AS_MLP", **askw),
        jm.AS_MLP(**askw),
        (2, 3, 32, 32),
    )

    # offset-gather model: ActiveMLP (cites /root/reference/models_pytorch/
    # active_mlp.py) — pins the hat-function bilinear contraction backward
    # (ops/deform.py:161-201) against torch autograd through the ATM op
    # depths ≥ 2 per stage: the reference only generates an offset at blocks
    # with j % intv == 0 and j != depth-1 (active_mlp.py:332-339), so a
    # 1-block stage would use `offset` unbound
    actkw = dict(img_size=32, patch_size=4, depths=[2, 2],
                 embed_dims=[16, 32], mlp_ratios=[2, 2], share_dims=[1, 1],
                 num_classes=10)
    check_model(
        "active_mlp",
        ref_model("active_mlp", "ActiveMLP", **actkw),
        jm.models.active_mlp.ActiveMLP(**actkw),
        (2, 3, 32, 32),
    )
    print("grad parity ok")


if __name__ == "__main__":
    main()
