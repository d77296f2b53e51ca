"""Serving-precision audit through the real pretrained-checkpoint flow.

PARITY_BF16.md's zoo-wide rows measure bf16/int8 numerics at random init
(untrained BN running stats, clustered logits — pessimistic argmax
agreement). This audits the three families with a published pretrained
contract (conv_mlp.py:278-285, wave_mlp.py:147-148, morph_mlp.py:150-151
in the reference) through the FULL offline checkpoint path instead:

  torch reference → recalibrate_ref_bn (trained-like running stats) →
  state_dict .pth staged in JITTOR_MLP_TPU_CKPT_DIR → ``pretrained=``
  import → f32-parity / bf16 / dynamic-W8A8 forward on one deterministic
  batch.

This container has zero network egress, so the actual ImageNet weights
behind those URLs are unobtainable here; the staged checkpoint carries
calibrated BN statistics and the full weight-import round trip, which is
everything the flow exercises short of the trained values themselves.
Rows are marked with that provenance when merged into PARITY_BF16.md.

    python tools/ckpt_numerics.py            # all three families
    python tools/ckpt_numerics.py conv_mlp   # one family
"""

import json
import os
import sys
import tempfile

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

FAMILIES = {
    # name → (ref module, ref class, ref kwargs, our factory, our kwargs, ckpt)
    "conv_mlp": ("conv_mlp", "convmlp_s", {}, "convmlp_s",
                 {"pretrained": True}, "convmlp_s_imagenet.pth"),
    "wave_mlp": ("wave_mlp", "WaveMLP", {"model_name": "T"}, "WaveMLP",
                 {"model_name": "T", "pretrained": "wavemlp_t.pth"},
                 "wavemlp_t.pth"),
    "morph_mlp": ("morph_mlp", "MorphMLP", {"model_name": "T"}, "MorphMLP",
                  {"model_name": "T", "pretrained": "morphmlp_t.pth"},
                  "morphmlp_t.pth"),
}


def audit(name, batch=64, image_size=224):
    import torch

    from ref_loader import recalibrate_ref_bn, ref_model

    import jax
    import jax.numpy as jnp
    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config

    ref_mod, ref_cls, ref_kw, ours_fac, ours_kw, fname = FAMILIES[name]
    ref = ref_model(ref_mod, ref_cls, **ref_kw)
    recalibrate_ref_bn(ref)
    with tempfile.TemporaryDirectory() as d:
        sd = ref.state_dict()
        torch.save({"model": sd} if name != "conv_mlp" else sd,
                   os.path.join(d, fname))
        os.environ["JITTOR_MLP_TPU_CKPT_DIR"] = d
        try:
            ours = getattr(jm, ours_fac)(**ours_kw)
        finally:
            del os.environ["JITTOR_MLP_TPU_CKPT_DIR"]

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
        agree = lambda u, v: jnp.mean((u == v).astype(jnp.float32))  # noqa: E731
        return jnp.stack([
            jnp.abs(b - f).max() / scale, agree(ab, af),
            jnp.abs(q - f).max() / scale, agree(aq, af), agree(aq, ab),
        ])

    s = [float(v) for v in np.asarray(_stats(f32, b16, q8))]
    return {
        "model": name, "provenance": "staged-ckpt (recalibrated BN, imported)",
        "numerics_batch": batch,
        "bf16_max_rel": s[0], "bf16_argmax_agree": s[1],
        "int8_max_rel": s[2], "int8_argmax_agree": s[3],
        "int8_argmax_agree_vs_bf16": s[4],
    }


def main():
    names = sys.argv[1:] or list(FAMILIES)
    for name in names:
        rec = audit(name)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
