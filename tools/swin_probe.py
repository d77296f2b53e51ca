"""Measure: SwinMLP window spatial-MLP as explicit partition/transpose vs a
single folded einsum over the 6D windowed tensor (the HireMLP trick)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from tools.gfnet_profile import scalar_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from jittor_mlp_tpu.models.swin_mlp import _spatial_mlp
    from jittor_mlp_tpu.ops.window import window_partition, window_reverse

    B = 64
    ws = 7
    rng = np.random.default_rng(0)

    def current(y, w2d, bias, nH):
        # w2d: grouped conv1d weight (nH*ws², ws²), head-major rows
        Hp, Wp, C = y.shape[1], y.shape[2], y.shape[3]
        win = window_partition(y, ws).reshape(-1, ws * ws, nH, C // nH)
        win = _spatial_mlp(
            {"weight": w2d[..., None], "bias": bias}, win, nH, ws * ws
        )
        return window_reverse(win.reshape(-1, ws, ws, C), ws, Hp, Wp)

    def folded(y, w2d, bias, nH):
        Hp, Wp, C = y.shape[1], y.shape[2], y.shape[3]
        ch = C // nH
        y6 = y.reshape(B, Hp // ws, ws, Wp // ws, ws, nH, ch)
        w5 = w2d.reshape(nH, ws, ws, ws, ws)  # (h, out k, out l, in i, in j)
        out = jnp.einsum("bpiqjhc,hklij->bpkqlhc", y6, w5)
        b5 = bias.reshape(nH, ws, ws).transpose(1, 2, 0)
        out = out + b5[None, None, :, None, :, :, None]
        return out.reshape(B, Hp, Wp, C)

    # correctness at small shape
    nH, C, Hp = 3, 96, 14
    y = jnp.asarray(rng.standard_normal((B, Hp, Hp, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((nH * ws * ws, ws * ws)), jnp.float32) * 0.1
    bias = jnp.asarray(rng.standard_normal((nH * ws * ws,)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        a = np.asarray(jax.jit(lambda *t: current(*t, nH))(y, w, bias))
        b = np.asarray(jax.jit(lambda *t: folded(*t, nH))(y, w, bias))
    print("folded-vs-current max abs:", np.abs(a - b).max())

    for (Hp, C, nH, name) in [(56, 96, 3, "s0"), (28, 192, 6, "s1"),
                              (14, 384, 12, "s2"), (7, 768, 24, "s3")]:
        y = jnp.asarray(rng.standard_normal((B, Hp, Hp, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((nH * ws * ws, ws * ws)), jnp.bfloat16) * 0.1
        bias = jnp.asarray(rng.standard_normal((nH * ws * ws,)), jnp.bfloat16)
        t_cur = scalar_time(lambda y, w, b: current(y, w, b, nH).reshape(-1), y, w, bias)
        t_fold = scalar_time(lambda y, w, b: folded(y, w, b, nH).reshape(-1), y, w, bias)
        print(f"{name} ({Hp}²x{C}, {nH}h) b{B}: current {t_cur*1e3:.3f} ms  folded {t_fold*1e3:.3f} ms")


if __name__ == "__main__":
    main()
