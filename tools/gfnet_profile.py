"""Stage-level timing probe for GFNet-H-B on the real chip.

Times each pyramid stage's block stack in isolation (56²/28² FFT stages vs
14²/7² circulant stages) to locate where the 1,461 img/s model spends its
time, plus a standalone rfft2→mult→irfft2 microbench and a separable
DFT-as-matmul candidate for the large grids.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def scalar_time(fn, *args, iters=100, repeats=5):
    """t(iters)-t(1) protocol from utils/timing.py, for an arbitrary fn."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(n, *args):
        def body(i, carry):
            acc, a0 = carry
            out = fn(a0 + (acc * 1e-8).astype(a0.dtype), *args[1:])
            return acc + out.reshape(-1)[0].astype(jnp.float32), a0

        acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), args[0]))
        return acc

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    timed(1)
    return (timed(iters) - timed(1)) / (iters - 1)


def dft_mats(a, b):
    """Static ortho DFT matrices for the separable path (f64→f32)."""
    bw = b // 2 + 1
    n = np.arange(b)[:, None]
    k = np.arange(bw)[None, :]
    ang = 2 * np.pi * n * k / b
    fw_r = (np.cos(ang) / np.sqrt(b)).astype(np.float32)        # (b, bw)
    fw_i = (-np.sin(ang) / np.sqrt(b)).astype(np.float32)
    c = np.where((k.ravel() == 0) | ((b % 2 == 0) & (k.ravel() == b // 2)), 1.0, 2.0)
    iw_r = (c[:, None] * np.cos(2 * np.pi * np.arange(bw)[:, None] * np.arange(b)[None, :] / b) / np.sqrt(b)).astype(np.float32)  # (bw, b)
    iw_i = (-c[:, None] * np.sin(2 * np.pi * np.arange(bw)[:, None] * np.arange(b)[None, :] / b) / np.sqrt(b)).astype(np.float32)
    p = np.arange(a)[:, None]
    q = np.arange(a)[None, :]
    ah = 2 * np.pi * p * q / a
    fh_r = (np.cos(ah) / np.sqrt(a)).astype(np.float32)         # (a, a)
    fh_i = (-np.sin(ah) / np.sqrt(a)).astype(np.float32)
    return fw_r, fw_i, iw_r, iw_i, fh_r, fh_i


def sep_filter(x, wr, wi, mats):
    """Separable DFT-matmul global filter: x (B,a,b,C) real."""
    import jax.numpy as jnp

    fw_r, fw_i, iw_r, iw_i, fh_r, fh_i = mats
    # rfft along W
    xr = jnp.einsum("bhwc,wk->bhkc", x, fw_r)
    xi = jnp.einsum("bhwc,wk->bhkc", x, fw_i)
    # full DFT along H (complex)
    yr = jnp.einsum("bhkc,hp->bpkc", xr, fh_r) - jnp.einsum("bhkc,hp->bpkc", xi, fh_i)
    yi = jnp.einsum("bhkc,hp->bpkc", xr, fh_i) + jnp.einsum("bhkc,hp->bpkc", xi, fh_r)
    # learned filter
    zr = yr * wr - yi * wi
    zi = yr * wi + yi * wr
    # inverse DFT along H = F^H (ortho): real part uses fh_r^T, +fh_i^T sign flip
    gr = jnp.einsum("bpkc,ph->bhkc", zr, fh_r) + jnp.einsum("bpkc,ph->bhkc", zi, fh_i)
    gi = jnp.einsum("bpkc,ph->bhkc", zi, fh_r) - jnp.einsum("bpkc,ph->bhkc", zr, fh_i)
    # irfft along W: y = gr @ (c·cos/√b) + gi @ (−c·sin/√b)
    return jnp.einsum("bhkc,kw->bhwc", gr, iw_r) + jnp.einsum("bhkc,kw->bhwc", gi, iw_i)


def fft_filter(x, wr, wi):
    import jax.numpy as jnp

    y = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    y = y * (wr + 1j * wi)
    y = jnp.fft.irfft2(y, s=x.shape[1:3], axes=(1, 2), norm="ortho")
    return y.astype(x.dtype)


def main():
    import jax
    import jax.numpy as jnp

    B = 64
    rng = np.random.default_rng(0)

    # correctness of the separable path vs FFT (CPU-exact enough on chip f32)
    a, b, C = 8, 6, 4
    x = jnp.asarray(rng.standard_normal((2, a, b, C)), jnp.float32)
    wr = jnp.asarray(rng.standard_normal((a, b // 2 + 1, C)), jnp.float32) * 0.1
    wi = jnp.asarray(rng.standard_normal((a, b // 2 + 1, C)), jnp.float32) * 0.1
    mats = tuple(map(jnp.asarray, dft_mats(a, b)))
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(sep_filter)(x, wr, wi, mats))
        want = np.asarray(jax.jit(fft_filter)(x, wr, wi))
    print("sep-vs-fft max abs:", np.abs(got - want).max())

    # also pin the PRODUCTION path (models/gfnet.global_filter) to the FFT,
    # so this probe catches drift between the harness copy and the model
    from jittor_mlp_tpu.models.gfnet import global_filter
    from jittor_mlp_tpu import config

    w2 = jnp.stack([wr, wi], axis=-1)
    with config.parity_mode():
        prod = np.asarray(
            jax.jit(lambda x, w: global_filter(
                {"complex_weight": w}, x.reshape(x.shape[0], a * b, C), a, b
            ))(x, w2)
        ).reshape(want.shape)
    print("production-vs-fft max abs:", np.abs(prod - want).max())

    # stage-shaped timings (GFNet-H-B: dims 96/192/384/768, sizes 56/28/14/7)
    for (a, b, C, name) in [(56, 56, 96, "stage0"), (28, 28, 192, "stage1")]:
        x = jnp.asarray(rng.standard_normal((B, a, b, C)), jnp.bfloat16)
        wr = jnp.asarray(rng.standard_normal((a, b // 2 + 1, C)), jnp.float32) * 0.1
        wi = jnp.asarray(rng.standard_normal((a, b // 2 + 1, C)), jnp.float32) * 0.1
        mats = tuple(map(jnp.asarray, dft_mats(a, b)))
        t_fft = scalar_time(fft_filter, x, wr, wi)
        t_sep = scalar_time(lambda x, wr, wi: sep_filter(x.astype(jnp.float32), wr, wi, mats).astype(jnp.bfloat16), x, wr, wi)
        mats16 = tuple(m.astype(jnp.bfloat16) for m in mats)
        t_sep16 = scalar_time(lambda x, wr, wi: sep_filter(x, wr.astype(jnp.bfloat16), wi.astype(jnp.bfloat16), mats16), x, wr, wi)
        print(f"{name} ({a}x{b}x{C}) b{B}: fft {t_fft*1e3:.3f} ms  sep-f32 {t_sep*1e3:.3f} ms  sep-bf16 {t_sep16*1e3:.3f} ms")

    # small-grid stages through the production path (models/gfnet.py now
    # uses the separable DFT matmuls at every grid size; the historical
    # circulant numbers are recorded in docs/PERFORMANCE.md)
    from jittor_mlp_tpu.models.gfnet import global_filter

    for (a, b, C, name) in [(14, 14, 384, "stage2"), (7, 7, 768, "stage3")]:
        x = jnp.asarray(rng.standard_normal((B, a, b, C)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((a, b // 2 + 1, C, 2)), jnp.float32
        ) * 0.1
        t = scalar_time(
            lambda x, w: global_filter({"complex_weight": w}, x.reshape(B, a * b, C), a, b).reshape(-1), x, w
        )
        print(f"{name} ({a}x{b}x{C}) b{B}: production filter {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
