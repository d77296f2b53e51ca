import jittor_mlp_tpu as jm
import jittor_mlp_tpu.models.dyna_mlp as jm_dyna
import jittor_mlp_tpu.models.morph_mlp as jm_morph
import jittor_mlp_tpu.models.wave_mlp as jm_wave
from parity import check_parity
from ref_loader import load_ref

# Small test settings injected into both implementations' settings tables so
# CPU parity runs stay fast; the constructor surface (model_name) is unchanged.
MORPH_XS = [[2, 2], [2, 2], [16, 32], [4, 4], [0.0, 0.0]]
WAVE_XS = [[1, 1, 1, 1], [2, 2, 2, 2]]
DYNA_XS = [[4, 2], [16, 32], [2, 2], [2, 4], 2, 0.0, 2]


def test_morph_mlp_parity():
    load_ref("morph_mlp").morphmlp_settings["XS"] = MORPH_XS
    jm_morph.morphmlp_settings["XS"] = MORPH_XS
    check_parity(
        "morph_mlp",
        "MorphMLP",
        jm.MorphMLP,
        dict(model_name="XS", num_classes=10),
        input_shape=(2, 3, 32, 32),
    )


def test_morph_mlp_padded_chunks():
    # resolution not divisible by chunk length exercises the pad/crop path
    s = [[2], [2], [16], [4], [0.0]]
    load_ref("morph_mlp").morphmlp_settings["XP"] = s
    jm_morph.morphmlp_settings["XP"] = s
    check_parity(
        "morph_mlp",
        "MorphMLP",
        jm.MorphMLP,
        dict(model_name="XP", num_classes=10),
        input_shape=(2, 3, 36, 36),  # 36/4=9, 9%4!=0 → padding
    )


def test_wave_mlp_parity():
    load_ref("wave_mlp").wavemlp_settings["XS"] = WAVE_XS
    jm_wave.wavemlp_settings["XS"] = WAVE_XS
    check_parity(
        "wave_mlp",
        "WaveMLP",
        jm.WaveMLP,
        dict(model_name="XS", num_classes=10),
        input_shape=(2, 3, 64, 64),
    )


def test_dyna_mixer_parity():
    load_ref("dyna_mlp").dynamlp_settings["XS"] = DYNA_XS
    jm_dyna.dynamlp_settings["XS"] = DYNA_XS
    check_parity(
        "dyna_mlp",
        "DynaMixer",
        jm.DynaMixer,
        dict(model_name="XS", image_size=32, num_classes=10),
        input_shape=(2, 3, 32, 32),
    )


def test_dyna_unroll_matches_einsum():
    """The bf16 batch>=64 eval path unrolls the attention application into
    broadcast-FMAs (models/dyna_mlp.py:58-63); it must agree with the
    einsum/parity formulation on the same bf16 inputs to f32-accumulation
    noise. Exercised directly through _dyna_op on a tiny geometry."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    B, H, W, C, seg, hidden = 64, 4, 4, 8, 2, 2
    op = {
        "wd_w": jnp.asarray(rng.normal(size=(seg, hidden, C)), jnp.bfloat16),
        "wd_b": jnp.asarray(rng.normal(size=(seg, hidden)), jnp.bfloat16),
        "attend": {
            "weight": jnp.asarray(
                rng.normal(size=(W * W, hidden * W)), jnp.bfloat16),
            "bias": jnp.asarray(rng.normal(size=(W * W,)), jnp.bfloat16),
        },
        "proc": {
            "weight": jnp.asarray(rng.normal(size=(C, C)), jnp.bfloat16),
            "bias": jnp.asarray(rng.normal(size=(C,)), jnp.bfloat16),
        },
    }
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    for axis in (1, 2):
        fast = np.asarray(
            jm_dyna._dyna_op(op, x, seg, hidden, axis), np.float32)
        ref = np.asarray(
            jm_dyna._dyna_op(op, x, seg, hidden, axis, train=True),
            np.float32)
        np.testing.assert_allclose(fast, ref, rtol=0.05, atol=0.05)
        assert not np.allclose(fast, 0)


def test_wave_tfc_decomposition_matches_grouped():
    # _tfc's even/odd depthwise decomposition must equal the torch-semantics
    # grouped conv exactly (up to one f32 reassociation) on BOTH branches.
    import jax.numpy as jnp
    import numpy as np

    from jittor_mlp_tpu.core import nnf

    rng = np.random.RandomState(0)
    for C, HW, pad, k in [(8, 16, (0, 3), (1, 7)), (8, 16, (3, 0), (7, 1)),
                          (16, 4, (0, 3), (1, 7))]:  # HW=4 -> grouped branch
        x = jnp.asarray(rng.randn(2, HW, HW, 2 * C), jnp.float32)
        p = {"weight": jnp.asarray(rng.randn(C, 2, *k) * 0.2, jnp.float32)}
        want = nnf.conv2d(p, x, padding=pad, groups=C)
        got = jm_wave._tfc(p, x, pad, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
