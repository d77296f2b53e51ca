"""Default-construction API parity: every compare.py config whose factory is
fully defaulted must, built with NO arguments, produce exactly the
reference's parameter names and shapes — catching constructor-default drift
the kwarg-specified parity tests can't see. Compares our init_sd template
against the torch state_dict."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import compare  # noqa: E402
from ref_loader import ref_model  # noqa: E402

CASES = sorted(
    (name, cfg) for name, cfg in compare.CONFIGS.items() if cfg[2] is not None
)


@pytest.mark.slow  # full-size default builds (the repo's fast/slow split)
@pytest.mark.parametrize("name,cfg", CASES, ids=[c[0] for c in CASES])
def test_default_construction_matches_reference(name, cfg):
    ref_module, ref_class, ours_class, _ = cfg
    import jittor_mlp_tpu as jm

    try:
        ref = ref_model(ref_module, ref_class)
    except TypeError:
        # reference requires arguments — ours must too (two-sided)
        with pytest.raises(TypeError):
            getattr(jm, ours_class)()
        return
    except AssertionError:
        # the reference's own defaults are invalid (e.g. ViP: 256 % 14);
        # API parity = we reject the same construction
        with pytest.raises(AssertionError):
            getattr(jm, ours_class)()
        return
    ours = getattr(jm, ours_class)()

    want = {
        k: tuple(v.shape)
        for k, v in ref.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    got = {k: tuple(v.shape) for k, v in ours._init_sd.items()}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{name}: missing={missing[:5]} extra={extra[:5]}"
    )
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{name}: shape drift {dict(list(bad.items())[:5])}"
