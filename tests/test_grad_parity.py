"""Gradient parity vs torch autograd — WHOLE zoo (VERDICT r1 item 5, r2 item 4).

The actual checks live in _grad_parity_impl.py (fp64, one tiny config per
family) and run in subprocesses so jax_enable_x64 (process-global) never
leaks into this pytest process. Grouped so a failure localizes to a few
families and groups stay under the subprocess timeout.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))

GROUPS = {
    "matmul": ["mlp_mixer", "g_mlp", "res_mlp", "vip", "dyna_mlp",
               "morph_mlp"],
    "conv_bn": ["wave_mlp", "conv_mixer", "conv_mlp", "repmlpnet", "ms_mlp"],
    "shift_deform": ["cycle_mlp", "active_mlp", "as_mlp", "s2_mlp_v1",
                     "s2_mlp_v2", "swin_mlp"],
    "special": ["sequencer", "gfnet", "gfnet_pyramid", "raft_mlp",
                "sparse_mlp", "hire_mlp"],
}


def test_grad_parity_groups_cover_the_whole_zoo():
    from _grad_parity_impl import CASES

    covered = {n for g in GROUPS.values() for n in g}
    assert covered == set(CASES), (
        f"missing: {set(CASES) - covered}, stale: {covered - set(CASES)}"
    )


@pytest.mark.parametrize("group", sorted(GROUPS), ids=sorted(GROUPS))
def test_grad_parity_vs_torch_autograd(group):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "_grad_parity_impl.py"),
         *GROUPS[group]],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(HERE),
        timeout=1800,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "grad parity ok" in r.stdout
