"""Gradient parity vs torch autograd (VERDICT r1 item 5).

The actual checks live in _grad_parity_impl.py and run in a subprocess so
jax_enable_x64 (process-global) never leaks into this pytest process."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def test_grad_parity_vs_torch_autograd():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "_grad_parity_impl.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(HERE),
        timeout=900,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "grad parity ok" in r.stdout
