"""Golden Jittor-semantics oracle for the S2-MLP spatial shifts.

Settles VERDICT r2 item 9: compare.py's `_patch_s2_shifts` replaces the
torch reference's overlapping in-place shifts (UB on torch CPU — the slice
assignments cascade) with functional semantics, on the ARGUMENT that
Jittor's execution gives the functional result. This file turns that
argument into evidence without running Jittor:

Jittor variables are immutable lazy-graph nodes; `x[dst] = x[src]` lowers
to `x.assign(x.setitem(dst, x.getitem(src)))` — the getitem references the
var as it was BEFORE the assignment, and each subsequent statement reads
the var the previous statement produced. The emulation below replays
/root/reference/models_jittor/s2_mlp_v1.py:21-27 (and s2_mlp_v2.py:16-30)
statement-by-statement under exactly those semantics, in pure numpy, and
our ops/shift.py lowerings must match it bit-exactly.
"""

import numpy as np

from jittor_mlp_tpu.ops.shift import spatial_shift1, spatial_shift2


def _jt_setitem(x, dst, src):
    """One Jittor `x[dst] = x[src]` statement: functional setitem — the RHS
    is a getitem of the PRE-assignment var (no within-statement cascade)."""
    out = x.copy()
    out[dst] = x[src]  # x is the old snapshot; out is the new var
    return out


def jittor_shift1_golden(x):
    """models_jittor/s2_mlp_v1.py:21-27 under Jittor var semantics."""
    b, w, h, c = x.shape
    s = np.s_
    x = _jt_setitem(x, s[:, 1:, :, : c // 4], s[:, : w - 1, :, : c // 4])
    x = _jt_setitem(x, s[:, : w - 1, :, c // 4 : c // 2],
                    s[:, 1:, :, c // 4 : c // 2])
    x = _jt_setitem(x, s[:, :, 1:, c // 2 : c * 3 // 4],
                    s[:, :, : h - 1, c // 2 : c * 3 // 4])
    x = _jt_setitem(x, s[:, :, : h - 1, 3 * c // 4 :],
                    s[:, :, 1:, 3 * c // 4 :])
    return x


def jittor_shift2_golden(x):
    """models_jittor/s2_mlp_v2.py:24-30 under Jittor var semantics."""
    b, w, h, c = x.shape
    s = np.s_
    x = _jt_setitem(x, s[:, :, 1:, : c // 4], s[:, :, : h - 1, : c // 4])
    x = _jt_setitem(x, s[:, :, : h - 1, c // 4 : c // 2],
                    s[:, :, 1:, c // 4 : c // 2])
    x = _jt_setitem(x, s[:, 1:, :, c // 2 : c * 3 // 4],
                    s[:, : w - 1, :, c // 2 : c * 3 // 4])
    x = _jt_setitem(x, s[:, : w - 1, :, 3 * c // 4 :],
                    s[:, 1:, :, 3 * c // 4 :])
    return x


def test_shift1_matches_jittor_golden():
    rng = np.random.default_rng(0)
    for shape in [(2, 8, 8, 32), (1, 5, 7, 30), (3, 4, 4, 8)]:
        x = rng.standard_normal(shape).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(spatial_shift1(x)), jittor_shift1_golden(x)
        )


def test_shift2_matches_jittor_golden():
    rng = np.random.default_rng(1)
    for shape in [(2, 8, 8, 32), (1, 5, 7, 30), (3, 4, 4, 8)]:
        x = rng.standard_normal(shape).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(spatial_shift2(x)), jittor_shift2_golden(x)
        )


def test_statement_order_does_not_crosstalk():
    """The 4 statements write disjoint channel groups and each reads only the
    channel group it writes, so the sequential statement chaining collapses
    to one functional 4-way shift — the property _patch_s2_shifts relies on.
    Verified by comparing the sequential emulation against a one-shot
    snapshot version that reads the ORIGINAL x for every statement."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, 16)).astype(np.float32)
    b, w, h, c = x.shape
    snap = x.copy()
    out = x.copy()
    s = np.s_
    for dst, src in [
        (s[:, 1:, :, : c // 4], s[:, : w - 1, :, : c // 4]),
        (s[:, : w - 1, :, c // 4 : c // 2], s[:, 1:, :, c // 4 : c // 2]),
        (s[:, :, 1:, c // 2 : c * 3 // 4], s[:, :, : h - 1, c // 2 : c * 3 // 4]),
        (s[:, :, : h - 1, 3 * c // 4 :], s[:, :, 1:, 3 * c // 4 :]),
    ]:
        out[dst] = snap[src]
    np.testing.assert_array_equal(jittor_shift1_golden(x), out)
