"""Import the PyTorch reference zoo (/root/reference/models_pytorch) on CPU.

The reference imports timm / torchvision / cupy, none of which are installed
(and cupy's kernels are CUDA-only). We install minimal stub modules providing
exactly the symbols the reference uses, with CPU torch implementations of the
documented semantics (timm DropPath, torchvision deform_conv2d, the Shift op's
CPU equivalent per shift_cuda.py's kernel index math). The reference package is
loaded under a synthetic name so its models_pytorch/__init__.py (which imports
every model, including the broken active_mlp import) never executes.
"""

from __future__ import annotations

import importlib
import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF_PATH = "/root/reference/models_pytorch"
PKG = "ref_models_pytorch"


# ---------------------------------------------------------------------------
# stub: timm
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    """timm.models.layers.DropPath (stochastic depth); identity in eval."""

    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob or 0.0

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * mask.floor_()


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)


def register_model(fn):
    return fn


def _cfg(url="", **kwargs):
    return {"url": url, **kwargs}


def _install_timm():
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    helpers = types.ModuleType("timm.models.layers.helpers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")
    data = types.ModuleType("timm.data")

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    helpers.to_2tuple = to_2tuple
    registry.register_model = register_model
    vit._cfg = _cfg
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    timm.models = models
    timm.data = data
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    layers.helpers = helpers

    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.layers.helpers": helpers,
            "timm.models.registry": registry,
            "timm.models.vision_transformer": vit,
            "timm.data": data,
        }
    )


# ---------------------------------------------------------------------------
# stub: torchvision.ops.deform_conv2d (pure-torch CPU implementation)
# ---------------------------------------------------------------------------


def _bilinear_sample(x, py, px):
    """x: (B, G, C, H, W); py/px: (B, G, Ho, Wo) absolute float coords.
    Zero padding outside. Returns (B, G, C, Ho, Wo)."""
    B, G, C, H, W = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yy = (y0 + dy).long()
            xx = (x0 + dx).long()
            valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            yc = yy.clamp(0, H - 1)
            xc = xx.clamp(0, W - 1)
            flat = x.reshape(B, G, C, H * W)
            idx = (yc * W + xc).reshape(B, G, 1, -1).expand(B, G, C, -1)
            vals = torch.gather(flat, 3, idx).reshape(B, G, C, *py.shape[-2:])
            w = (wy * wx * valid.to(x.dtype)).unsqueeze(2)
            out = out + vals * w
    return out


def deform_conv2d(
    input,
    offset,
    weight,
    bias=None,
    stride=(1, 1),
    padding=(0, 0),
    dilation=(1, 1),
    mask=None,
):
    """torchvision.ops.deform_conv2d semantics, pure torch (DCNv1/v2)."""
    B, Cin, H, W = input.shape
    Cout, Cin_g, kh, kw = weight.shape
    sh, sw = to_2tuple(stride)
    ph, pw = to_2tuple(padding)
    dh, dw = to_2tuple(dilation)
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    G = offset.shape[1] // (2 * kh * kw)  # offset groups
    off = offset.reshape(B, G, kh * kw, 2, Ho, Wo)
    if mask is not None:
        msk = mask.reshape(B, G, kh * kw, Ho, Wo)
    xg = input.reshape(B, G, Cin // G, H, W)
    ys = (torch.arange(Ho, dtype=input.dtype) * sh - ph).view(1, 1, Ho, 1)
    xs = (torch.arange(Wo, dtype=input.dtype) * sw - pw).view(1, 1, 1, Wo)
    cols = []
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = ys + i * dh + off[:, :, k, 0]
        px = xs + j * dw + off[:, :, k, 1]
        s = _bilinear_sample(xg, py, px)  # (B, G, Cin/G, Ho, Wo)
        if mask is not None:
            s = s * msk[:, :, k].unsqueeze(2)
        cols.append(s.reshape(B, Cin, Ho, Wo))
    # col index = c * (kh*kw) + k to match weight's (Cin_g, kh, kw) flattening
    col = torch.stack(cols, dim=2).reshape(B, Cin * kh * kw, Ho * Wo)
    wg = Cin // Cin_g  # weight groups
    col = col.reshape(B, wg, Cin_g * kh * kw, Ho * Wo)
    wmat = weight.reshape(wg, Cout // wg, Cin_g * kh * kw)
    out = torch.einsum("goc,bgcp->bgop", wmat, col).reshape(B, Cout, Ho, Wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _install_torchvision():
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    dc = types.ModuleType("torchvision.ops.deform_conv")
    dc.deform_conv2d = deform_conv2d
    ops.deform_conv = dc
    ops.deform_conv2d = deform_conv2d
    tv.ops = ops
    sys.modules.update(
        {"torchvision": tv, "torchvision.ops": ops, "torchvision.ops.deform_conv": dc}
    )


# ---------------------------------------------------------------------------
# stub: cupy (only needs to import; Shift is monkeypatched to a CPU version)
# ---------------------------------------------------------------------------


def _install_cupy():
    cupy = types.ModuleType("cupy")
    util = types.ModuleType("cupy._util")
    util.memoize = lambda **kw: (lambda f: f)
    cuda = types.ModuleType("cupy.cuda")

    def _no_cuda(*a, **k):
        raise RuntimeError("cupy stub: no CUDA available in tests")

    cuda.compile_with_cache = _no_cuda

    class _FakeNdarray:  # einops probes cupy.ndarray for backend detection
        pass

    cupy.ndarray = _FakeNdarray
    cupy._util = util
    cupy.cuda = cuda
    sys.modules.update(
        {"cupy": cupy, "cupy._util": util, "cupy.cuda": cuda}
    )


def cpu_shift(x, shift, dim):
    """CPU equivalent of the reference shift CUDA kernel
    (shift_cuda.py:44-72): out[n,c,h,w] = in[n,c,h+s,w] (dim=2) with zero fill,
    s = -(c // ceil(C/shift) - shift//2)."""
    B, C, H, W = x.shape
    group = math.ceil(C / shift)
    out = torch.zeros_like(x)
    for c0 in range(0, C, group):
        c1 = min(c0 + group, C)
        g = c0 // group
        s = -(g - shift // 2)
        L = x.shape[dim]
        if s >= 0:
            src = x.narrow(dim, s, L - s).narrow(1, c0, c1 - c0)
            out.narrow(dim, 0, L - s)[:, c0:c1] = src
        else:
            src = x.narrow(dim, 0, L + s).narrow(1, c0, c1 - c0)
            out.narrow(dim, -s, L + s)[:, c0:c1] = src
    return out


def _install_numpy_arraypad():
    """gfnet.py:5 imports numpy.lib.arraypad (removed in numpy 2.x)."""
    import numpy as np

    if "numpy.lib.arraypad" not in sys.modules:
        m = types.ModuleType("numpy.lib.arraypad")
        m.pad = np.pad
        sys.modules["numpy.lib.arraypad"] = m


def _install_utils_top():
    """active_mlp.py:15 imports `from utils import dict_to_string`."""
    u = types.ModuleType("utils")
    u.dict_to_string = lambda d, **kw: ", ".join(
        f"{k}={v}" for k, v in d.items() if isinstance(k, str)
    )
    sys.modules["utils"] = u


# ---------------------------------------------------------------------------
# package loading
# ---------------------------------------------------------------------------

_installed = False


def _ensure_stubs():
    global _installed
    if _installed:
        return
    _install_timm()
    _install_torchvision()
    _install_cupy()
    _install_numpy_arraypad()
    _install_utils_top()
    pkg = types.ModuleType(PKG)
    pkg.__path__ = [REF_PATH]
    pkg.__package__ = PKG
    sys.modules[PKG] = pkg
    _installed = True


def load_ref(module_name):
    """Import e.g. 'mlp_mixer' from the reference zoo, with stubs in place."""
    _ensure_stubs()
    mod = importlib.import_module(f"{PKG}.{module_name}")
    # CPU-ify the cupy Shift op used by as_mlp
    utils_mod = sys.modules.get(f"{PKG}.utils")
    if utils_mod is not None and hasattr(utils_mod, "Shift"):
        def _forward(self, x):
            if self.kernel_size == 1:
                return x
            return cpu_shift(x, self.kernel_size, self.dim)

        utils_mod.Shift.forward = _forward
    return mod


def ref_model(module_name, class_name, *args, seed=0, **kwargs):
    """Build an eval-mode reference model with deterministic init.

    Zero-initialized parameters (e.g. WaveMLP/MorphMLP heads, ActiveMLP offset
    layers) are re-randomized so forward-parity comparisons are never vacuous
    (a zeroed head makes every output 0 on both sides)."""
    mod = load_ref(module_name)
    torch.manual_seed(seed)
    m = getattr(mod, class_name)(*args, **kwargs)
    with torch.no_grad():
        for p in m.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    m.eval()
    return m


def recalibrate_ref_bn(model, image_size=224, batches=2, batch=4, seed=123):
    """Replace untrained BatchNorm running stats with calibrated batch stats.

    At random init every torch BN has running_mean=0 / running_var=1, which
    never matches the actual activation statistics, so in eval mode BN fails
    to normalize and activation scale cascades multiplicatively through deep
    BN stacks (|out| ~ 1e5 for MorphMLP-T at 224²) — absolute forward error
    then says nothing. Cumulative-average the true stats over a few batches
    (momentum=None is torch's exact running average) so the ≤1e-4 strict
    parity gate is measurable at full size. Returns True if the model had any
    BN to recalibrate. Import the state_dict into the JAX model AFTER calling
    this."""
    from torch.nn.modules.batchnorm import _BatchNorm

    bns = [m for m in model.modules() if isinstance(m, _BatchNorm)]
    if not bns:
        return False
    for m in bns:
        m.reset_running_stats()
        m.momentum = None
    torch.manual_seed(seed)
    model.train()
    with torch.no_grad():
        for _ in range(batches):
            model(torch.randn(batch, 3, image_size, image_size))
    model.eval()
    return True
