"""Shape helpers mirroring the reference's utils
(/root/reference/models_pytorch/utils/tools.py:4-12)."""


def pair(t):
    return t if isinstance(t, (tuple, list)) else (t, t)


def check_sizes(image_size, patch_size):
    ih, iw = pair(image_size)
    ph, pw = pair(patch_size)
    assert ih % ph == 0 and iw % pw == 0, "image size must be divisible by patch size"
    return (ih // ph) * (iw // pw)


def sized_kwargs(factory, image_size=None, num_classes=None):
    """kwargs sizing ``factory`` to the requested input/classes, using
    whichever parameter names it accepts (image_size vs img_size,
    num_classes vs n_classes). Factories that take no size kwarg (e.g.
    ConvMixer) get nothing — their configs are resolution-free. Lets entry
    points build any zoo model at a non-default resolution instead of
    crashing mid-trace on the 224 default."""
    import inspect

    accepted = inspect.signature(factory).parameters
    out = {}
    for names, value in ((("image_size", "img_size"), image_size),
                         (("num_classes", "n_classes"), num_classes)):
        if value is not None:
            for k in names:
                if k in accepted:
                    out[k] = value
                    break
    return out
