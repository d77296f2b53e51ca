"""Shape helpers mirroring the reference's utils
(/root/reference/models_pytorch/utils/tools.py:4-12)."""


def pair(t):
    return t if isinstance(t, (tuple, list)) else (t, t)


def check_sizes(image_size, patch_size):
    ih, iw = pair(image_size)
    ph, pw = pair(patch_size)
    assert ih % ph == 0 and iw % pw == 0, "image size must be divisible by patch size"
    return (ih // ph) * (iw // pw)
