"""gfnet — placeholder, implementation landing in a later milestone."""

def GFNet(*args, **kwargs):
    raise NotImplementedError("GFNet: not yet implemented in jittor_mlp_tpu")


def GFNetPyramid(*args, **kwargs):
    raise NotImplementedError("GFNetPyramid: not yet implemented in jittor_mlp_tpu")

