"""swin_mlp — placeholder, implementation landing in a later milestone."""

def SwinMLP(*args, **kwargs):
    raise NotImplementedError("SwinMLP: not yet implemented in jittor_mlp_tpu")

