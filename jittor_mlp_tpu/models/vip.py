"""vip — placeholder, implementation landing in a later milestone."""

def ViP(*args, **kwargs):
    raise NotImplementedError("ViP: not yet implemented in jittor_mlp_tpu")

