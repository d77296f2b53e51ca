"""dyna_mlp — placeholder, implementation landing in a later milestone."""

def DynaMixer(*args, **kwargs):
    raise NotImplementedError("DynaMixer: not yet implemented in jittor_mlp_tpu")

