"""as_mlp — placeholder, implementation landing in a later milestone."""

def AS_MLP(*args, **kwargs):
    raise NotImplementedError("AS_MLP: not yet implemented in jittor_mlp_tpu")

