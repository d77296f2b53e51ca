"""morph_mlp — placeholder, implementation landing in a later milestone."""

def MorphMLP(*args, **kwargs):
    raise NotImplementedError("MorphMLP: not yet implemented in jittor_mlp_tpu")

