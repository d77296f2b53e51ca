"""ms_mlp — placeholder, implementation landing in a later milestone."""

def MS_MLP(*args, **kwargs):
    raise NotImplementedError("MS_MLP: not yet implemented in jittor_mlp_tpu")

