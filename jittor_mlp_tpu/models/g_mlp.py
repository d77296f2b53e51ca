"""g_mlp — placeholder, implementation landing in a later milestone."""

def gMLPForImageClassification(*args, **kwargs):
    raise NotImplementedError("gMLPForImageClassification: not yet implemented in jittor_mlp_tpu")

