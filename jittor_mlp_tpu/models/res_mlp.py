"""res_mlp — placeholder, implementation landing in a later milestone."""

def ResMLPForImageClassification(*args, **kwargs):
    raise NotImplementedError("ResMLPForImageClassification: not yet implemented in jittor_mlp_tpu")

