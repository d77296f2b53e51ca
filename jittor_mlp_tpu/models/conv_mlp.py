"""conv_mlp — placeholder, implementation landing in a later milestone."""

def convmlp_s(*args, **kwargs):
    raise NotImplementedError("convmlp_s: not yet implemented in jittor_mlp_tpu")


def convmlp_m(*args, **kwargs):
    raise NotImplementedError("convmlp_m: not yet implemented in jittor_mlp_tpu")


def convmlp_l(*args, **kwargs):
    raise NotImplementedError("convmlp_l: not yet implemented in jittor_mlp_tpu")

