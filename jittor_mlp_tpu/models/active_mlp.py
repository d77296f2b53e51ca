"""active_mlp — placeholder, implementation landing in a later milestone."""

def ActiveSmall(*args, **kwargs):
    raise NotImplementedError("ActiveSmall: not yet implemented in jittor_mlp_tpu")


def ActiveBase(*args, **kwargs):
    raise NotImplementedError("ActiveBase: not yet implemented in jittor_mlp_tpu")


def ActiveLarge(*args, **kwargs):
    raise NotImplementedError("ActiveLarge: not yet implemented in jittor_mlp_tpu")

