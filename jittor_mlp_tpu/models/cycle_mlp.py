"""cycle_mlp — placeholder, implementation landing in a later milestone."""

def CycleMLP_B1(*args, **kwargs):
    raise NotImplementedError("CycleMLP_B1: not yet implemented in jittor_mlp_tpu")


def CycleMLP_B2(*args, **kwargs):
    raise NotImplementedError("CycleMLP_B2: not yet implemented in jittor_mlp_tpu")


def CycleMLP_B3(*args, **kwargs):
    raise NotImplementedError("CycleMLP_B3: not yet implemented in jittor_mlp_tpu")


def CycleMLP_B4(*args, **kwargs):
    raise NotImplementedError("CycleMLP_B4: not yet implemented in jittor_mlp_tpu")


def CycleMLP_B5(*args, **kwargs):
    raise NotImplementedError("CycleMLP_B5: not yet implemented in jittor_mlp_tpu")

