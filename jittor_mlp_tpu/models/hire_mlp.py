"""hire_mlp — placeholder, implementation landing in a later milestone."""

def HireMLP(*args, **kwargs):
    raise NotImplementedError("HireMLP: not yet implemented in jittor_mlp_tpu")

