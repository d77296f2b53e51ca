"""s2_mlp_v1 — placeholder, implementation landing in a later milestone."""

def S2MLPv1_deep(*args, **kwargs):
    raise NotImplementedError("S2MLPv1_deep: not yet implemented in jittor_mlp_tpu")


def S2MLPv1_wide(*args, **kwargs):
    raise NotImplementedError("S2MLPv1_wide: not yet implemented in jittor_mlp_tpu")

