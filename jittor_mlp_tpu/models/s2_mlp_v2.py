"""s2_mlp_v2 — placeholder, implementation landing in a later milestone."""

def S2MLPv2(*args, **kwargs):
    raise NotImplementedError("S2MLPv2: not yet implemented in jittor_mlp_tpu")

