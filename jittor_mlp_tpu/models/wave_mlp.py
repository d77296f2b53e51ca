"""wave_mlp — placeholder, implementation landing in a later milestone."""

def WaveMLP(*args, **kwargs):
    raise NotImplementedError("WaveMLP: not yet implemented in jittor_mlp_tpu")

