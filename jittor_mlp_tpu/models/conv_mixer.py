"""conv_mixer — placeholder, implementation landing in a later milestone."""

def ConvMixer(*args, **kwargs):
    raise NotImplementedError("ConvMixer: not yet implemented in jittor_mlp_tpu")

