"""sequencer — placeholder, implementation landing in a later milestone."""

def Sequencer2D(*args, **kwargs):
    raise NotImplementedError("Sequencer2D: not yet implemented in jittor_mlp_tpu")

