"""raft_mlp — placeholder, implementation landing in a later milestone."""

def RaftMLP(*args, **kwargs):
    raise NotImplementedError("RaftMLP: not yet implemented in jittor_mlp_tpu")

