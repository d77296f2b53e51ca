"""sparse_mlp — placeholder, implementation landing in a later milestone."""

def SparseMLP(*args, **kwargs):
    raise NotImplementedError("SparseMLP: not yet implemented in jittor_mlp_tpu")

