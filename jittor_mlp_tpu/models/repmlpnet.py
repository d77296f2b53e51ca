"""repmlpnet — placeholder, implementation landing in a later milestone."""

def create_RepMLPNet_B224(*args, **kwargs):
    raise NotImplementedError("create_RepMLPNet_B224: not yet implemented in jittor_mlp_tpu")


def create_RepMLPNet_B256(*args, **kwargs):
    raise NotImplementedError("create_RepMLPNet_B256: not yet implemented in jittor_mlp_tpu")

