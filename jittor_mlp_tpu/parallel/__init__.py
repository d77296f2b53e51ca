from .mesh import make_mesh
from .train import make_train_step, shard_params, cross_entropy_loss

__all__ = ["make_mesh", "make_train_step", "shard_params", "cross_entropy_loss"]
