from . import multihost
from .mesh import make_mesh
from .pipeline import pipeline_runner, pipeline_shardings
from .sequence import token_parallel_mixer_runner
from .train import cross_entropy_loss, make_train_step, shard_params

__all__ = [
    "multihost",
    "make_mesh",
    "make_train_step",
    "shard_params",
    "cross_entropy_loss",
    "pipeline_runner",
    "pipeline_shardings",
    "token_parallel_mixer_runner",
]
