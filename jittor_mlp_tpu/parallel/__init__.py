from . import multihost
from .mesh import make_mesh
from .pipeline import pipeline_runner, pipeline_shardings
from .sequence import token_parallel_mixer_runner, token_parallel_runner
from .train import cross_entropy_loss, make_train_step, shard_params

# zoo-wide runner installation (nnf.scan_blocks consults this scope), for
# families without an explicit block_runner= kwarg
from ..core.nnf import block_runner_scope

__all__ = [
    "multihost",
    "make_mesh",
    "make_train_step",
    "shard_params",
    "cross_entropy_loss",
    "pipeline_runner",
    "pipeline_shardings",
    "token_parallel_mixer_runner",
    "token_parallel_runner",
    "block_runner_scope",
]
