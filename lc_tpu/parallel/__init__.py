from .mesh import make_mesh, shard_batch, replicate
from .train_step import TrainState, make_train_step, create_train_state
