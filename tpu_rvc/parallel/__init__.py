from .batch import batch_convert, make_batch_graph
from .chunks import convert_long
from .fsdp import fsdp_shardings, shard_train_state

__all__ = ["batch_convert", "make_batch_graph", "convert_long",
           "fsdp_shardings", "shard_train_state"]
