from .batch import batch_convert, make_batch_graph
from .chunks import convert_long

__all__ = ["batch_convert", "make_batch_graph", "convert_long"]
