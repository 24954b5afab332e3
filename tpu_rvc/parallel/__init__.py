from .batch import batch_convert, make_batch_graph

__all__ = ["batch_convert", "make_batch_graph"]
