from .rel_attention import banded_rel_attention

__all__ = ["banded_rel_attention"]
