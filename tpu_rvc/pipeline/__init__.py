from .vc import Pipeline, VC

__all__ = ["Pipeline", "VC"]
