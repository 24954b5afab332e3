from .modules import Conv1d, ConvTranspose1d, LayerNorm1d, WN, ResBlock1, ResBlock2
from .attention import MultiHeadRelAttention, FFN, Encoder
from .encoders import TextEncoder, PosteriorEncoder
from .flows import ResidualCouplingBlock
from .generators import Generator, NSFGenerator, SineGenerator, SourceModuleHnNSF
from .discriminators import MultiPeriodDiscriminator

__all__ = [
    "Conv1d", "ConvTranspose1d", "LayerNorm1d", "WN", "ResBlock1", "ResBlock2",
    "MultiHeadRelAttention", "FFN", "Encoder",
    "TextEncoder", "PosteriorEncoder",
    "ResidualCouplingBlock",
    "Generator", "NSFGenerator", "SineGenerator", "SourceModuleHnNSF",
    "MultiPeriodDiscriminator",
]
