from .base import VOCODERS, BaseVocoder, get_vocoder_cls, register_vocoder
from . import generator
from .hifigan import HifiGAN, PWG
from .nsf_hifigan import NsfHifiGAN

__all__ = ["VOCODERS", "BaseVocoder", "get_vocoder_cls", "register_vocoder",
           "generator", "HifiGAN", "PWG", "NsfHifiGAN"]
from .istft_head import IstftVocoder
