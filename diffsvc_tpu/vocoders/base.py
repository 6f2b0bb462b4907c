"""Vocoder registry + duck-typed interface.

Parity: reference ``network/vocoders/base_vocoder.py:2-39`` — classes
register under their name and lowercase name; config strings may also be
dotted import paths. Interface: ``spec2wav(mel, f0=...)`` instance method +
``wav2spec(path)`` staticmethod.
"""

from __future__ import annotations

import importlib

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(hp):
    name = hp["vocoder"]
    if name in VOCODERS:
        return VOCODERS[name]
    short = name.split(".")[-1]
    if short in VOCODERS:
        return VOCODERS[short]
    # snake_case aliases (e.g. 'nsf_hifigan' -> NsfHifiGAN)
    compact = short.replace("_", "").lower()
    if compact in VOCODERS:
        return VOCODERS[compact]
    pkg = ".".join(name.split(".")[:-1])
    # map reference module paths onto this package
    pkg = pkg.replace("network.vocoders", "diffsvc_tpu.vocoders")
    return getattr(importlib.import_module(pkg), short)


class BaseVocoder:
    def spec2wav(self, mel, **kwargs):
        """:param mel: [T, M] log10-mel; :return: wav [T']"""
        raise NotImplementedError

    @staticmethod
    def wav2spec(wav_fn):
        """:param wav_fn: path; :return: (wav, mel [T, M])"""
        raise NotImplementedError
