"""Literal ports of reference kernels, used ONLY as pytest oracles.

Each module is a straight transcription of the reference's (or its
runtime dependency's) algorithm, written naively on purpose — no
caching, no fast paths — so the engine kernels have an independent
implementation to be golden-tested against.
"""
