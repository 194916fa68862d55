"""Relational operators: mention detection, candidate generation (+Levi
hypernym filter), evidence selection, dedup family, ANN, multimodal."""
