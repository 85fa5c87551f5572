"""TPU-native rebuild — see package docstring."""
