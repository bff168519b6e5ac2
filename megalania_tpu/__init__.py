"""megalania_tpu: a TPU-native LZMA compressor via simulated annealing.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
blackle/Megalania: anneal over LZMA packet parses to minimize the exact
compressed size, with thousands of parallel chains per chip and block
sharding across a device mesh.
"""
__version__ = "0.1.0"
