"""Multi-device sharding on the virtual 8-CPU mesh + container format."""
import numpy as np
import pytest
import jax

from megalania_tpu.parallel import blocks


def test_container_roundtrip():
    parts = [b"hello block one", b"and block two", b""]
    import lzma
    streams = [
        lzma.compress(p, format=lzma.FORMAT_ALONE) for p in parts
    ]
    blob = blocks.pack_container(streams, [len(p) for p in parts])
    assert blocks.unpack_container(blob) == streams
    assert blocks.decompress(blob) == b"".join(parts)


def test_split_blocks():
    data = bytes(range(100))
    parts = blocks.split_blocks(data, 32)
    assert b"".join(parts) == data
    assert all(len(p) <= 32 for p in parts)
    assert blocks.split_blocks(b"", 32) == [b""]


@pytest.mark.parametrize("n_devices", [2, 8])
def test_dryrun_multichip(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_devices)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, (state, ctx) = ge.entry()
    out = jax.jit(fn)(state, ctx)
    assert int(out.moves_done) > int(state.moves_done)
