"""Native emitter must agree byte-for-byte with the Python oracle."""
import lzma

import pytest

from megalania_tpu.models import packets as P
from megalania_tpu.runtime import emit, pyemit

from util import SAMPLES, random_parse


@pytest.fixture(scope="module")
def native():
    if not emit.native_available():
        pytest.skip("native emitter not built")
    return True


def test_native_builds(native):
    assert emit.native_available()


@pytest.mark.parametrize("name", list(SAMPLES))
def test_native_matches_python(name, rng, native):
    data = SAMPLES[name]
    for _ in range(2):
        slab = random_parse(data, rng)
        want = pyemit.emit(data, slab)
        got = emit.emit(data, slab)
        assert got == want, name
        assert lzma.decompress(got, format=lzma.FORMAT_ALONE) == data


def test_native_empty_and_tiny(native):
    for data in (b"", b"Q", b"ab"):
        got = emit.emit(data, P.literal_slab(len(data)))
        assert got == pyemit.emit(data, P.literal_slab(len(data)))
        assert lzma.decompress(got, format=lzma.FORMAT_ALONE) == data
