"""Property-based cross-validation of the Blosc codec implementations.

Random buffers x typesize x shuffle x clevel: the pure-Python engine and
the system libblosc must round-trip each OTHER's output (the wire format
the real CLOTH3D zarrs use). The fixed-vector tests in test_blosc.py pin
known payloads; this sweeps the parameter space.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from garmentnets_tpu.data import blosc_codec as bc


def _buffers():
    return st.tuples(
        st.integers(0, 2 ** 31 - 1),     # content seed
        st.integers(0, 3000),            # length
        st.sampled_from([1, 2, 4, 8]),   # typesize
        st.sampled_from([bc.NOSHUFFLE, bc.SHUFFLE, bc.BITSHUFFLE]),
        st.integers(1, 9),               # clevel
    )


def _make_buf(seed, length, typesize):
    rng = np.random.RandomState(seed)
    # mix of compressible structure and noise, length-aligned to typesize
    n = max(typesize, (length // typesize) * typesize)
    a = (rng.randint(0, 7, size=n).astype(np.uint8)
         + np.arange(n, dtype=np.uint8) // 16)
    return a.tobytes()


@settings(max_examples=40, deadline=None)
@given(_buffers())
def test_python_engine_roundtrip(args):
    seed, length, typesize, shuffle, clevel = args
    buf = _make_buf(seed, length, typesize)
    enc = bc.compress(buf, typesize, cname="zstd", clevel=clevel,
                      shuffle=shuffle, force_python=True)
    assert bytes(bc.decompress(enc, force_python=True)) == buf


@settings(max_examples=40, deadline=None)
@given(_buffers())
def test_cross_engine_roundtrip(args):
    if bc._LIB is None:
        pytest.skip("system libblosc unavailable")
    seed, length, typesize, shuffle, clevel = args
    buf = _make_buf(seed, length, typesize)
    # python-encoded chunks decode through the C library...
    enc_py = bc.compress(buf, typesize, cname="zstd", clevel=clevel,
                         shuffle=shuffle, force_python=True)
    assert bytes(bc.decompress(enc_py)) == buf
    # ...and real c-blosc chunks decode through the pure-Python engine
    enc_c = bc.compress(buf, typesize, cname="zstd", clevel=clevel,
                        shuffle=shuffle)
    assert bytes(bc.decompress(enc_c, force_python=True)) == buf
