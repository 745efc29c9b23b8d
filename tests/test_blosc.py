"""Blosc codec: pure-Python engine cross-validated against real libblosc.

The reference writes every zarr with Blosc(cname='zstd', clevel=6,
shuffle=BITSHUFFLE) (reference predict.py:75-79); these tests prove both
engines speak that exact wire format, so real released datasets /
prediction.zarr files are ingestible and our outputs readable by stock
zarr+numcodecs.
"""
import pathlib

import numpy as np
import pytest

from garmentnets_tpu.data import blosc_codec as bc
from garmentnets_tpu.data import zarrlite

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "blosc_zstd_bitshuffle.bin"

has_lib = bc._LIB is not None


def _cases():
    rng = np.random.RandomState(0)
    smooth = np.cumsum(rng.randn(5000)).astype(np.float32)  # compressible
    return [
        ("f32-smooth", smooth),
        ("f64", np.linspace(0, 1, 3000)),
        ("i64", np.arange(4000, dtype=np.int64)),
        ("u8", rng.randint(0, 4, 10000, dtype=np.uint8)),
        ("f32-random", rng.randn(257).astype(np.float32)),  # odd count
        ("f32-odd-smooth", np.cumsum(                       # odd count,
            rng.randn(257)).astype(np.float32)),            # compressible
        ("incompressible", rng.bytes(4096)),
        ("big-multiblock", np.cumsum(
            rng.randn(200_000)).astype(np.float32)),        # > 256 KiB
        ("empty", np.zeros(0, np.float32)),
    ]


def _buf_and_typesize(data):
    if isinstance(data, bytes):
        return data, 1
    return data.tobytes(), data.dtype.itemsize


@pytest.mark.parametrize("shuffle", [bc.NOSHUFFLE, bc.SHUFFLE, bc.BITSHUFFLE])
@pytest.mark.parametrize("name,data", _cases())
def test_python_roundtrip(name, data, shuffle):
    buf, ts = _buf_and_typesize(data)
    enc = bc.compress(buf, ts, "zstd", 6, shuffle, force_python=True)
    assert bc.decompress(enc, force_python=True) == buf


@pytest.mark.skipif(not has_lib, reason="libblosc not present")
@pytest.mark.parametrize("cname", ["zstd", "zlib"])
@pytest.mark.parametrize("shuffle", [bc.NOSHUFFLE, bc.SHUFFLE, bc.BITSHUFFLE])
@pytest.mark.parametrize("name,data", _cases())
def test_lib_encodes_python_decodes(name, data, shuffle, cname):
    buf, ts = _buf_and_typesize(data)
    enc = bc.compress(buf, ts, cname, 6, shuffle)          # real c-blosc
    assert bc.decompress(enc, force_python=True) == buf    # our decoder


@pytest.mark.skipif(not has_lib, reason="libblosc not present")
@pytest.mark.parametrize("shuffle", [bc.NOSHUFFLE, bc.SHUFFLE, bc.BITSHUFFLE])
@pytest.mark.parametrize("name,data", _cases())
def test_python_encodes_lib_decodes(name, data, shuffle):
    buf, ts = _buf_and_typesize(data)
    enc = bc.compress(buf, ts, "zstd", 6, shuffle, force_python=True)
    assert bc.decompress(enc) == buf                       # real c-blosc


def test_committed_fixture_decodes_pure_python():
    """Byte-exact chunk produced by real c-blosc 1.21.3 with the reference's
    exact settings (zstd, clevel 6, BITSHUFFLE, float32)."""
    blob = FIXTURE.read_bytes()
    got = np.frombuffer(bc.decompress(blob, force_python=True), np.float32)
    want = np.sin(np.arange(20000, dtype=np.float32) * 0.01)
    np.testing.assert_array_equal(got, want)


def test_zarrlite_blosc_array_roundtrip(tmp_path):
    root = zarrlite.open(str(tmp_path / "t.zarr"), "w")
    rng = np.random.RandomState(3)
    vol = np.cumsum(rng.randn(40, 33, 7), axis=0).astype(np.float32)
    root.array("wnf", vol, chunks=(16, 16, 7), compressor="blosc")
    back = zarrlite.open(str(tmp_path / "t.zarr"), "r")
    np.testing.assert_array_equal(back["wnf"][:], vol)
    meta = back["wnf"].meta["compressor"]
    assert meta == {"id": "blosc", "cname": "zstd", "clevel": 6,
                    "shuffle": 2, "blocksize": 0}


@pytest.mark.skipif(not has_lib, reason="libblosc not present")
def test_zarrlite_blosc_chunks_decode_with_real_cblosc(tmp_path):
    """Chunks we write must be decodable by the real C library (stand-in for
    stock zarr+numcodecs readers)."""
    root = zarrlite.open(str(tmp_path / "t.zarr"), "w")
    data = np.arange(10000, dtype=np.float64).reshape(100, 100)
    root.array("a", data, chunks=(64, 64), compressor="blosc")
    chunk = (tmp_path / "t.zarr" / "a" / "0.0").read_bytes()
    raw = bc._lib_decompress(chunk)
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.float64).reshape(64, 64), data[:64, :64])


def test_typesize_over_255_clamped():
    """c-blosc caps typesize at 255 (falls back to 1); the header field is
    one byte, so wide unicode dtypes must not crash the encoder."""
    data = np.asarray(["a" * 10, "b" * 3], dtype="<U64")  # itemsize 256
    buf = data.tobytes()
    for force in ([False, True] if has_lib else [True]):
        enc = bc.compress(buf, data.dtype.itemsize, "zstd", 6, bc.BITSHUFFLE,
                          force_python=force)
        assert bc.decompress(enc, force_python=force) == buf


def test_zarrlite_blosc_fallback_to_zlib(tmp_path, monkeypatch):
    """If the blosc codec is unavailable, writes degrade to zlib instead of
    raising after a long compute (predict writes hours of results)."""
    monkeypatch.setitem(zarrlite._CODECS, "blosc", None)
    monkeypatch.delitem(zarrlite._CODECS, "blosc")
    root = zarrlite.open(str(tmp_path / "t.zarr"), "w")
    with pytest.warns(RuntimeWarning, match="blosc codec unavailable"):
        root.array("a", np.arange(10.0), compressor="blosc")
    back = zarrlite.open(str(tmp_path / "t.zarr"), "r")
    assert back["a"].meta["compressor"]["id"] == "zlib"
    np.testing.assert_array_equal(back["a"][:], np.arange(10.0))
