"""Native parallel BGZF codec tests (skipped when no toolchain)."""
import numpy as np
import pytest

from sicelore_tpu.io import bgzf, native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def test_native_roundtrip_with_offsets():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 64, 500_000, dtype=np.uint8).tobytes()
    comp = native.bgzf_compress(data, add_eof=True)
    assert comp.endswith(bgzf.BGZF_EOF)
    back, coff, uoff = native.bgzf_decompress(comp, want_offsets=True)
    assert back == data
    assert uoff[0] == 0 and coff[0] == 0
    assert len(coff) == len(uoff) >= 8  # 500KB / 65280


def test_cross_codec_compat(tmp_path):
    data = bytes(range(256)) * 3000
    p1 = tmp_path / "py.bgzf"
    with bgzf.BGZFWriter(p1, use_native=False) as w:
        w.write(data)
    with bgzf.BGZFReader(p1, use_native=True) as r:
        assert r._native_data is not None
        assert r.read(len(data) + 10) == data
    p2 = tmp_path / "nat.bgzf"
    with bgzf.BGZFWriter(p2, use_native=True) as w:
        w.write(data)
    with bgzf.BGZFReader(p2, use_native=False) as r:
        assert r.read(len(data) + 10) == data


def test_native_virtual_seek(tmp_path):
    p = tmp_path / "x.bgzf"
    offs = []
    with bgzf.BGZFWriter(p, use_native=True) as w:
        for i in range(5):
            offs.append(w.tell_virtual())
            w.write(bytes([i]) * 100_000)
    with bgzf.BGZFReader(p, use_native=True) as r:
        for i in (3, 0, 4):
            r.seek_virtual(offs[i])
            assert r.read(10) == bytes([i]) * 10
    # python reader agrees on the same offsets
    with bgzf.BGZFReader(p, use_native=False) as r:
        r.seek_virtual(offs[2])
        assert r.read(10) == bytes([2]) * 10
