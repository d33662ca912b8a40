import gzip
import io

import numpy as np

from wgbs_tools_tpu.formats.bgzf import (
    BgzfReader,
    BgzfWriter,
    MAX_BLOCK_DATA,
    compress_bytes,
)


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "x.gz")
    data = b"hello bgzf world\n" * 100
    with BgzfWriter(path) as w:
        w.write(data)
    # readable by stock gzip (multi-member)
    assert gzip.open(path, "rb").read() == data
    # readable by our reader
    with BgzfReader(path) as r:
        assert r.read() == data


def test_roundtrip_multi_block(tmp_path):
    path = str(tmp_path / "big.gz")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, size=3 * MAX_BLOCK_DATA + 12345, dtype=np.uint8).tobytes()
    with BgzfWriter(path) as w:
        w.write(data)
    assert gzip.open(path, "rb").read() == data
    with BgzfReader(path) as r:
        assert r.read() == data


def test_virtual_offset_seek(tmp_path):
    path = str(tmp_path / "lines.gz")
    lines = [f"line-{i:06d}\n".encode() for i in range(20000)]
    offsets = []
    with BgzfWriter(path) as w:
        for i, ln in enumerate(lines):
            if i % 1000 == 0:
                w.flush_block()
                offsets.append((i, w.virtual_offset))
            w.write(ln)
    with BgzfReader(path) as r:
        for i, voff in offsets:
            r.seek_virtual(voff)
            assert r.readline() == lines[i]


def test_readline_across_blocks(tmp_path):
    path = str(tmp_path / "l.gz")
    # one very long line spanning blocks
    long_line = b"x" * (2 * MAX_BLOCK_DATA) + b"\n"
    with BgzfWriter(path) as w:
        w.write(long_line)
        w.write(b"tail\n")
    with BgzfReader(path) as r:
        assert r.readline() == long_line
        assert r.readline() == b"tail\n"


def test_compress_bytes_gzip_compat():
    data = b"abc" * 1000
    assert gzip.decompress(compress_bytes(data)) == data
