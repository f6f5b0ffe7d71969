"""E57 subset reader/writer: round trip + physical-layer integrity."""
import subprocess
import sys

import numpy as np
import pytest

from dcreg_tpu.io.e57 import (crc32c, read_e57, write_e57, _read_numpy,
                              PAGE)

RNG = np.random.default_rng(23)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_round_trip(tmp_path):
    xyz = RNG.normal(0, 10, (5003, 3))
    path = str(tmp_path / "cloud.e57")
    write_e57(path, xyz)
    out = read_e57(path)
    np.testing.assert_allclose(out["xyz"], xyz, rtol=0, atol=0)


def test_round_trip_with_intensity(tmp_path):
    xyz = RNG.normal(0, 3, (257, 3))
    inten = RNG.uniform(0, 1, 257)
    path = str(tmp_path / "cloud_i.e57")
    write_e57(path, xyz, intensity=inten)
    out = _read_numpy(path)       # force the numpy path explicitly
    np.testing.assert_allclose(out["xyz"], xyz)
    np.testing.assert_allclose(out["intensity"], inten)


def test_page_alignment_and_checksum_detection(tmp_path):
    xyz = RNG.normal(0, 1, (100, 3))
    path = str(tmp_path / "c.e57")
    write_e57(path, xyz)
    raw = bytearray(open(path, "rb").read())
    assert len(raw) % PAGE == 0
    raw[PAGE + 7] ^= 0xFF          # corrupt a payload byte on page 1
    bad = str(tmp_path / "bad.e57")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        _read_numpy(bad)


def test_converter_script(tmp_path):
    xyz = RNG.normal(0, 5, (1000, 3))
    e57 = str(tmp_path / "in.e57")
    pcd = str(tmp_path / "out.pcd")
    write_e57(e57, xyz)
    proc = subprocess.run(
        [sys.executable, "scripts/e57_to_pcd.py", e57, pcd,
         "--voxel", "0.0"],
        capture_output=True, text=True, cwd=".")
    assert proc.returncode == 0, proc.stderr
    from dcreg_tpu.io.pcd import load_pcd
    out = load_pcd(pcd)["xyz"]
    np.testing.assert_allclose(out, xyz, atol=1e-5)
