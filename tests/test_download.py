"""download_with_fallback tests via file:// URLs (zero-egress): primary
success, fallback to the artifacts mirror on primary failure, atomic
landing (no temp litter), and cache-hit short-circuit. Mirrors the
reference `download_with_fallback.jl` semantics."""

import os

import pytest

from climaocean_tpu.data.download import (download_from_artifacts,
                                          download_with_fallback)


@pytest.fixture
def mirror(tmp_path):
    """A fake artifacts mirror directory served via file://."""
    m = tmp_path / "mirror"
    m.mkdir()
    (m / "woa_temperature.npz").write_bytes(b"MIRROR-BYTES")
    return f"file://{m}"


def test_primary_success(tmp_path, mirror):
    src = tmp_path / "primary.bin"
    src.write_bytes(b"PRIMARY-BYTES")
    dst = tmp_path / "cache" / "woa_temperature.npz"
    out = download_with_fallback(f"file://{src}", str(dst), base_url=mirror)
    assert out == str(dst)
    assert dst.read_bytes() == b"PRIMARY-BYTES"


def test_fallback_to_mirror(tmp_path, mirror):
    dst = tmp_path / "cache" / "woa_temperature.npz"
    out = download_with_fallback(f"file://{tmp_path}/missing.bin", str(dst),
                                 base_url=mirror)
    assert dst.read_bytes() == b"MIRROR-BYTES"
    # no temp litter from the failed primary attempt
    litter = [n for n in os.listdir(dst.parent) if n.startswith(".download_")]
    assert litter == []


def test_both_fail_raises_and_no_partial(tmp_path):
    dst = tmp_path / "cache" / "nope.npz"
    with pytest.raises(Exception):
        download_with_fallback(f"file://{tmp_path}/missing.bin", str(dst),
                               base_url=f"file://{tmp_path}/no_mirror")
    assert not dst.exists()


def test_cache_hit_short_circuits(tmp_path, mirror):
    dst = tmp_path / "woa_temperature.npz"
    dst.write_bytes(b"CACHED")
    out = download_with_fallback("file:///definitely/not/there", str(dst),
                                 base_url=mirror)
    assert out == str(dst)
    assert dst.read_bytes() == b"CACHED"


def test_download_from_artifacts(tmp_path, mirror):
    dst = tmp_path / "out.npz"
    download_from_artifacts("woa_temperature.npz", str(dst), base_url=mirror)
    assert dst.read_bytes() == b"MIRROR-BYTES"
