"""OpenPGP symmetric codec: RFC 4880 wire format + GnuPG interop."""

import os
import shutil
import subprocess

import pytest

from gobblin_spark.functions import pgp

PW = "unit-test-passphrase"
GPG = shutil.which("gpg")


def _gpg(args, **kw):
    return subprocess.run(
        ["gpg", "--batch", "--yes", "--passphrase", PW, *args],
        capture_output=True, **kw,
    )


def test_roundtrip_all_keylens():
    data = os.urandom(1000) + b"tail"
    for keylen in (16, 24, 32):
        blob = pgp.pgp_symmetric_encrypt(data, PW, keylen=keylen)
        assert pgp.pgp_symmetric_decrypt(blob, PW) == data


def test_roundtrip_empty_and_large():
    assert pgp.pgp_symmetric_decrypt(pgp.pgp_symmetric_encrypt(b"", PW), PW) == b""
    big = os.urandom(200_000)
    assert pgp.pgp_symmetric_decrypt(pgp.pgp_symmetric_encrypt(big, PW), PW) == big


def test_wrong_passphrase_rejected():
    blob = pgp.pgp_symmetric_encrypt(b"secret", PW)
    with pytest.raises(ValueError):
        pgp.pgp_symmetric_decrypt(blob, "wrong")


def test_tamper_detected_by_mdc():
    blob = bytearray(pgp.pgp_symmetric_encrypt(b"integrity matters", PW))
    blob[-1] ^= 0x01  # flip a bit inside the encrypted MDC trailer
    with pytest.raises(ValueError):
        pgp.pgp_symmetric_decrypt(bytes(blob), PW)


def test_s2k_iterated_count_decode():
    # count code 0x60 → (16+0) << (6+6) = 65536 total hashed bytes
    key1 = pgp.s2k_derive(b"pw", 16, 3, 2, b"saltsalt", 0x60)
    key2 = pgp.s2k_derive(b"pw", 16, 3, 2, b"saltsalt", 0x60)
    key3 = pgp.s2k_derive(b"pw", 16, 3, 2, b"SALTSALT", 0x60)
    assert key1 == key2 != key3
    assert len(pgp.s2k_derive(b"pw", 32, 3, 2, b"saltsalt", 0x60)) == 32


@pytest.mark.skipif(GPG is None, reason="gpg binary not available")
def test_gnupg_decrypts_our_output(tmp_path):
    data = b"from gobblin_spark to gnupg\n" * 20
    p = tmp_path / "x.gpg"
    p.write_bytes(pgp.pgp_symmetric_encrypt(data, PW))
    out = _gpg(["--decrypt", str(p)])
    assert out.returncode == 0, out.stderr
    assert out.stdout == data


@pytest.mark.skipif(GPG is None, reason="gpg binary not available")
@pytest.mark.parametrize("cipher", ["AES", "AES192", "AES256"])
def test_we_decrypt_gnupg_output(tmp_path, cipher):
    data = b"from gnupg to gobblin_spark\n" * 20
    src = tmp_path / f"y-{cipher}"
    src.write_bytes(data)
    out = _gpg(
        ["--symmetric", "--cipher-algo", cipher,
         "--output", str(src) + ".gpg", str(src)]
    )
    assert out.returncode == 0, out.stderr
    # gpg compresses by default → exercises the tag-8 decompress path
    assert pgp.pgp_symmetric_decrypt((src.parent / (src.name + ".gpg")).read_bytes(), PW) == data


@pytest.mark.skipif(GPG is None, reason="gpg binary not available")
def test_we_decrypt_gnupg_uncompressed(tmp_path):
    data = os.urandom(5000)
    src = tmp_path / "z"
    src.write_bytes(data)
    out = _gpg(
        ["--symmetric", "--compress-algo", "none",
         "--output", str(src) + ".gpg", str(src)]
    )
    assert out.returncode == 0, out.stderr
    assert pgp.pgp_symmetric_decrypt((src.parent / (src.name + ".gpg")).read_bytes(), PW) == data
