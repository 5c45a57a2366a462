"""Crypto / encoding codecs for column payloads.

Reference mapping (all relative to /root/reference/):
- EncryptionFactory + codec registry (gobblin-modules/gobblin-crypto/
  .../EncryptionFactory.java): named codecs applied to writer byte
  streams. Here codecs are Column→Column transforms applied before a
  sink (or after a source) — same composition point, vectorized.
- SimpleStringEncryptor / insecure-shift test codec → base64 pair.
- AES codecs (gobblin-modules/gobblin-crypto/.../EncodingBenchmark.java
  exercises these): Spark's built-in ``aes_encrypt``/``aes_decrypt``
  expressions — JVM-side, whole-stage-codegen, GCM by default (random
  IV per value: ciphertext is non-deterministic, round-trips exactly).
- GPGCodec (gobblin-modules/gobblin-crypto-provider/.../GPGCodec.java):
  password-based symmetric mode implemented from the public RFC 4880
  spec in functions/pgp.py (AES-CFB via the 'cryptography' package),
  interoperable with the gpg binary in both directions; public-key
  keyring mode is the remaining gate.

Key handling: pass the key as bytes/str; 16/24/32-byte keys select
AES-128/192/256 exactly as the underlying expression does.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def base64_encode(col: Column) -> Column:
    """Binary/string → base64 string (SimpleEncoder analog).

    RFC 4648 unchunked: Spark's ``base64`` emits MIME chunking (CRLF
    every 76 chars, Hive-compatible) under the default
    ``spark.sql.legacy.chunkBase64String.enabled`` behavior; the
    reference's commons-codec encoder and other engines (DuckDB,
    Python) are unchunked, so strip the line breaks."""
    return F.regexp_replace(F.base64(col.cast("binary")), "[\\r\\n]", "")


def base64_decode(col: Column) -> Column:
    """Base64 string → binary."""
    return F.unbase64(col)


def aes_encrypt_col(col: Column, key: str | bytes, mode: str = "GCM") -> Column:
    """AES-encrypt a string/binary column (ciphertext binary).

    GCM prepends the random IV and appends the auth tag — safe default;
    use ECB only for legacy compatibility (deterministic, weak)."""
    k = key if isinstance(key, bytes) else key.encode()
    return F.aes_encrypt(col.cast("binary"), F.lit(k), F.lit(mode))


def aes_decrypt_col(col: Column, key: str | bytes, mode: str = "GCM") -> Column:
    k = key if isinstance(key, bytes) else key.encode()
    return F.aes_decrypt(col, F.lit(k), F.lit(mode))


def aes_decrypt_to_string(col: Column, key: str | bytes, mode: str = "GCM") -> Column:
    return aes_decrypt_col(col, key, mode).cast("string")


def gpg_encrypt_col(col: Column, passphrase: str, keylen: int = 16) -> Column:
    """GPGCodec.java password-based symmetric mode: OpenPGP (RFC 4880)
    encryption interoperable with ``gpg -c`` — see functions/pgp.py for
    the packet-level implementation and the gpg-binary interop tests.
    Public-key (keyring) mode remains unimplemented: it would need full
    RFC 4880 public-key packets, which nothing in this sandbox can
    generate or consume end-to-end."""
    from gobblin_spark.functions import pgp

    return pgp.gpg_encrypt_col(col, passphrase, keylen)


def gpg_decrypt_col(col: Column, passphrase: str) -> Column:
    from gobblin_spark.functions import pgp

    return pgp.gpg_decrypt_col(col, passphrase)
