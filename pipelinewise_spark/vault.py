"""Ansible-vault compatible secret handling.

The reference encrypts connection passwords in project YAMLs with
ansible-vault and decrypts them at load time with the project's master
password (``cli/utils.py:174-234`` delegates to
``ansible.parsing.vault.VaultLib``; the ``encrypt_string`` CLI verb is
``cli/pipelinewise.py:1706-1712``). This engine cannot depend on
ansible, so this module implements the PUBLIC ansible-vault **1.1/1.2
AES256 payload format** directly (format documented in the Ansible
vault docs and ``ansible/parsing/vault/__init__.py``, class
``VaultAES256`` — public GPL code used here as a *format spec*, not
copied):

- KDF: PBKDF2-HMAC-SHA256, 10 000 iterations, 32-byte random salt,
  80 bytes of output = AES key (32) || HMAC key (32) || CTR IV (16);
- cipher: AES-256-CTR over the PKCS7-padded (128-bit blocks)
  plaintext — vault pads even though CTR needs no padding;
- integrity: HMAC-SHA256 over the *ciphertext* (encrypt-then-MAC),
  hex digest;
- envelope: ``hexlify(hexlify(salt) + b"\\n" + hmac_hex + b"\\n" +
  hexlify(ciphertext))``, wrapped at 80 hex chars per line, under a
  ``$ANSIBLE_VAULT;1.1;AES256`` header line (1.2 adds a vault-id
  label as a 4th header field).

Secrets produced here decrypt with stock ``ansible-vault`` and vice
versa — a user migrating a reference project keeps their encrypted
YAMLs and password file as-is.

Primitives come from the ``cryptography`` package (hazmat AES/CTR,
PKCS7, PBKDF2HMAC) — stdlib ``hmac``/``hashlib`` for the MAC check.
"""

from __future__ import annotations

import binascii
import hashlib
import hmac as _hmac
import os

HEADER = "$ANSIBLE_VAULT"
CIPHER = "AES256"
_KDF_ITERATIONS = 10_000
_SALT_LEN = 32
_LINE_WIDTH = 80


class VaultError(ValueError):
    """Malformed vault text, unsupported version, or failed HMAC."""


def is_vault(text: str | bytes) -> bool:
    """True if ``text`` starts with a vault envelope header."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    return text.lstrip().startswith(HEADER + ";")


def _derive_keys(password: bytes, salt: bytes) -> tuple[bytes, bytes, bytes]:
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC

    kdf = PBKDF2HMAC(
        algorithm=hashes.SHA256(),
        length=80,
        salt=salt,
        iterations=_KDF_ITERATIONS,
    )
    blob = kdf.derive(password)
    return blob[:32], blob[32:64], blob[64:80]  # aes_key, hmac_key, iv


def _aes_ctr(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    enc = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _to_bytes(v: str | bytes) -> bytes:
    return v.encode("utf-8") if isinstance(v, str) else v


def encrypt(plaintext: str | bytes, password: str | bytes, *, vault_id: str | None = None) -> str:
    """Plaintext → ansible-vault envelope text (header + wrapped hex).

    With ``vault_id`` the 1.2 header variant is emitted
    (``$ANSIBLE_VAULT;1.2;AES256;<id>``); otherwise 1.1."""
    b_pass = _to_bytes(password)
    b_plain = _to_bytes(plaintext)
    salt = os.urandom(_SALT_LEN)
    aes_key, hmac_key, iv = _derive_keys(b_pass, salt)
    # PKCS7 pad to the AES block size — the format requires it even
    # though CTR mode does not
    pad = 16 - len(b_plain) % 16
    ciphertext = _aes_ctr(aes_key, iv, b_plain + bytes([pad]) * pad)
    mac_hex = _hmac.new(hmac_key, ciphertext, hashlib.sha256).hexdigest()
    inner = b"\n".join(
        [
            binascii.hexlify(salt),
            mac_hex.encode("ascii"),
            binascii.hexlify(ciphertext),
        ]
    )
    payload = binascii.hexlify(inner).decode("ascii")
    if vault_id:
        header = f"{HEADER};1.2;{CIPHER};{vault_id}"
    else:
        header = f"{HEADER};1.1;{CIPHER}"
    lines = [
        payload[i : i + _LINE_WIDTH] for i in range(0, len(payload), _LINE_WIDTH)
    ]
    return "\n".join([header] + lines) + "\n"


def decrypt(vaulttext: str | bytes, password: str | bytes) -> bytes:
    """Vault envelope text → plaintext bytes. Raises :class:`VaultError`
    on a malformed envelope, unsupported version/cipher, or an HMAC
    mismatch (wrong password or tampered ciphertext)."""
    text = (
        vaulttext.decode("utf-8") if isinstance(vaulttext, bytes) else vaulttext
    )
    lines = [ln.strip() for ln in text.strip().splitlines()]
    if not lines or not lines[0].startswith(HEADER + ";"):
        raise VaultError("not ansible-vault data (missing header)")
    parts = lines[0].split(";")
    if len(parts) < 3 or parts[1] not in ("1.1", "1.2") or parts[2] != CIPHER:
        raise VaultError(f"unsupported vault envelope {lines[0]!r}")
    try:
        inner = binascii.unhexlify("".join(lines[1:]))
        salt_hex, mac_hex, ct_hex = inner.split(b"\n", 2)
        salt = binascii.unhexlify(salt_hex)
        ciphertext = binascii.unhexlify(ct_hex)
    except (binascii.Error, ValueError) as e:
        raise VaultError(f"malformed vault payload: {e}") from e
    aes_key, hmac_key, iv = _derive_keys(_to_bytes(password), salt)
    expect = _hmac.new(hmac_key, ciphertext, hashlib.sha256).hexdigest()
    if not _hmac.compare_digest(expect.encode(), mac_hex):
        raise VaultError("HMAC verification failed (wrong password or corrupted data)")
    padded = _aes_ctr(aes_key, iv, ciphertext)  # CTR: decrypt == encrypt
    pad = padded[-1] if padded else 0
    if not 1 <= pad <= 16 or padded[-pad:] != bytes([pad]) * pad:
        raise VaultError("bad PKCS7 padding after decrypt")
    return padded[:-pad]


def decrypt_text(vaulttext: str | bytes, password: str | bytes) -> str:
    return decrypt(vaulttext, password).decode("utf-8")


def format_ciphertext_yaml(
    vaulttext: str, *, name: str | None = None, indent: int = 10
) -> str:
    """Render envelope text as the YAML ``!vault |`` block the
    ``encrypt_string`` verb prints (reference ``cli/utils.py:240-262``):
    optionally ``name: !vault |`` with the payload indented under it."""
    var = f"{name}: " if name else ""
    pad = " " * indent
    body = "\n".join(
        pad + ln for ln in vaulttext.strip().splitlines()
    )
    return f"{var}!vault |\n{body}"


def load_secret_file(path: str) -> str:
    """Read a vault password file the way ansible's ``FileVaultSecret``
    does: whole file, ALL surrounding whitespace stripped (its
    ``load`` → ``read_file`` → ``.strip()``) — a password file with a
    stray trailing space must derive the same key stock ansible-vault
    derives from it."""
    with open(path, "rb") as fh:
        data = fh.read()
    return data.decode("utf-8").strip()
