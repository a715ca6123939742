"""Legacy ``.xls`` FILEPASS encryption — RC4 standard and RC4
CryptoAPI ([MS-OFFCRYPTO] §2.3.6 / §2.3.5, [MS-XLS] §2.2.10).

Reference parity: the reference pipeline dead-letters any fetched
document it cannot decode; password-protected BIFF8 workbooks — and in
particular files encrypted under Excel's well-known default password
``VelvetSweatshop``, which every conforming reader opens WITHOUT
prompting — are recoverable, so dropping them is corpus loss.  This
module implements both RC4 families the FILEPASS record (0x002F) can
carry:

- **RC4 standard** (EncryptionVersionInfo 1.1, §2.3.6): MD5 key
  derivation — ``H0 = MD5(password_utf16le)``, ``intermediate =
  MD5((H0[:5] + salt) * 16)``, per-block key ``MD5(intermediate[:5] +
  LE32(block))[:16]`` — with the 16-byte verifier/verifier-hash pair
  decrypted under block 0 and checked via MD5;
- **RC4 CryptoAPI** (vMajor 2/3/4, vMinor 2, §2.3.5): SHA-1 key
  derivation — ``H0 = SHA1(salt + password_utf16le)``, per-block key
  ``SHA1(H0 + LE32(block))[:keybits//8]`` (40-bit keys zero-padded to
  16 bytes) — binary EncryptionHeader (AlgID 0x6801) + verifier with a
  20-byte SHA-1 hash.

Stream discipline ([MS-XLS] §2.2.10.3): the RC4 keystream covers EVERY
byte of the Workbook stream and re-keys at each 1024-byte ABSOLUTE
offset boundary, but record headers (type + size), the entire BOF and
FILEPASS records, the protection records (InterfaceHdr, UsrExcl,
FileLock, RRDInfo, RRDHeadCopy) and the 4-byte ``lbPlyPos`` field of
every BoundSheet8 stay plaintext — the writer skips their bytes while
still advancing the keystream, and the reader mirrors that walk (the
headers being plaintext is what makes the walk possible at all).

XOR obfuscation (wEncryptionType 0) raises NotImplementedError BY
NAME: its key derivation needs the [MS-OFFCRYPTO] §2.3.7.2 constant
tables (InitialCode/XorMatrix), which cannot be transcribed verifiably
in this environment (no external validator); RC4 covers the
password-protected corpus Excel 97+ actually writes by default.  A
wrong password raises ValueError("xls password incorrect").
"""

from __future__ import annotations

import hashlib
import struct

from pasardassist_spark.operators.pdfcrypt import rc4

__all__ = [
    "DEFAULT_XLS_PASSWORD",
    "make_filepass",
    "parse_filepass",
    "decrypt_biff_stream",
    "encrypt_biff_stream",
]

# Excel's well-known default: workbooks encrypted under it open without
# a prompt in every conforming reader.
DEFAULT_XLS_PASSWORD = "VelvetSweatshop"

_REKEY_BLOCK = 1024

# records whose PAYLOAD stays plaintext ([MS-XLS] 2.2.10.3)
_PLAINTEXT_RECORDS = frozenset(
    {
        0x0809,  # BOF
        0x002F,  # FilePass
        0x00E1,  # InterfaceHdr
        0x0194,  # UsrExcl
        0x0195,  # FileLock
        0x0196,  # RRDInfo
        0x0138,  # RRDHeadCopy
    }
)
_BOUNDSHEET = 0x0085


def _utf16(password: str) -> bytes:
    return password.encode("utf-16-le")


# ----------------------------------------------------------- standard ----


def _standard_intermediate(password: str, salt: bytes) -> bytes:
    h0 = hashlib.md5(_utf16(password)).digest()
    return hashlib.md5((h0[:5] + salt) * 16).digest()


def _standard_block_key(intermediate: bytes, block: int) -> bytes:
    return hashlib.md5(
        intermediate[:5] + struct.pack("<I", block)
    ).digest()


# ---------------------------------------------------------- cryptoapi ----


def _cryptoapi_h0(password: str, salt: bytes) -> bytes:
    return hashlib.sha1(salt + _utf16(password)).digest()


def _cryptoapi_block_key(h0: bytes, block: int, key_bits: int) -> bytes:
    key = hashlib.sha1(h0 + struct.pack("<I", block)).digest()[
        : key_bits // 8
    ]
    if key_bits == 40:  # §2.3.5.2: 40-bit keys zero-pad to 16 bytes
        key += b"\x00" * 11
    return key


class _Rc4Keystream:
    """Per-rekey-block RC4 keystream addressed by absolute offset.
    BIFF8 re-keys every 1024 bytes; the Word binary format uses the
    same construction with 512-byte blocks ([MS-DOC] §2.2.6.2)."""

    def __init__(self, block_key_fn, block_size: int = _REKEY_BLOCK):
        self._fn = block_key_fn
        self._size = block_size
        self._block = -1
        self._ks = b""

    def key_for_block(self, block: int) -> bytes:
        """The raw RC4 key for an arbitrary block number — the hook
        [MS-PPT] persist-object decryption uses (block = persistId,
        one continuous RC4 run per object, no 1024-byte rekey)."""
        return self._fn(block)

    def _ks_for(self, block: int) -> bytes:
        if block != self._block:
            # RC4 over zeros == the raw keystream for this block
            self._ks = rc4(self._fn(block), bytes(self._size))
            self._block = block
        return self._ks

    def xor(self, data: bytes, offset: int) -> bytes:
        """XOR ``data`` (at absolute stream ``offset``) with the
        keystream — chunk-at-a-time big-int XOR, never per byte."""
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            block, within = divmod(offset + i, self._size)
            take = min(n - i, self._size - within)
            ks = self._ks_for(block)[within : within + take]
            chunk = data[i : i + take]
            out += (
                int.from_bytes(chunk, "big") ^ int.from_bytes(ks, "big")
            ).to_bytes(take, "big")
            i += take
        return bytes(out)


# ------------------------------------------------------------ FILEPASS ---


def make_filepass(
    password: str, salt: bytes, variant: str = "standard",
    key_bits: int = 128,
) -> tuple[bytes, _Rc4Keystream]:
    """Build the FILEPASS record payload for ``variant`` ("standard" or
    "cryptoapi") and return (payload, keystream).  ``salt`` must be 16
    bytes and deterministic for fixture reproducibility."""
    if len(salt) != 16:
        raise ValueError("FILEPASS salt must be 16 bytes")
    if variant == "standard":
        inter = _standard_intermediate(password, salt)
        ks = _Rc4Keystream(lambda b: _standard_block_key(inter, b))
        verifier = hashlib.md5(salt + b"filepass-verifier").digest()
        vhash = hashlib.md5(verifier).digest()
        enc = rc4(_standard_block_key(inter, 0), verifier + vhash)
        payload = (
            struct.pack("<HHH", 1, 1, 1)  # wEncryptionType=1, vMajor=1, vMinor=1
            + salt
            + enc[:16]
            + enc[16:32]
        )
        return payload, ks
    if variant == "cryptoapi":
        h0 = _cryptoapi_h0(password, salt)
        ks = _Rc4Keystream(
            lambda b: _cryptoapi_block_key(h0, b, key_bits)
        )
        verifier = hashlib.sha1(salt + b"filepass-verifier").digest()[:16]
        vhash = hashlib.sha1(verifier).digest()
        enc = rc4(
            _cryptoapi_block_key(h0, 0, key_bits), verifier + vhash
        )
        csp = "Microsoft Base Cryptographic Provider v1.0\x00".encode(
            "utf-16-le"
        )
        header = struct.pack(
            "<IIIIIIII",
            0x0000000C,  # flags: fCryptoAPI
            0,  # sizeExtra
            0x00006801,  # AlgID: RC4
            0x00008004,  # AlgIDHash: SHA-1
            key_bits,
            0x00000001,  # providerType: RC4
            0,
            0,
        ) + csp
        verifier_blob = (
            struct.pack("<I", 16)
            + salt
            + enc[:16]
            + struct.pack("<I", 20)
            + enc[16:36]
        )
        payload = (
            struct.pack("<HHH", 1, 2, 2)  # wEncryptionType=1, vMajor=2, vMinor=2
            + struct.pack("<II", 0x0000000C, len(header))
            + header
            + verifier_blob
        )
        return payload, ks
    raise ValueError(f"unknown FILEPASS variant {variant!r}")


def parse_filepass(payload: bytes, password: str) -> _Rc4Keystream:
    """Authenticate ``password`` against a FILEPASS payload and return
    the keystream.  Tries the caller's password, then (if empty) Excel's
    default ``VelvetSweatshop``.  A torn payload raises ValueError (the
    module contract), never struct.error."""
    try:
        return _parse_filepass(payload, password)
    except struct.error as exc:
        raise ValueError(f"xls: torn FILEPASS record: {exc}") from exc


def _parse_filepass(payload: bytes, password: str) -> _Rc4Keystream:
    if len(payload) < 2:
        raise ValueError("xls: truncated FILEPASS record")
    (wtype,) = struct.unpack("<H", payload[:2])
    if wtype == 0:
        raise NotImplementedError(
            "XOR-obfuscated .xls (FILEPASS wEncryptionType 0) unsupported"
        )
    if wtype != 1:
        raise NotImplementedError(
            f"unknown .xls FILEPASS encryption type {wtype}"
        )
    vmajor, vminor = struct.unpack("<HH", payload[2:6])
    candidates = [password] if password else ["", DEFAULT_XLS_PASSWORD]
    if vmajor == 1 and vminor == 1:  # RC4 standard
        salt = payload[6:22]
        ever, evhash = payload[22:38], payload[38:54]
        if len(evhash) != 16:
            raise ValueError("xls: truncated FILEPASS RC4 header")
        for pw in candidates:
            inter = _standard_intermediate(pw, salt)
            dec = rc4(_standard_block_key(inter, 0), ever + evhash)
            if hashlib.md5(dec[:16]).digest() == dec[16:32]:
                return _Rc4Keystream(
                    lambda b, i=inter: _standard_block_key(i, b)
                )
        raise ValueError("xls password incorrect")
    if vmajor in (2, 3, 4) and vminor == 2:  # RC4 CryptoAPI
        hsize = struct.unpack("<I", payload[10:14])[0]
        header = payload[14 : 14 + hsize]
        if len(header) < 32:
            raise ValueError("xls: truncated FILEPASS CryptoAPI header")
        alg_id, _alg_hash, key_bits = struct.unpack(
            "<III", header[8:20]
        )
        if alg_id != 0x00006801:
            raise NotImplementedError(
                f"xls CryptoAPI AlgID 0x{alg_id:04X} unsupported"
            )
        pos = 14 + hsize
        (salt_size,) = struct.unpack("<I", payload[pos : pos + 4])
        if salt_size != 16:
            raise ValueError(f"xls: bad FILEPASS salt size {salt_size}")
        salt = payload[pos + 4 : pos + 20]
        ever = payload[pos + 20 : pos + 36]
        (vh_size,) = struct.unpack("<I", payload[pos + 36 : pos + 40])
        evhash = payload[pos + 40 : pos + 40 + vh_size]
        if vh_size != 20 or len(evhash) != 20:
            raise ValueError("xls: bad FILEPASS verifier hash size")
        for pw in candidates:
            h0 = _cryptoapi_h0(pw, salt)
            dec = rc4(
                _cryptoapi_block_key(h0, 0, key_bits), ever + evhash
            )
            if hashlib.sha1(dec[:16]).digest() == dec[16:36]:
                return _Rc4Keystream(
                    lambda b, h=h0: _cryptoapi_block_key(h, b, key_bits)
                )
        raise ValueError("xls password incorrect")
    raise NotImplementedError(
        f"xls FILEPASS version {vmajor}.{vminor} unsupported"
    )


# --------------------------------------------------------- stream walk ---


def _plaintext_spans(stream: bytes):
    """Yield (start, end, plaintext) byte spans over a BIFF record
    stream — headers and exempt payloads plaintext, the rest cipher."""
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        opcode, length = struct.unpack("<HH", stream[pos : pos + 4])
        yield pos, pos + 4, True  # header
        body = pos + 4
        end = body + length
        if end > n:
            raise ValueError("xls: truncated record")
        if opcode in _PLAINTEXT_RECORDS:
            yield body, end, True
        elif opcode == _BOUNDSHEET and length >= 4:
            yield body, body + 4, True  # lbPlyPos
            yield body + 4, end, False
        else:
            yield body, end, False
        pos = end


def _apply_keystream(stream: bytes, ks: _Rc4Keystream) -> bytes:
    out = bytearray(stream)
    for start, end, plaintext in _plaintext_spans(stream):
        if not plaintext and end > start:
            out[start:end] = ks.xor(stream[start:end], start)
    return bytes(out)


def decrypt_biff_stream(stream: bytes, password: str = "") -> bytes:
    """Decrypt a Workbook stream in place of its FILEPASS record; the
    returned stream still contains FILEPASS (readers skip it)."""
    # locate FILEPASS among the globals records (headers are plaintext)
    pos = 0
    fp_payload = None
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack("<HH", stream[pos : pos + 4])
        if opcode == 0x002F:
            fp_payload = stream[pos + 4 : pos + 4 + length]
            break
        if opcode == 0x000A:  # EOF of globals — no FILEPASS
            break
        pos += 4 + length
    if fp_payload is None:
        return stream
    ks = parse_filepass(fp_payload, password)
    return _apply_keystream(stream, ks)


def encrypt_biff_stream(
    stream: bytes, ks: _Rc4Keystream
) -> bytes:
    """Writer side: XOR the non-exempt spans (RC4 is symmetric).  The
    stream must ALREADY contain its FILEPASS record so offsets match
    what the reader walks."""
    return _apply_keystream(stream, ks)
