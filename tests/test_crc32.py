"""CRC-32 parity tests against the CCRC32 algorithm's standard check vectors.

The reference implementation (/root/reference/lib/CCRC32/src/CCRC32.cpp) is the
canonical reflected CRC-32; its table is generated from polynomial 0x04C11DB7
with bit-reflection, so its outputs are the standard CRC-32/ISO-HDLC values —
checkable against published vectors without running the C++.
"""

import json
import os

from abcsmc_tpu.crc32 import (
    database_crc,
    file_crc,
    full_crc,
    partial_crc,
    verify_checkpoint,
)


def test_standard_check_vector():
    # The canonical CRC-32 check value: CRC("123456789") == 0xCBF43926.
    assert full_crc(b"123456789") == 0xCBF43926


def test_known_vectors():
    assert full_crc(b"") == 0x00000000
    assert full_crc(b"a") == 0xE8B7BE43
    assert full_crc(b"abc") == 0x352441C2


def test_partial_chains_to_full():
    data = os.urandom(10_000)
    crc = 0
    for start in range(0, len(data), 997):
        crc = partial_crc(crc, data[start : start + 997])
    assert crc == full_crc(data)


def test_file_crc_matches_buffer(tmp_path):
    data = os.urandom(5_000_000)
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    assert file_crc(p) == full_crc(data)
    # Buffer size must not change the answer (CCRC32.h:22 overload).
    assert file_crc(p, buffer_size=4096) == full_crc(data)


def test_database_crc_stamp(tmp_path):
    p = tmp_path / "run.sqlite"
    p.write_bytes(b"SQLite format 3\x00" + b"\x00" * 100)
    stamp = database_crc(p)
    assert stamp["bytes"] == 116
    assert stamp["crc32"] == f"{full_crc(p.read_bytes()):08x}"


def test_full_crc_accepts_memoryview_zero_copy():
    data = bytearray(os.urandom(4096))
    assert full_crc(memoryview(data)) == full_crc(bytes(data))
    assert partial_crc(0, memoryview(data)) == full_crc(bytes(data))


def test_verify_checkpoint_detects_corruption(tmp_path):
    p = tmp_path / "ckpt.sqlite"
    p.write_bytes(os.urandom(2048))
    with open(f"{p}.crc.json", "w") as fh:
        json.dump(database_crc(p), fh)
    assert verify_checkpoint(p) is True
    # mtime-only changes (a copy) must still verify
    os.utime(p, (0, 0))
    assert verify_checkpoint(p) is True
    # a flipped byte must not
    blob = bytearray(p.read_bytes())
    blob[100] ^= 0xFF
    p.write_bytes(blob)
    assert verify_checkpoint(p) is False
    # and a missing stamp is a clean False, not an exception
    assert verify_checkpoint(tmp_path / "nope.sqlite") is False
    # a stamp whose checkpoint was lost in transit is ALSO a clean False -
    # the arrival-verification scenario this function exists for
    lost = tmp_path / "lost.sqlite"
    lost.write_bytes(b"payload")
    with open(f"{lost}.crc.json", "w") as fh:
        json.dump(database_crc(lost), fh)
    os.unlink(lost)
    assert verify_checkpoint(lost) is False
