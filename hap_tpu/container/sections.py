"""Hap section-header codec.

Wire format (spec HapVideoDRAFT.md:36-44; reference hap.c:137-212):

* 4-byte header: bytes 0-2 = little-endian uint24 section length (excluding
  the header), byte 3 = section type.
* 8-byte header: bytes 0-2 are all zero, byte 3 = section type, bytes 4-7 =
  little-endian uint32 section length.

The 8-byte form is selected by writers for sections whose length exceeds
0xFFFFFF, and signalled on the wire by the three zero bytes.
"""

from __future__ import annotations

from typing import Tuple

from hap_tpu.constants import HapError, HapResult


def read_section_header(buf, offset: int = 0) -> Tuple[int, int, int]:
    """Parse one section header at ``offset`` in ``buf``.

    Returns ``(header_length, section_length, section_type)``.

    Bounds semantics match the reference parser (hap.c:137-187): the buffer
    must hold the full header, and the section body must not extend past the
    end of the buffer.
    """
    view = memoryview(buf)
    avail = len(view) - offset
    if avail < 4:
        raise HapError(HapResult.BAD_FRAME, "buffer too small for section header")
    b = view[offset : offset + 4]
    section_length = b[0] | (b[1] << 8) | (b[2] << 16)
    if section_length == 0:
        if avail < 8:
            raise HapError(HapResult.BAD_FRAME, "buffer too small for 8-byte header")
        e = view[offset + 4 : offset + 8]
        section_length = e[0] | (e[1] << 8) | (e[2] << 16) | (e[3] << 24)
        header_length = 8
    else:
        header_length = 4
    section_type = b[3]
    if header_length + section_length > avail:
        raise HapError(
            HapResult.BAD_FRAME,
            f"section extends beyond buffer ({header_length}+{section_length} > {avail})",
        )
    return header_length, section_length, section_type


def write_section_header(header_length: int, section_length: int, section_type: int) -> bytes:
    """Emit a 4- or 8-byte section header (hap.c:189-212)."""
    if header_length == 4:
        if section_length > 0xFFFFFF:
            raise HapError(HapResult.BAD_ARGUMENTS, "section too long for 4-byte header")
        return bytes(
            (
                section_length & 0xFF,
                (section_length >> 8) & 0xFF,
                (section_length >> 16) & 0xFF,
                section_type & 0xFF,
            )
        )
    if header_length != 8:
        raise HapError(HapResult.BAD_ARGUMENTS, f"bad header length {header_length}")
    return bytes(
        (
            0,
            0,
            0,
            section_type & 0xFF,
            section_length & 0xFF,
            (section_length >> 8) & 0xFF,
            (section_length >> 16) & 0xFF,
            (section_length >> 24) & 0xFF,
        )
    )
