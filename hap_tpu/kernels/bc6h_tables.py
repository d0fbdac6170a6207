"""BC6H (BPTC FLOAT) spec constants: mode table and field-scatter layouts.

Normative source: the BPTC specification (external reference [4] of the Hap
spec, HapVideoDRAFT.md:27,148). BC6H endpoint bits are scattered across the
block in a per-mode order; each layout below lists the fields in stream
order as (field, low_bit_within_field, bit_count, reversed). ``reversed``
matches the spec's ascending-range notation (first-stored bit is the
highest), used by modes 13/14's appended endpoint MSBs.

Endpoint naming follows the spec: (rw,gw,bw)=e0, (rx,gx,bx)=e1,
(ry,gy,by)=e2, (rz,gz,bz)=e3. Two-subset modes store a 5-bit partition
after the endpoint fields, then 46 index bits; one-subset modes store 63
index bits.

BC6H reuses the first 32 two-subset partitions and anchors of BC7.
"""

# mode value (as read from the stream: 2 bits if <2 else 5 bits) ->
#   (mode_bits, NS, EPB, (dr, dg, db) delta widths or None, layout)
# EPB = endpoint precision bits for e0; deltas are signed with the listed
# widths when transformed (delta != None), absolute EPB-bit values otherwise.


def _f(name, lo, n, rev=False):
    return (name, lo, n, rev)


def _run(name, lo, hi):  # bits lo..hi inclusive, LSB-first
    return [(name, b, 1, False) for b in range(lo, hi + 1)]


def _seq(*entries):
    out = []
    for e in entries:
        if isinstance(e, list):
            out.extend(e)
        else:
            out.append(e)
    # flatten singles into uniform (name, lo, n, rev) with n==1 or runs
    return out


MODES6 = {
    0x00: dict(bits=2, ns=2, epb=10, delta=(5, 5, 5), layout=_seq(
        _f("gy", 4, 1), _f("by", 4, 1), _f("bz", 4, 1),
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 5), _f("gz", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 5), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 5), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 5), _f("bz", 2, 1), _f("rz", 0, 5), _f("bz", 3, 1),
    )),
    0x01: dict(bits=2, ns=2, epb=7, delta=(6, 6, 6), layout=_seq(
        _f("gy", 5, 1), _f("gz", 4, 1), _f("gz", 5, 1),
        _f("rw", 0, 7), _f("bz", 0, 1), _f("bz", 1, 1), _f("by", 4, 1),
        _f("gw", 0, 7), _f("by", 5, 1), _f("bz", 2, 1), _f("gy", 4, 1),
        _f("bw", 0, 7), _f("bz", 3, 1), _f("bz", 5, 1), _f("bz", 4, 1),
        _f("rx", 0, 6), _f("gy", 0, 4), _f("gx", 0, 6), _f("gz", 0, 4),
        _f("bx", 0, 6), _f("by", 0, 4), _f("ry", 0, 6), _f("rz", 0, 6),
    )),
    0x02: dict(bits=5, ns=2, epb=11, delta=(5, 4, 4), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 5), _f("rw", 10, 1), _f("gy", 0, 4),
        _f("gx", 0, 4), _f("gw", 10, 1), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 4), _f("bw", 10, 1), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 5), _f("bz", 2, 1), _f("rz", 0, 5), _f("bz", 3, 1),
    )),
    0x06: dict(bits=5, ns=2, epb=11, delta=(4, 5, 4), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 4), _f("rw", 10, 1), _f("gz", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 5), _f("gw", 10, 1), _f("gz", 0, 4),
        _f("bx", 0, 4), _f("bw", 10, 1), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 4), _f("bz", 0, 1), _f("bz", 2, 1),
        _f("rz", 0, 4), _f("gy", 4, 1), _f("bz", 3, 1),
    )),
    0x0A: dict(bits=5, ns=2, epb=11, delta=(4, 4, 5), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 4), _f("rw", 10, 1), _f("by", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 4), _f("gw", 10, 1), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 5), _f("bw", 10, 1), _f("by", 0, 4),
        _f("ry", 0, 4), _f("bz", 1, 1), _f("bz", 2, 1),
        _f("rz", 0, 4), _f("bz", 4, 1), _f("bz", 3, 1),
    )),
    0x0E: dict(bits=5, ns=2, epb=9, delta=(5, 5, 5), layout=_seq(
        _f("rw", 0, 9), _f("by", 4, 1), _f("gw", 0, 9), _f("gy", 4, 1),
        _f("bw", 0, 9), _f("bz", 4, 1),
        _f("rx", 0, 5), _f("gz", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 5), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 5), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 5), _f("bz", 2, 1), _f("rz", 0, 5), _f("bz", 3, 1),
    )),
    0x12: dict(bits=5, ns=2, epb=8, delta=(6, 5, 5), layout=_seq(
        _f("rw", 0, 8), _f("gz", 4, 1), _f("by", 4, 1),
        _f("gw", 0, 8), _f("bz", 2, 1), _f("gy", 4, 1),
        _f("bw", 0, 8), _f("bz", 3, 1), _f("bz", 4, 1),
        _f("rx", 0, 6), _f("gy", 0, 4),
        _f("gx", 0, 5), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 5), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 6), _f("rz", 0, 6),
    )),
    0x16: dict(bits=5, ns=2, epb=8, delta=(5, 6, 5), layout=_seq(
        _f("rw", 0, 8), _f("bz", 0, 1), _f("by", 4, 1),
        _f("gw", 0, 8), _f("gy", 5, 1), _f("gy", 4, 1),
        _f("bw", 0, 8), _f("gz", 5, 1), _f("bz", 4, 1),
        _f("rx", 0, 5), _f("gz", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 6), _f("gz", 0, 4),
        _f("bx", 0, 5), _f("bz", 1, 1), _f("by", 0, 4),
        _f("ry", 0, 5), _f("bz", 2, 1), _f("rz", 0, 5), _f("bz", 3, 1),
    )),
    0x1A: dict(bits=5, ns=2, epb=8, delta=(5, 5, 6), layout=_seq(
        _f("rw", 0, 8), _f("bz", 1, 1), _f("by", 4, 1),
        _f("gw", 0, 8), _f("by", 5, 1), _f("gy", 4, 1),
        _f("bw", 0, 8), _f("bz", 5, 1), _f("bz", 4, 1),
        _f("rx", 0, 5), _f("gz", 4, 1), _f("gy", 0, 4),
        _f("gx", 0, 5), _f("bz", 0, 1), _f("gz", 0, 4),
        _f("bx", 0, 6), _f("by", 0, 4),
        _f("ry", 0, 5), _f("bz", 2, 1), _f("rz", 0, 5), _f("bz", 3, 1),
    )),
    0x1E: dict(bits=5, ns=2, epb=6, delta=None, layout=_seq(
        _f("rw", 0, 6), _f("gz", 4, 1), _f("bz", 0, 1), _f("bz", 1, 1), _f("by", 4, 1),
        _f("gw", 0, 6), _f("gy", 5, 1), _f("by", 5, 1), _f("bz", 2, 1), _f("gy", 4, 1),
        _f("bw", 0, 6), _f("gz", 5, 1), _f("bz", 3, 1), _f("bz", 5, 1), _f("bz", 4, 1),
        _f("rx", 0, 6), _f("gy", 0, 4), _f("gx", 0, 6), _f("gz", 0, 4),
        _f("bx", 0, 6), _f("by", 0, 4), _f("ry", 0, 6), _f("rz", 0, 6),
    )),
    0x03: dict(bits=5, ns=1, epb=10, delta=None, layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 10), _f("gx", 0, 10), _f("bx", 0, 10),
    )),
    0x07: dict(bits=5, ns=1, epb=11, delta=(9, 9, 9), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 9), _f("rw", 10, 1),
        _f("gx", 0, 9), _f("gw", 10, 1),
        _f("bx", 0, 9), _f("bw", 10, 1),
    )),
    0x0B: dict(bits=5, ns=1, epb=12, delta=(8, 8, 8), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 8), _f("rw", 10, 2, True),
        _f("gx", 0, 8), _f("gw", 10, 2, True),
        _f("bx", 0, 8), _f("bw", 10, 2, True),
    )),
    0x0F: dict(bits=5, ns=1, epb=16, delta=(4, 4, 4), layout=_seq(
        _f("rw", 0, 10), _f("gw", 0, 10), _f("bw", 0, 10),
        _f("rx", 0, 4), _f("rw", 10, 6, True),
        _f("gx", 0, 4), _f("gw", 10, 6, True),
        _f("bx", 0, 4), _f("bw", 10, 6, True),
    )),
}

FIELD_NAMES = ("rw", "gw", "bw", "rx", "gx", "bx",
               "ry", "gy", "by", "rz", "gz", "bz")
