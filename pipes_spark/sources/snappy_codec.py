"""Pure-Python Snappy codec, implemented from the PUBLIC format
description (google/snappy ``format_description.txt``) — the same no-jar
routing as :mod:`pipes_spark.sources.avro`: the container lacks
python-snappy, so the byte format is coded from its spec.

Decompression is complete (all four element tags, overlapping copies);
compression emits spec-VALID all-literal streams (the format explicitly
permits any element sequence that reproduces the input, and a single
literal run is the degenerate-but-conformant case — interoperable with
every conforming decoder, just without the LZ77 size win). That asymmetry
is the honest contract: reads handle real-world compressed data, writes
produce correct, readable-by-anyone files.

Format summary (from the spec):
- preamble: uncompressed length, little-endian varint (7 bits/byte);
- elements, each starting with a tag byte — low 2 bits select the type:
  00 literal (length-1 in the high 6 bits; values 60-63 mean 1-4 extra
  little-endian length bytes follow), 01 copy with 1-byte offset
  (length = ((tag>>2) & 7) + 4, offset = (tag>>5)<<8 | next byte),
  10 copy with 2-byte little-endian offset (length = (tag>>2) + 1),
  11 copy with 4-byte little-endian offset (same length rule);
- copies may overlap forward (the run-length trick): copy byte-by-byte.
"""

from __future__ import annotations


def snappy_decompress(data: bytes) -> bytes:
    """Decode one Snappy stream. Raises ValueError on malformed input
    (bad varint, offset before stream start, length overrun)."""
    n = len(data)
    pos = 0
    # preamble varint
    out_len = 0
    shift = 0
    while True:
        if pos >= n:
            raise ValueError("snappy: truncated length varint")
        b = data[pos]
        pos += 1
        out_len |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    while pos < n:
        tag = data[pos]
        pos += 1
        typ = tag & 3
        if typ == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: literal overruns input")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if typ == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif typ == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:
            for i in range(ln):  # overlapping copy: byte-by-byte (spec)
                out.append(out[start + i])
    if len(out) != out_len:
        raise ValueError(
            f"snappy: declared {out_len} bytes, decoded {len(out)}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Encode ``data`` as a spec-valid all-literal Snappy stream."""
    out = bytearray()
    ln = len(data)
    while True:  # preamble varint
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            break
    pos = 0
    n = len(data)
    while pos < n:
        chunk = data[pos : pos + (1 << 24)]  # 3 length bytes per literal
        cl = len(chunk) - 1
        if cl < 60:
            out.append(cl << 2)
        elif cl < (1 << 8):
            out.append(60 << 2)
            out += cl.to_bytes(1, "little")
        elif cl < (1 << 16):
            out.append(61 << 2)
            out += cl.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += cl.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)
