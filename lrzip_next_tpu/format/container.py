"""Stream container: rzip chunk framing + per-stream block linked lists.

On-disk layout of one rzip chunk (unencrypted, v0.6+; reference
src/stream.c:1550-1834 ``compthread`` write side and
src/stream.c:1352-1506 / 2022-2195 ``open_stream_in`` / ``fill_buffer``
read side):

    u8   chunk_bytes (w, 1..8)
    u8   eof flag (1 if no chunk follows)
    w    chunk decompressed size (LE)
    -- initial_pos: all block offsets below are relative to here --
    per stream j in {0, 1}: blank header  u8 CTYPE_NONE + w*3 zeros,
        whose final w bytes ("next block head") get patched to the offset
        of stream j's first real block header
    blocks (any physical order, contiguous):
        u8 c_type | w c_len | w u_len | w next_head
        c_len bytes of payload

Each stream's headers form a forward-linked list via next_head offsets
(0 terminates).  The reference patches next_head by seeking back
(src/stream.c:1772-1783); we know every block size up front, so offsets
are computed with a prefix sum and written in one pass - no seeking.
"""

from __future__ import annotations

import dataclasses
import io
from typing import BinaryIO, Iterator, List, Optional, Sequence, Tuple

from .constants import CTYPE_NONE, NUM_STREAMS


@dataclasses.dataclass
class Block:
    """One compressed block belonging to a stream."""

    streamno: int
    c_type: int
    c_len: int
    u_len: int
    payload: bytes  # len == c_len (unencrypted)


@dataclasses.dataclass
class ChunkHeader:
    chunk_bytes: int
    eof: bool
    size: int  # decompressed chunk size


def write_chunk(fd: BinaryIO, chunk_bytes: int, eof: bool, size: int,
                blocks: Sequence[Block]) -> int:
    """Serialise one rzip chunk; returns bytes written.

    ``blocks`` are written in the given physical order; the per-stream
    linked lists are computed up front via a prefix sum over block sizes
    (replacing the reference's seek-back patching, src/stream.c:1772-1783).
    """
    w = chunk_bytes
    out = io.BytesIO()
    out.write(bytes([w, 1 if eof else 0]))
    out.write(size.to_bytes(w, "little"))

    # initial_pos-relative offset layout
    hdr_sz = 1 + 3 * w
    pos = 0
    blank_next_field = []  # offset of the next_head field of each blank hdr
    for _ in range(NUM_STREAMS):
        blank_next_field.append(pos + 1 + 2 * w)
        pos += hdr_sz
    block_ofs = []
    for b in blocks:
        block_ofs.append(pos)
        pos += hdr_sz + len(b.payload)

    # per-stream chains: blank header -> first block -> ... -> 0
    next_of = [0] * len(blocks)
    blank_next = [0] * NUM_STREAMS
    last_seen = [None] * NUM_STREAMS
    for i, b in enumerate(blocks):
        s = b.streamno
        if last_seen[s] is None:
            blank_next[s] = block_ofs[i]
        else:
            next_of[last_seen[s]] = block_ofs[i]
        last_seen[s] = i

    for j in range(NUM_STREAMS):
        out.write(bytes([CTYPE_NONE]))
        out.write((0).to_bytes(w, "little"))
        out.write((0).to_bytes(w, "little"))
        out.write(blank_next[j].to_bytes(w, "little"))
    for i, b in enumerate(blocks):
        if len(b.payload) != b.c_len:
            raise ValueError("payload length does not match c_len")
        out.write(bytes([b.c_type]))
        out.write(b.c_len.to_bytes(w, "little"))
        out.write(b.u_len.to_bytes(w, "little"))
        out.write(next_of[i].to_bytes(w, "little"))
        out.write(b.payload)

    data = out.getvalue()
    fd.write(data)
    return len(data)


def read_chunk_header(fd: BinaryIO) -> Optional[ChunkHeader]:
    """Read the chunk preamble; None at clean EOF."""
    b = fd.read(1)
    if not b:
        return None
    w = b[0]
    if not 1 <= w <= 8:
        raise ValueError(f"chunk_bytes {w} is invalid")
    eof = fd.read(1)[0]
    size = int.from_bytes(fd.read(w), "little")
    return ChunkHeader(chunk_bytes=w, eof=bool(eof), size=size)


@dataclasses.dataclass
class BlockRef:
    """Location/metadata of a block discovered by walking the chain."""

    streamno: int
    c_type: int
    c_len: int
    u_len: int
    data_ofs: int  # absolute file offset of payload


class ChunkReader:
    """Walk one chunk's stream chains and expose blocks.

    Mirrors the validation the reference applies while walking
    (src/stream.c:2091-2109 and src/lrzip.c:1222-1239): header chains must
    move strictly forward and lengths must be positive.
    """

    def __init__(self, fd: BinaryIO, header: ChunkHeader):
        self.fd = fd
        self.header = header
        self.w = header.chunk_bytes
        self.initial_pos = fd.tell()
        self.stream_head: List[int] = []
        self.total_read = 0
        hdr_sz = 1 + 3 * self.w
        for j in range(NUM_STREAMS):
            c_type, c_len, u_len, nxt = self._read_header_at(
                self.initial_pos + j * hdr_sz)
            if c_type != CTYPE_NONE or c_len or u_len:
                raise ValueError(
                    f"unexpected initial stream header (tag {c_type})")
            self.stream_head.append(nxt)
            self.total_read += hdr_sz

    def _read_header_at(self, abs_ofs: int) -> Tuple[int, int, int, int]:
        self.fd.seek(abs_ofs)
        hdr = self.fd.read(1 + 3 * self.w)
        if len(hdr) < 1 + 3 * self.w:
            raise ValueError("truncated block header")
        c_type = hdr[0]
        w = self.w
        c_len = int.from_bytes(hdr[1:1 + w], "little")
        u_len = int.from_bytes(hdr[1 + w:1 + 2 * w], "little")
        nxt = int.from_bytes(hdr[1 + 2 * w:1 + 3 * w], "little")
        return c_type, c_len, u_len, nxt

    def blocks(self, streamno: int) -> Iterator[BlockRef]:
        """Yield the blocks of one stream in chain order."""
        pos = self.stream_head[streamno]
        prev = 0
        while pos:
            if pos <= prev:
                raise ValueError("block chain moves backwards: corrupt")
            c_type, c_len, u_len, nxt = self._read_header_at(
                self.initial_pos + pos)
            self.total_read += 1 + 3 * self.w + c_len
            if c_len == 0 and u_len == 0:
                # empty trailing block (reference writes one when a stream
                # buffer is empty at close, skipped at src/stream.c:2086)
                if nxt:
                    raise ValueError("empty block with successor: corrupt")
                return
            if c_len < 1 or u_len < 1:
                raise ValueError(
                    f"invalid block lengths c_len={c_len} u_len={u_len}")
            yield BlockRef(streamno=streamno, c_type=c_type, c_len=c_len,
                           u_len=u_len,
                           data_ofs=self.initial_pos + pos + 1 + 3 * self.w)
            prev = pos
            pos = nxt

    def read_payload(self, ref: BlockRef) -> bytes:
        self.fd.seek(ref.data_ofs)
        data = self.fd.read(ref.c_len)
        if len(data) < ref.c_len:
            raise ValueError("truncated block payload")
        return data

    def end_offset(self) -> int:
        """Absolute offset just past this chunk's data.

        Matches the reference's initial_pos + total_read bookkeeping
        (src/stream.c:2299-2307 ``close_stream_in``), which assumes blocks
        are contiguous after the chunk header.
        """
        return self.initial_pos + self.total_read
