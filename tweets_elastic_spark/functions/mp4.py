"""MP4 / ISO BMFF (ISO/IEC 14496-12) container parsing — pure stdlib.

Scraped multimodal corpora carry video as MP4; a training-data pipeline
needs (a) per-asset metadata (duration, track geometry, codec fourcc)
for filtering/stats and (b) the SAMPLE TABLE — per-frame byte ranges
into ``mdat`` — so frame-level operators (sampling, per-frame sketch
hashing, dedup) can address real frames WITHOUT a codec. This module
provides exactly that: box walking, ``moov`` metadata, and
``stbl``-derived (offset, size) sample ranges. Decoding the frames'
PIXELS (H.264 etc.) genuinely needs ffmpeg and stays a loud
``NotImplementedError`` in functions/multimodal.py — the documented
stub boundary the mandate prescribes.

``build_mp4`` assembles a minimal valid one-video-track file from raw
"frame" blobs — the test-fixture encoder sibling (same pattern as
``encode_png``: it exists so tests drive the parser through real byte
streams, not for production encoding).

Everything is per-payload, driver- or executor-local CPU invoked from
Arrow-batched ``mapInPandas`` — scan-local, never shuffled.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = ["mp4_boxes", "mp4_metadata", "mp4_sample_ranges", "build_mp4"]


def mp4_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield ``(fourcc, body_start, box_end)`` for each box in
    ``buf[start:end]``. Handles 64-bit ``largesize`` (size==1) and
    to-end-of-file boxes (size==0); malformed sizes raise loudly."""
    end = len(buf) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        fourcc = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box header")
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"malformed MP4 box {fourcc!r} at offset {pos} "
                f"(size {size}, container ends at {end})"
            )
        yield fourcc, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError(f"trailing {end - pos} bytes after last MP4 box")


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in mp4_boxes(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox_times(body: bytes, v0_off: int, v1_off: int) -> tuple[int, int]:
    """(timescale, duration) from an mvhd/mdhd-shaped full box: version 0
    stores 32-bit times, version 1 64-bit."""
    version = body[0]
    if version == 0:
        ts, dur = struct.unpack_from(">II", body, v0_off)
    elif version == 1:
        ts = struct.unpack_from(">I", body, v1_off)[0]
        dur = struct.unpack_from(">Q", body, v1_off + 4)[0]
    else:
        raise ValueError(f"unknown full-box version {version}")
    return ts, dur


@dataclass
class Mp4Track:
    track_id: int
    handler: str          # 'vide' / 'soun' / ...
    codec: str            # stsd entry fourcc, e.g. 'avc1', 'mp4a'
    duration_s: float
    n_samples: int
    width: int = 0        # vide tracks; tkhd 16.16 fixed, integer part
    height: int = 0


@dataclass
class Mp4Metadata:
    major_brand: str
    duration_s: float
    tracks: list[Mp4Track] = field(default_factory=list)


def _parse_trak(buf: bytes, b: int, e: int) -> Mp4Track:
    tkhd = _find(buf, b, e, b"tkhd")
    if tkhd is None:
        raise ValueError("MP4 trak without tkhd")
    tb, te = tkhd
    version = buf[tb]
    # tkhd v0: ver/flags 4, ctime 4, mtime 4, track_id 4; v1: 8-byte times
    tid_off = tb + (12 if version == 0 else 20)
    track_id = int.from_bytes(buf[tid_off:tid_off + 4], "big")
    # width/height: the last 8 bytes of tkhd, 16.16 fixed point
    width = int.from_bytes(buf[te - 8:te - 4], "big") >> 16
    height = int.from_bytes(buf[te - 4:te], "big") >> 16

    mdia = _find(buf, b, e, b"mdia")
    if mdia is None:
        raise ValueError("MP4 trak without mdia")
    mb, me = mdia
    mdhd = _find(buf, mb, me, b"mdhd")
    hdlr = _find(buf, mb, me, b"hdlr")
    if mdhd is None or hdlr is None:
        raise ValueError("MP4 mdia without mdhd/hdlr")
    ts, dur = _fullbox_times(buf[mdhd[0]:mdhd[1]], 12, 20)
    handler = buf[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1")

    minf = _find(buf, mb, me, b"minf")
    stbl = _find(buf, minf[0], minf[1], b"stbl") if minf else None
    codec, n_samples = "", 0
    if stbl is not None:
        sb, se = stbl
        stsd = _find(buf, sb, se, b"stsd")
        if stsd is not None and stsd[1] - stsd[0] >= 16:
            codec = buf[stsd[0] + 12:stsd[0] + 16].decode("latin-1")
        stsz = _find(buf, sb, se, b"stsz")
        if stsz is not None:
            n_samples = int.from_bytes(
                buf[stsz[0] + 8:stsz[0] + 12], "big"
            )
    return Mp4Track(
        track_id=track_id, handler=handler, codec=codec,
        duration_s=(dur / ts) if ts else 0.0, n_samples=n_samples,
        width=width, height=height,
    )


def mp4_metadata(payload: bytes) -> Mp4Metadata:
    """Parse ``ftyp`` + ``moov`` into :class:`Mp4Metadata`. Fragmented
    files (``moof``) and missing ``moov`` raise loudly."""
    major = ""
    moov = None
    for fc, b, e in mp4_boxes(payload):
        if fc == b"ftyp":
            major = payload[b:b + 4].decode("latin-1")
        elif fc == b"moov":
            moov = (b, e)
        elif fc == b"moof":
            raise NotImplementedError(
                "fragmented MP4 (moof) is unsupported — remux to a "
                "progressive file"
            )
    if moov is None:
        raise ValueError("MP4 has no moov box (metadata-less or streaming "
                         "remainder)")
    mb, me = moov
    mvhd = _find(payload, mb, me, b"mvhd")
    if mvhd is None:
        raise ValueError("MP4 moov without mvhd")
    ts, dur = _fullbox_times(payload[mvhd[0]:mvhd[1]], 12, 20)
    tracks = [
        _parse_trak(payload, b, e)
        for fc, b, e in mp4_boxes(payload, mb, me)
        if fc == b"trak"
    ]
    return Mp4Metadata(
        major_brand=major,
        duration_s=(dur / ts) if ts else 0.0,
        tracks=tracks,
    )


def mp4_sample_ranges(
    payload: bytes, *, handler: str = "vide"
) -> list[tuple[int, int]]:
    """Per-sample ``(byte_offset, size)`` ranges for the first track with
    the given handler — the sample table decoded from ``stsz`` (sizes),
    ``stco``/``co64`` (chunk offsets) and ``stsc`` (samples-per-chunk
    runs). This is what lets frame operators address real frames without
    a codec: each range slices one access unit out of ``mdat``."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for fc, b, e in mp4_boxes(payload, moov[0], moov[1]):
        if fc != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr") if mdia else None
        if hdlr is None:
            continue
        if payload[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1") != handler:
            continue
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 track without stbl")
        sb, se = stbl

        stsz = _find(payload, sb, se, b"stsz")
        if stsz is None:
            raise ValueError("MP4 stbl without stsz")
        zb = stsz[0]
        fixed = int.from_bytes(payload[zb + 4:zb + 8], "big")
        count = int.from_bytes(payload[zb + 8:zb + 12], "big")
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack_from(f">{count}I", payload, zb + 12))

        co = _find(payload, sb, se, b"stco")
        wide = False
        if co is None:
            co = _find(payload, sb, se, b"co64")
            wide = True
        if co is None:
            raise ValueError("MP4 stbl without stco/co64")
        cb = co[0]
        n_chunks = int.from_bytes(payload[cb + 4:cb + 8], "big")
        fmt = "Q" if wide else "I"
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}{fmt}", payload, cb + 8)
        )

        stsc = _find(payload, sb, se, b"stsc")
        if stsc is None:
            raise ValueError("MP4 stbl without stsc")
        cb2 = stsc[0]
        n_runs = int.from_bytes(payload[cb2 + 4:cb2 + 8], "big")
        runs = [
            struct.unpack_from(">III", payload, cb2 + 8 + 12 * i)
            for i in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_id)

        out: list[tuple[int, int]] = []
        si = 0
        for ri, (first, spc, _) in enumerate(runs):
            last = (runs[ri + 1][0] - 1) if ri + 1 < len(runs) else n_chunks
            for chunk in range(first, last + 1):
                off = chunk_offsets[chunk - 1]
                for _ in range(spc):
                    if si >= len(sizes):
                        break
                    out.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        if si != len(sizes):
            raise ValueError(
                f"MP4 sample table inconsistent: stsc/stco place {si} "
                f"samples, stsz declares {len(sizes)}"
            )
        return out
    raise ValueError(f"MP4 has no {handler!r} track")


def build_mp4(
    frames: list[bytes],
    *,
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    frame_duration: int = 40,
    codec: bytes = b"avc1",
) -> bytes:
    """Assemble a minimal progressive one-video-track MP4 whose ``mdat``
    carries ``frames`` verbatim (one chunk, one sample per frame) — the
    deterministic test-fixture encoder for the parser above."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    n = len(frames)
    dur = n * frame_duration
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">B3xIIII", 0, 0, 0, 1, 0)
               + struct.pack(">I", dur) + b"\x00" * 52
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
               + b"\x00" * 4)
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"v\x00")
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1)
               + box(codec, b"\x00" * 78))
    stts = box(b"stts", struct.pack(">B3xIII", 0, 1, n, frame_duration))
    stsc = box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, n, 1))
    stsz = box(b"stsz", struct.pack(">B3xII", 0, 0, n)
               + b"".join(struct.pack(">I", len(f)) for f in frames))
    # stco needs the mdat body offset: compute with a placeholder first
    def assemble(mdat_off: int) -> bytes:
        stco = box(b"stco", struct.pack(">B3xII", 0, 1, mdat_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        mdat = box(b"mdat", b"".join(frames))
        return ftyp + moov + mdat

    probe = assemble(0)
    mdat_body = len(probe) - len(b"".join(frames))  # offset of mdat payload
    return assemble(mdat_body)
