"""Minimal RIFF/WAVE read & write.

Read: PCM 8/16/24/32-bit and IEEE float32/float64 (plus the EXTENSIBLE
wrapper).  Write: IEEE float32 or PCM16.  The reference delegates
sound-file IO to libsndfile via the ``soundfile`` package
(``src/signals/chain/files.py:8,44``); this self-contained implementation
covers seekable block IO without that dependency —
:mod:`signals_tpu.runtime.sndfile` dispatches to libsndfile for other
formats when the package is importable.
"""

from __future__ import annotations

import pathlib
import struct
import typing

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3


class WavError(Exception):
    pass


class WavReader:
    """Seekable frame reader. Supports PCM16 and float32 WAV files."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        self._f = self.path.open('rb')
        self._parse_header()

    def _parse_header(self) -> None:
        f = self._f
        riff, _, wave = struct.unpack('<4sI4s', f.read(12))
        if riff != b'RIFF' or wave != b'WAVE':
            raise WavError(f'{self.path}: not a RIFF/WAVE file')
        self._data_offset = None
        self.frames = 0
        fmt = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            cid, size = struct.unpack('<4sI', header)
            if cid == b'fmt ':
                fmt = f.read(size)
            elif cid == b'data':
                self._data_offset = f.tell()
                data_size = size
                f.seek(size + (size & 1), 1)
            else:
                f.seek(size + (size & 1), 1)
        if fmt is None or self._data_offset is None:
            raise WavError(f'{self.path}: missing fmt/data chunk')
        (audio_fmt, channels, rate, _, block_align, bits) = struct.unpack(
            '<HHIIHH', fmt[:16])
        if audio_fmt == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
            audio_fmt = struct.unpack('<H', fmt[24:26])[0]
        if audio_fmt not in (_FMT_PCM, _FMT_FLOAT):
            raise WavError(f'{self.path}: unsupported format {audio_fmt}')
        if audio_fmt == _FMT_PCM and bits not in (8, 16, 24, 32):
            raise WavError(f'{self.path}: unsupported PCM depth {bits}')
        if audio_fmt == _FMT_FLOAT and bits not in (32, 64):
            raise WavError(f'{self.path}: unsupported float depth {bits}')
        self.is_float = audio_fmt == _FMT_FLOAT
        self.bits = bits
        self.channels = channels
        self.rate = rate
        self._frame_bytes = block_align
        self.frames = data_size // block_align

    def _decode(self, raw: bytes) -> np.ndarray:
        """Raw frame bytes -> float32 in [-1, 1] (PCM) / as stored (float)."""
        if self.is_float:
            dt = '<f4' if self.bits == 32 else '<f8'
            return np.frombuffer(raw, dtype=dt).astype(np.float32)
        if self.bits == 8:          # WAV 8-bit PCM is unsigned
            u = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            return (u - 128.0) / 128.0
        if self.bits == 16:
            return np.frombuffer(raw, dtype='<i2').astype(np.float32) / 32768.0
        if self.bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            i = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            i = np.where(i >= 1 << 23, i - (1 << 24), i)
            return i.astype(np.float32) / float(1 << 23)
        return (np.frombuffer(raw, dtype='<i4').astype(np.float32)
                / float(1 << 31))

    def read(self, position: int, frames: int) -> np.ndarray:
        """Read ``frames`` frames at absolute frame ``position`` as float32
        ``(frames, channels)``; out-of-range regions are zero-filled."""
        out = np.zeros((frames, self.channels), dtype=np.float32)
        start = max(position, 0)
        stop = min(position + frames, self.frames)
        if stop > start:
            self._f.seek(self._data_offset + start * self._frame_bytes)
            raw = self._f.read((stop - start) * self._frame_bytes)
            data = self._decode(raw).reshape(-1, self.channels)
            out[start - position:start - position + data.shape[0]] = data
        return out

    def close(self) -> None:
        self._f.close()


class WavWriter:
    """Sequential frame writer (float32 or PCM16); header finalized on
    close."""

    def __init__(self, path, *, rate: int, channels: int,
                 subtype: str = 'float32'):
        if subtype not in ('float32', 'pcm16'):
            raise WavError(f'unsupported write subtype {subtype!r}')
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.subtype = subtype
        self._sample_bytes = 4 if subtype == 'float32' else 2
        self.frames = 0
        self._f = self.path.open('wb')
        self._write_header()

    def _write_header(self) -> None:
        sb = self._sample_bytes
        data_size = self.frames * self.channels * sb
        fmt = _FMT_FLOAT if self.subtype == 'float32' else _FMT_PCM
        self._f.seek(0)
        self._f.write(struct.pack(
            '<4sI4s4sIHHIIHH4sI',
            b'RIFF', 36 + data_size, b'WAVE',
            b'fmt ', 16, fmt, self.channels, self.rate,
            self.rate * self.channels * sb, self.channels * sb, 8 * sb,
            b'data', data_size))

    def write(self, block: np.ndarray) -> None:
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[1] != self.channels:
            block = np.broadcast_to(block, (block.shape[0], self.channels))
        block = np.ascontiguousarray(block)
        self._f.seek(0, 2)
        if self.subtype == 'float32':
            self._f.write(block.astype('<f4').tobytes())
        else:
            q = np.clip(np.rint(block * 32767.0), -32768, 32767)
            self._f.write(q.astype('<i2').tobytes())
        self.frames += block.shape[0]
        # keep the header valid after every block so the file is readable
        # while recording is still in progress
        self._write_header()
        self._f.flush()

    def close(self) -> None:
        self._write_header()
        self._f.close()


def read_wav(path) -> typing.Tuple[np.ndarray, int]:
    r = WavReader(path)
    try:
        return r.read(0, r.frames), r.rate
    finally:
        r.close()


def write_wav(path, data: np.ndarray, rate: int) -> None:
    data = np.atleast_2d(np.asarray(data, dtype=np.float32))
    if data.shape[0] == 1 and data.shape[1] > 4:
        data = data.T
    w = WavWriter(path, rate=rate, channels=data.shape[1])
    try:
        w.write(data)
    finally:
        w.close()
