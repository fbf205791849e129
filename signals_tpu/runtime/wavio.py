"""Minimal RIFF/WAVE read & write (PCM16 and IEEE float32).

The reference delegates sound-file IO to libsndfile via the ``soundfile``
package (``src/signals/chain/files.py:8,44``); neither is available here and
the framework only needs seekable float32 block IO, so this is a small
self-contained implementation.
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
        if audio_fmt == _FMT_PCM and bits != 16:
            raise WavError(f'{self.path}: only 16-bit PCM supported')
        if audio_fmt == _FMT_FLOAT and bits != 32:
            raise WavError(f'{self.path}: only 32-bit float supported')
        self.is_float = audio_fmt == _FMT_FLOAT
        self.channels = channels
        self.rate = rate
        self._frame_bytes = block_align
        self.frames = data_size // block_align

    def read(self, position: int, frames: int) -> np.ndarray:
        """Read ``frames`` frames at absolute frame ``position`` as float32
        ``(frames, channels)``; out-of-range regions are zero-filled."""
        out = np.zeros((frames, self.channels), dtype=np.float32)
        start = max(position, 0)
        stop = min(position + frames, self.frames)
        if stop > start:
            self._f.seek(self._data_offset + start * self._frame_bytes)
            raw = self._f.read((stop - start) * self._frame_bytes)
            if self.is_float:
                data = np.frombuffer(raw, dtype='<f4')
            else:
                data = np.frombuffer(raw, dtype='<i2').astype(np.float32) / 32768.0
            data = data.reshape(-1, self.channels)
            out[start - position:start - position + data.shape[0]] = data
        return out

    def close(self) -> None:
        self._f.close()


class WavWriter:
    """Sequential float32 frame writer; header finalized on close."""

    def __init__(self, path, *, rate: int, channels: int):
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.frames = 0
        self._f = self.path.open('wb')
        self._write_header()

    def _write_header(self) -> None:
        data_size = self.frames * self.channels * 4
        self._f.seek(0)
        self._f.write(struct.pack(
            '<4sI4s4sIHHIIHH4sI',
            b'RIFF', 36 + data_size, b'WAVE',
            b'fmt ', 16, _FMT_FLOAT, self.channels, self.rate,
            self.rate * self.channels * 4, self.channels * 4, 32,
            b'data', data_size))

    def write(self, block: np.ndarray) -> None:
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[1] != self.channels:
            block = np.broadcast_to(block, (block.shape[0], self.channels))
        self._f.seek(0, 2)
        self._f.write(np.ascontiguousarray(block).astype('<f4').tobytes())
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
