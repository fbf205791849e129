"""Unified sound-file IO with format dispatch.

The reference reads/writes any format libsndfile supports, lazily opened
and seeked to the requested frame position
(``/root/reference/src/signals/chain/files.py:42-58``).  Here:

* WAV (:mod:`signals_tpu.runtime.wavio`), AIFF and AU/SND are handled by
  self-contained codecs (no dependencies) — covering the interchange
  formats with deterministic, seekable block IO;
* every other format (FLAC, OGG, ...) dispatches to ``soundfile`` /
  libsndfile when the package is importable, and raises a clear error
  otherwise.

All readers expose ``read(position, frames) -> (frames, channels) f32``
with zero-fill outside the file, plus ``channels``/``rate``/``frames``;
writers expose sequential ``write(block)``.
"""

from __future__ import annotations

import pathlib
import struct
import typing

import numpy as np

from signals_tpu.runtime import wavio

F32 = np.float32


class SoundFileError(Exception):
    pass


# --- AIFF (big-endian PCM, 80-bit extended-float sample rate) ----------------


def _ext_float_decode(b: bytes) -> float:
    """80-bit IEEE 754 extended float -> python float (AIFF sample rate)."""
    (se,) = struct.unpack('>H', b[:2])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    hi, lo = struct.unpack('>II', b[2:10])
    mant = (hi << 32) | lo
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _ext_float_encode(x: float) -> bytes:
    """python float -> 80-bit extended float bytes."""
    if x == 0:
        return b'\0' * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    import math
    m, e = math.frexp(x)          # x = m * 2**e, m in [0.5, 1)
    exp = e - 1 + 16383
    mant = int(m * (1 << 64))
    return struct.pack('>HII', sign | exp, mant >> 32, mant & 0xFFFFFFFF)


class AiffReader:
    """Seekable AIFF reader (big-endian PCM 8/16/24/32)."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        self._f = self.path.open('rb')
        form, _, aiff = struct.unpack('>4sI4s', self._f.read(12))
        if form != b'FORM' or aiff not in (b'AIFF', b'AIFC'):
            raise SoundFileError(f'{self.path}: not an AIFF file')
        self._is_aifc = aiff == b'AIFC'
        self._data_offset = None
        comm = None
        while True:
            header = self._f.read(8)
            if len(header) < 8:
                break
            cid, size = struct.unpack('>4sI', header)
            if cid == b'COMM':
                comm = self._f.read(size)
                if size & 1:          # IFF chunks pad to even sizes
                    self._f.seek(1, 1)
            elif cid == b'SSND':
                offset, _blocksize = struct.unpack('>II', self._f.read(8))
                self._data_offset = self._f.tell() + offset
                self._f.seek(size - 8 + (size & 1), 1)
            else:
                self._f.seek(size + (size & 1), 1)
        if comm is None or self._data_offset is None:
            raise SoundFileError(f'{self.path}: missing COMM/SSND chunk')
        channels, nframes, bits = struct.unpack('>hIh', comm[:8])
        self.rate = int(round(_ext_float_decode(comm[8:18])))
        if self._is_aifc:
            # AIFC carries a compressionType after the rate; only
            # uncompressed big-endian PCM decodes like AIFF — reject
            # 'sowt' (little-endian), 'fl32', ulaw etc. instead of
            # producing byte-swapped garbage
            ctype = comm[18:22] if len(comm) >= 22 else b'NONE'
            if ctype not in (b'NONE', b'none'):
                raise SoundFileError(
                    f'{self.path}: AIFC compression {ctype!r} unsupported '
                    f'(install soundfile for libsndfile decoding)')
        if bits not in (8, 16, 24, 32):
            raise SoundFileError(f'{self.path}: unsupported depth {bits}')
        self.channels = channels
        self.bits = bits
        self.frames = nframes
        self._frame_bytes = channels * (bits // 8)

    def _decode(self, raw: bytes) -> np.ndarray:
        if self.bits == 8:          # AIFF 8-bit PCM is signed
            return (np.frombuffer(raw, dtype=np.int8).astype(np.float32)
                    / 128.0)
        if self.bits == 16:
            return (np.frombuffer(raw, dtype='>i2').astype(np.float32)
                    / 32768.0)
        if self.bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            i = ((b[:, 0].astype(np.int32) << 16)
                 | (b[:, 1].astype(np.int32) << 8)
                 | b[:, 2].astype(np.int32))
            i = np.where(i >= 1 << 23, i - (1 << 24), i)
            return i.astype(np.float32) / float(1 << 23)
        return (np.frombuffer(raw, dtype='>i4').astype(np.float32)
                / float(1 << 31))

    def read(self, position: int, frames: int) -> np.ndarray:
        out = np.zeros((frames, self.channels), dtype=F32)
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


class AiffWriter:
    """Sequential PCM16 AIFF writer; header kept valid after every block."""

    def __init__(self, path, *, rate: int, channels: int):
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.frames = 0
        self._f = self.path.open('wb')
        self._write_header()

    def _write_header(self) -> None:
        data_size = self.frames * self.channels * 2
        self._f.seek(0)
        self._f.write(struct.pack('>4sI4s', b'FORM', 4 + 26 + 16 + data_size,
                                  b'AIFF'))
        self._f.write(struct.pack('>4sIhIh', b'COMM', 18, self.channels,
                                  self.frames, 16))
        self._f.write(_ext_float_encode(float(self.rate)))
        self._f.write(struct.pack('>4sIII', b'SSND', 8 + data_size, 0, 0))

    def write(self, block: np.ndarray) -> None:
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[1] != self.channels:
            block = np.broadcast_to(block, (block.shape[0], self.channels))
        q = np.clip(np.rint(np.ascontiguousarray(block) * 32767.0),
                    -32768, 32767)
        self._f.seek(0, 2)
        self._f.write(q.astype('>i2').tobytes())
        self.frames += block.shape[0]
        self._write_header()
        self._f.flush()

    def close(self) -> None:
        self._write_header()
        self._f.close()


# --- AU / SND (Sun audio: trivial big-endian header) --------------------------

_AU_MAGIC = b'.snd'
_AU_MULAW = 1
_AU_PCM16 = 3
_AU_F32 = 6
_AU_ALAW = 27


class AuReader:
    """Seekable AU/SND reader (mu-law, A-law, PCM16 and float32 — mu-law
    being AU's native telephony encoding)."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        self._f = self.path.open('rb')
        magic, offset, size, enc, rate, channels = struct.unpack(
            '>4sIIIII', self._f.read(24))
        if magic != _AU_MAGIC:
            raise SoundFileError(f'{self.path}: not an AU file')
        if enc not in (_AU_PCM16, _AU_F32, _AU_MULAW, _AU_ALAW):
            raise SoundFileError(f'{self.path}: unsupported encoding {enc}')
        self._data_offset = offset
        self._enc = enc
        self.rate = rate
        self.channels = channels
        sb = {_AU_MULAW: 1, _AU_ALAW: 1, _AU_PCM16: 2, _AU_F32: 4}[enc]
        self._frame_bytes = channels * sb
        if size == 0xFFFFFFFF:      # unknown length: use the file size
            end = self._f.seek(0, 2)
            size = end - offset
        self.frames = size // self._frame_bytes

    def read(self, position: int, frames: int) -> np.ndarray:
        out = np.zeros((frames, self.channels), dtype=F32)
        start = max(position, 0)
        stop = min(position + frames, self.frames)
        if stop > start:
            self._f.seek(self._data_offset + start * self._frame_bytes)
            raw = self._f.read((stop - start) * self._frame_bytes)
            if self._enc == _AU_F32:
                data = np.frombuffer(raw, dtype='>f4').astype(np.float32)
            elif self._enc == _AU_MULAW:
                from signals_tpu.runtime import codecs
                data = codecs.mulaw_decode(
                    np, np.frombuffer(raw, dtype=np.uint8))
            elif self._enc == _AU_ALAW:
                from signals_tpu.runtime import codecs
                data = codecs.alaw_decode(
                    np, np.frombuffer(raw, dtype=np.uint8))
            else:
                data = (np.frombuffer(raw, dtype='>i2').astype(np.float32)
                        / 32768.0)
            data = data.reshape(-1, self.channels)
            out[start - position:start - position + data.shape[0]] = data
        return out

    def close(self) -> None:
        self._f.close()


class AuWriter:
    """Sequential AU writer (float32 default; PCM16, mu-law, A-law)."""

    _ENC = {'float32': _AU_F32, 'pcm16': _AU_PCM16, 'mulaw': _AU_MULAW,
            'alaw': _AU_ALAW}
    _SB = {'float32': 4, 'pcm16': 2, 'mulaw': 1, 'alaw': 1}

    def __init__(self, path, *, rate: int, channels: int,
                 subtype: str = 'float32'):
        if subtype not in self._ENC:
            raise SoundFileError(f'unsupported AU write subtype {subtype!r}')
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.subtype = subtype
        self.frames = 0
        self._f = self.path.open('wb')
        self._write_header()

    def _write_header(self) -> None:
        self._f.seek(0)
        self._f.write(struct.pack(
            '>4sIIIII', _AU_MAGIC, 24,
            self.frames * self.channels * self._SB[self.subtype],
            self._ENC[self.subtype], self.rate, self.channels))

    def write(self, block: np.ndarray) -> None:
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[1] != self.channels:
            block = np.broadcast_to(block, (block.shape[0], self.channels))
        block = np.ascontiguousarray(block)
        if self.subtype == 'float32':
            raw = block.astype('>f4').tobytes()
        elif self.subtype == 'pcm16':
            q = np.clip(np.rint(block * 32767.0), -32768, 32767)
            raw = q.astype('>i2').tobytes()
        else:
            from signals_tpu.runtime import codecs
            enc = (codecs.mulaw_encode if self.subtype == 'mulaw'
                   else codecs.alaw_encode)
            raw = enc(np, block).tobytes()
        self._f.seek(0, 2)
        self._f.write(raw)
        self.frames += block.shape[0]
        self._write_header()
        self._f.flush()

    def write_encoded(self, payload: np.ndarray, frames: int) -> None:
        """Append pre-encoded G.711 payload bytes (mu-law/A-law are
        byte-order free, so device-encoded bytes are the file bytes)."""
        if self.subtype not in ('mulaw', 'alaw'):
            raise SoundFileError(
                'write_encoded supports mulaw/alaw AU subtypes only')
        self._f.seek(0, 2)
        self._f.write(np.ascontiguousarray(payload)
                      .astype(np.uint8).tobytes())
        self.frames += int(frames)
        self._write_header()
        self._f.flush()

    def close(self) -> None:
        self._write_header()
        self._f.close()


# --- SLAC container (native lossless) -----------------------------------------
#
# ``.slac`` is this framework's own lossless stream format: the SLAC
# payload (:mod:`signals_tpu.runtime.codecs` — version 1 delta +
# per-block bit-packed PCM16, version 2 Rice-coded residuals; both
# device-encodable) in a 24-byte container.  It exists
# so device-lossless bounces (``bounce <at> <path.slac> <s> slac``) land
# in a file that round-trips bit-exactly; the closest reference analogue
# is libsndfile FLAC (``src/signals/chain/files.py:8``).

_SLAC_MAGIC = b'SLAC'


class SlacReader:
    """Seekable reader: the payload decodes once on open (SLAC blocks
    chain predictors, so random access works off the decoded PCM)."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        segments = []
        with self.path.open('rb') as f:
            hdr = f.read(24)
            if len(hdr) < 24 or hdr[:4] != _SLAC_MAGIC:
                raise SoundFileError(f'{self.path}: not a SLAC file')
            version, ch, rate, n_flat, plen = struct.unpack(
                '<BBIQ6s', hdr[4:])
            plen = int.from_bytes(plen, 'little')
            if version not in (1, 2, 3):
                raise SoundFileError(
                    f'{self.path}: unsupported SLAC version {version}')
            if version == 3:
                # multi-segment container (the pipelined streaming
                # bounce): a sequence of independently decodable
                # [plen:6][n_flat:8][payload] records, each SLAC v2
                # encoded from a fresh predictor state.  ``n_flat`` in
                # the header is the total; ``plen`` the sum of record
                # payload bytes.
                seen = 0
                while seen < plen:
                    rec = f.read(14)
                    if len(rec) < 14:
                        raise SoundFileError(
                            f'{self.path}: truncated SLAC segment record')
                    seg_len = int.from_bytes(rec[:6], 'little')
                    seg_flat = int.from_bytes(rec[6:], 'little')
                    segments.append((np.frombuffer(f.read(seg_len),
                                                   dtype=np.uint8),
                                     seg_flat))
                    seen += seg_len
            else:
                segments.append((np.frombuffer(f.read(plen),
                                               dtype=np.uint8),
                                 int(n_flat)))
        from signals_tpu.runtime import codecs
        self.rate = int(rate)
        self.channels = int(ch)
        decode = (codecs.slac_decode_np if version == 1
                  else codecs.slac2_decode_np)
        pcm = np.concatenate(
            [decode(p, nf, channels=self.channels) for p, nf in segments],
            axis=0)
        self._audio = pcm.astype(np.float32) / 32767.0
        self.frames = self._audio.shape[0]

    def read(self, position: int, frames: int) -> np.ndarray:
        out = np.zeros((frames, self.channels), dtype=np.float32)
        lo = max(0, position)
        hi = min(self.frames, position + frames)
        if hi > lo:
            out[lo - position:hi - position] = self._audio[lo:hi]
        return out

    def close(self) -> None:
        self._audio = None


class SlacWriter:
    """Sequential writer.  Float blocks buffer and encode on close (the
    predictors chain across the whole stream); device-encoded payloads
    append via :meth:`write_encoded` without touching the samples."""

    def __init__(self, path, *, rate: int, channels: int,
                 subtype: str = 'slac',
                 version: typing.Optional[int] = None):
        if subtype not in ('slac', 'float32'):
            raise SoundFileError(
                f'unsupported SLAC write subtype {subtype!r}')
        if version is None:
            from signals_tpu.runtime import codecs
            version = codecs.SLAC_STREAM_VERSION
        if version not in (1, 2):
            raise SoundFileError(f'unsupported SLAC version {version}')
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.version = int(version)
        self.frames = 0
        self._blocks: typing.Optional[list] = []
        self._payloads: list = []

    def write(self, block: np.ndarray) -> None:
        if self._blocks is None:
            raise SoundFileError(
                'cannot mix write() and write_encoded() in one SLAC file')
        block = np.asarray(block, dtype=np.float32)
        block = np.broadcast_to(block, (block.shape[0], self.channels))
        self._blocks.append(np.ascontiguousarray(block))
        self.frames += block.shape[0]

    def write_encoded(self, payload: np.ndarray, frames: int, *,
                      version: typing.Optional[int] = None) -> None:
        """Append one device-encoded payload.

        Each payload must be independently decodable (encoded from a
        fresh predictor state — what every ``slac2_encode_jax``/``_np``
        call produces).  A single payload writes the classic v2
        single-payload container; multiple appends (the pipelined
        streaming bounce, ``CompiledPatch.render_encoded_stream``) write
        the v3 multi-segment container, whose records decode
        independently and concatenate — predictor reset at batch
        boundaries costs one block of Rice-parameter warmup per segment,
        ~0.1% on a 60 s batch.
        """
        if self._blocks:
            raise SoundFileError(
                'cannot mix write() and write_encoded() in one SLAC file')
        if version is not None:
            if version not in (1, 2):
                raise SoundFileError(
                    f'unsupported SLAC version {version}')
            if self._payloads and version != self.version:
                raise SoundFileError('mixed SLAC payload versions')
            self.version = int(version)   # payload dictates the container
        if self._payloads and self.version == 1:
            # v1 payloads chain predictors from stream start — they can
            # never concatenate (the v3 multi-segment container is
            # v2-only)
            raise SoundFileError('v1 payloads cannot multi-segment')
        self._blocks = None
        self._payloads.append((np.ascontiguousarray(payload)
                               .astype(np.uint8),
                               int(frames) * self.channels))
        self.frames += int(frames)

    def close(self) -> None:
        from signals_tpu.runtime import codecs
        if self._blocks is not None:
            audio = (np.concatenate(self._blocks, axis=0) if self._blocks
                     else np.zeros((0, self.channels), np.float32))
            encode = (codecs.slac_encode_np if self.version == 1
                      else codecs.slac2_encode_np)
            payload, n_flat = encode(audio)
            records = None
        elif len(self._payloads) == 1:
            payload, n_flat = self._payloads[0]
            records = None
        else:
            records = self._payloads
            n_flat = self.frames * self.channels
        with self.path.open('wb') as f:
            f.write(_SLAC_MAGIC)
            if records is None:
                f.write(struct.pack('<BBIQ', self.version, self.channels,
                                    self.rate, n_flat))
                f.write(int(payload.shape[0]).to_bytes(6, 'little'))
                f.write(payload.tobytes())
            else:
                # v3 multi-segment: header plen = sum of record payload
                # bytes; then [plen:6][n_flat:8][payload] per segment
                total = sum(int(p.shape[0]) for p, _ in records)
                f.write(struct.pack('<BBIQ', 3, self.channels,
                                    self.rate, n_flat))
                f.write(total.to_bytes(6, 'little'))
                for p, nf in records:
                    f.write(int(p.shape[0]).to_bytes(6, 'little'))
                    f.write(int(nf).to_bytes(8, 'little'))
                    f.write(p.tobytes())
        self._blocks, self._payloads = [], []


# --- libsndfile dispatch (optional) ------------------------------------------


def _soundfile():
    try:
        import soundfile
    except ImportError:
        return None
    return soundfile


def soundfile_available() -> bool:
    return _soundfile() is not None


class LibSndReader:
    """Position-addressed reads through soundfile/libsndfile (the
    reference's backend, ``files.py:44-58``: lazy open + seek)."""

    def __init__(self, path, sf_module=None):
        sf = sf_module if sf_module is not None else _soundfile()
        if sf is None:
            raise SoundFileError(
                f'{path}: format requires the soundfile package')
        self.path = pathlib.Path(path)
        self._sf = sf.SoundFile(str(path), mode='r')
        self.channels = self._sf.channels
        self.rate = int(self._sf.samplerate)
        self.frames = len(self._sf)

    def read(self, position: int, frames: int) -> np.ndarray:
        out = np.zeros((frames, self.channels), dtype=F32)
        start = max(position, 0)
        stop = min(position + frames, self.frames)
        if stop > start:
            self._sf.seek(start)
            data = self._sf.read(stop - start, dtype='float32',
                                 always_2d=True)
            out[start - position:start - position + data.shape[0]] = data
        return out

    def close(self) -> None:
        self._sf.close()


class LibSndWriter:
    """Sequential writes through soundfile/libsndfile (format from the
    extension, e.g. ``.flac``/``.ogg``)."""

    def __init__(self, path, *, rate: int, channels: int, sf_module=None):
        sf = sf_module if sf_module is not None else _soundfile()
        if sf is None:
            raise SoundFileError(
                f'{path}: format requires the soundfile package')
        self.path = pathlib.Path(path)
        self.rate = int(rate)
        self.channels = int(channels)
        self.frames = 0
        self._sf = sf.SoundFile(str(path), mode='w', samplerate=self.rate,
                                channels=self.channels)

    def write(self, block: np.ndarray) -> None:
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[1] != self.channels:
            block = np.broadcast_to(block, (block.shape[0], self.channels))
        self._sf.write(np.ascontiguousarray(block))
        self.frames += block.shape[0]

    def close(self) -> None:
        self._sf.close()


# --- dispatch -----------------------------------------------------------------

_NATIVE_READERS = {
    '.wav': wavio.WavReader,
    '.wave': wavio.WavReader,
    '.aif': AiffReader,
    '.aiff': AiffReader,
    '.aifc': AiffReader,
    '.au': AuReader,
    '.snd': AuReader,
    '.slac': SlacReader,
}

_NATIVE_WRITERS = {
    '.wav': wavio.WavWriter,
    '.wave': wavio.WavWriter,
    '.aif': AiffWriter,
    '.aiff': AiffWriter,
    '.aifc': AiffWriter,
    '.au': AuWriter,
    '.snd': AuWriter,
    '.slac': SlacWriter,
}


def open_reader(path, sf_module=None):
    """Open a seekable reader for any supported format (native codecs for
    WAV/AIFF/AU; libsndfile for everything else when available)."""
    ext = pathlib.Path(path).suffix.lower()
    cls = _NATIVE_READERS.get(ext)
    if cls is not None:
        return cls(path)
    sf = sf_module if sf_module is not None else _soundfile()
    if sf is not None:
        return LibSndReader(path, sf_module=sf)
    raise SoundFileError(
        f'{path}: unsupported format {ext!r} (install soundfile for '
        f'libsndfile formats; native support: '
        f'{", ".join(sorted(_NATIVE_READERS))})')


def open_writer(path, *, rate: int, channels: int, subtype: str = 'float32',
                sf_module=None):
    """Open a sequential writer, dispatched like :func:`open_reader`.

    ``subtype`` selects the sample encoding where the container supports a
    choice: WAV accepts ``float32``/``pcm16``/``mulaw``/``alaw``/``adpcm``,
    AU accepts ``float32``/``pcm16``/``mulaw``/``alaw``; AIFF and
    libsndfile targets use their writers' defaults."""
    import os
    if str(path) == os.devnull:      # discard target (the default path)
        return wavio.WavWriter(path, rate=rate, channels=channels)
    ext = pathlib.Path(path).suffix.lower()
    cls = _NATIVE_WRITERS.get(ext)
    if cls is not None:
        if cls in (wavio.WavWriter, AuWriter, SlacWriter):
            return cls(path, rate=rate, channels=channels, subtype=subtype)
        if subtype != 'float32':
            raise SoundFileError(
                f'{path}: subtype {subtype!r} not supported for {ext!r}')
        return cls(path, rate=rate, channels=channels)
    sf = sf_module if sf_module is not None else _soundfile()
    if sf is not None:
        return LibSndWriter(path, rate=rate, channels=channels, sf_module=sf)
    raise SoundFileError(
        f'{path}: unsupported format {ext!r} (install soundfile for '
        f'libsndfile formats; native support: '
        f'{", ".join(sorted(_NATIVE_WRITERS))})')
