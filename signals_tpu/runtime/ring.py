"""ctypes binding to the native ring buffer + paced consumer
(:mod:`signals_tpu.runtime.native`), with a pure-Python fallback.

The native library is built on demand with ``make`` (g++); if no toolchain
is available the Python fallback keeps everything working (slower, and the
consumer pacing uses Python threading, so only suitable for tests).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
import time
import typing

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).parent / 'native'
_LIB_PATH = _NATIVE_DIR / 'libsigring.so'

_lib: typing.Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> typing.Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = _NATIVE_DIR / 'ring.cc'
    stale = (_LIB_PATH.exists() and src.exists()
             and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    if not _LIB_PATH.exists() or stale:
        try:
            subprocess.run(['make', '-C', str(_NATIVE_DIR)]
                           + (['-B'] if stale else []), check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            if not _LIB_PATH.exists():
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.sig_ring_create.restype = ctypes.c_void_p
    lib.sig_ring_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    lib.sig_ring_destroy.argtypes = [ctypes.c_void_p]
    for name in ('sig_ring_readable', 'sig_ring_writable'):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    for name in ('sig_ring_write', 'sig_ring_read'):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint32
        fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                       ctypes.c_uint32]
    lib.sig_ring_capacity.restype = ctypes.c_uint32
    lib.sig_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.sig_consumer_start.restype = ctypes.c_void_p
    lib.sig_consumer_start.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                       ctypes.c_uint32, ctypes.c_int,
                                       ctypes.c_int]
    lib.sig_consumer_stop.argtypes = [ctypes.c_void_p]
    for name in ('sig_consumer_frames', 'sig_consumer_underruns'):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_native() is not None


class RingBuffer:
    """SPSC float32 frame ring.  Native when possible."""

    def __init__(self, *, capacity_frames: int, channels: int):
        self.channels = channels
        lib = _load_native()
        self._lib = lib
        if lib is not None:
            self._handle = lib.sig_ring_create(capacity_frames, channels)
            self.capacity = lib.sig_ring_capacity(self._handle)
        else:
            self._handle = None
            self.capacity = 1 << (capacity_frames - 1).bit_length()
            self._buf: typing.Deque[np.ndarray] = None  # type: ignore
            self._data = np.zeros((self.capacity, channels),
                                  dtype=np.float32)
            self._head = 0
            self._tail = 0
            self._lock = threading.Lock()

    def write(self, block: np.ndarray) -> int:
        block = np.ascontiguousarray(block, dtype=np.float32)
        if self._handle is not None:
            ptr = block.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return self._lib.sig_ring_write(self._handle, ptr,
                                            block.shape[0])
        with self._lock:
            free = self.capacity - (self._head - self._tail)
            n = min(block.shape[0], free)
            for i in range(n):
                self._data[(self._head + i) % self.capacity] = block[i]
            self._head += n
            return n

    def read(self, frames: int) -> np.ndarray:
        out = np.zeros((frames, self.channels), dtype=np.float32)
        got = self.read_into(out)
        return out[:got]

    def read_into(self, out: np.ndarray) -> int:
        out = np.ascontiguousarray(out, dtype=np.float32)
        if self._handle is not None:
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return self._lib.sig_ring_read(self._handle, ptr, out.shape[0])
        with self._lock:
            avail = self._head - self._tail
            n = min(out.shape[0], avail)
            for i in range(n):
                out[i] = self._data[(self._tail + i) % self.capacity]
            self._tail += n
            return n

    @property
    def readable(self) -> int:
        if self._handle is not None:
            return self._lib.sig_ring_readable(self._handle)
        with self._lock:
            return self._head - self._tail

    @property
    def writable(self) -> int:
        if self._handle is not None:
            return self._lib.sig_ring_writable(self._handle)
        with self._lock:
            return self.capacity - (self._head - self._tail)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.sig_ring_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PacedConsumer:
    """Drains a ring at the sample rate on its own thread — the virtual
    output device.  Underruns are zero-filled and counted.

    ``fmt='pcm16'`` makes the fd writer emit 16-bit PCM (the production
    stream format: pipe it to a player, a device node, or a .raw file)
    instead of raw float32.
    """

    def __init__(self, ring: RingBuffer, *, rate: float, block_frames: int,
                 fd: int = -1, fmt: str = 'f32'):
        if fmt not in ('f32', 'pcm16'):
            raise ValueError(fmt)
        self.ring = ring
        self.rate = rate
        self.block_frames = block_frames
        self._fd = fd
        self._native = ring._handle is not None
        if self._native:
            self._handle = ring._lib.sig_consumer_start(
                ring._handle, float(rate), block_frames, fd,
                1 if fmt == 'pcm16' else 0)
        else:
            self._underruns = 0
            self._frames = 0
            self._running = threading.Event()
            self._running.set()
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self) -> None:
        start = time.monotonic()
        emitted = 0
        block = self.block_frames
        while self._running.is_set():
            due = int((time.monotonic() - start) * self.rate)
            if due >= emitted + block:
                out = np.zeros((block, self.ring.channels), np.float32)
                got = self.ring.read_into(out)
                if got < block:
                    self._underruns += 1
                emitted += block
                self._frames = emitted
            else:
                time.sleep((emitted + block - due) / self.rate / 2 + 1e-4)

    @property
    def frames(self) -> int:
        if self._native:
            if self._handle is None:
                return self._final_frames
            return self.ring._lib.sig_consumer_frames(self._handle)
        return self._frames

    @property
    def underruns(self) -> int:
        if self._native:
            if self._handle is None:
                return self._final_underruns
            return self.ring._lib.sig_consumer_underruns(self._handle)
        return self._underruns

    def stop(self) -> None:
        if self._native:
            if self._handle is not None:
                # counters survive stop: capture before the native free
                self._final_frames = self.frames
                self._final_underruns = self.underruns
                self.ring._lib.sig_consumer_stop(self._handle)
                self._handle = None
        else:
            self._running.clear()
            self._thread.join(timeout=2)
