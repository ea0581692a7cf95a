"""ctypes bindings for the native C++ runtime sidecar (libwhisper_rt.so).

The reference's host-side native layer (Rust: hound WAV decode, BufReader GGML
streaming, std::thread mel workers — /root/reference/src/main.rs:766-770,
1380-1481, 1581-1644) maps here to a small C++ library that handles the
off-device work: WAV decode and zero-copy (mmap) GGML checkpoint parsing.
TPU compute never goes through this layer — it exists so model load and audio
ingest don't bottleneck the pipeline on Python loops.

Falls back cleanly (returns None) when the library has not been built; the
pure-Python implementations in whisper_tpu.io are then used.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATHS = [
    os.path.join(_HERE, "native", "libwhisper_rt.so"),
    os.path.join(_HERE, "libwhisper_rt.so"),
]


def build(quiet: bool = True) -> bool:
    """Compile libwhisper_rt.so in-tree (g++; ~1 s). Returns success."""
    import subprocess

    src_dir = os.path.join(_HERE, "native")
    try:
        res = subprocess.run(
            ["make", "-C", src_dir],
            capture_output=quiet,
            timeout=120,
            check=False,
        )
        return res.returncode == 0 and os.path.exists(_LIB_PATHS[0])
    except Exception:  # noqa: BLE001
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not any(os.path.exists(p) for p in _LIB_PATHS):
        build()  # lazy first-use build; falls through to Python on failure
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            _configure(lib)
            _LIB = lib
            break
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    lib.wrt_load_wav.restype = ctypes.c_void_p
    lib.wrt_load_wav.argtypes = [ctypes.c_char_p]
    lib.wrt_wav_rate.restype = ctypes.c_int
    lib.wrt_wav_rate.argtypes = [ctypes.c_void_p]
    lib.wrt_wav_len.restype = ctypes.c_longlong
    lib.wrt_wav_len.argtypes = [ctypes.c_void_p]
    lib.wrt_wav_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.wrt_wav_data.argtypes = [ctypes.c_void_p]
    lib.wrt_wav_free.argtypes = [ctypes.c_void_p]

    lib.wrt_open_ggml.restype = ctypes.c_void_p
    lib.wrt_open_ggml.argtypes = [ctypes.c_char_p]
    lib.wrt_ggml_error.restype = ctypes.c_char_p
    lib.wrt_ggml_error.argtypes = [ctypes.c_void_p]
    lib.wrt_ggml_header.restype = ctypes.POINTER(ctypes.c_int)
    lib.wrt_ggml_header.argtypes = [ctypes.c_void_p]
    lib.wrt_ggml_filters.restype = ctypes.POINTER(ctypes.c_float)
    lib.wrt_ggml_filters.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.wrt_ggml_n_vocab.restype = ctypes.c_int
    lib.wrt_ggml_n_vocab.argtypes = [ctypes.c_void_p]
    lib.wrt_ggml_token.restype = ctypes.POINTER(ctypes.c_char)
    lib.wrt_ggml_token.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.wrt_ggml_n_tensors.restype = ctypes.c_int
    lib.wrt_ggml_n_tensors.argtypes = [ctypes.c_void_p]
    lib.wrt_ggml_tensor_name.restype = ctypes.c_char_p
    lib.wrt_ggml_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wrt_ggml_tensor_info.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),   # ftype
        ctypes.POINTER(ctypes.c_int),   # n_dims
        ctypes.POINTER(ctypes.c_int),   # ne[4]
        ctypes.POINTER(ctypes.c_void_p),  # data ptr
    ]
    lib.wrt_ggml_close.argtypes = [ctypes.c_void_p]

    lib.wrt_loader_open.restype = ctypes.c_void_p
    lib.wrt_loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
    lib.wrt_loader_get.restype = ctypes.c_void_p
    lib.wrt_loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wrt_loader_close.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def native_load_wav(path: str) -> Optional[Tuple[int, np.ndarray]]:
    """WAV decode via the C++ sidecar. Returns (rate, mono f32 PCM) or None."""
    lib = _load()
    if lib is None:
        return None
    h = lib.wrt_load_wav(path.encode())
    if not h:
        return None
    try:
        rate = lib.wrt_wav_rate(h)
        n = lib.wrt_wav_len(h)
        ptr = lib.wrt_wav_data(h)
        audio = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        return rate, audio
    finally:
        lib.wrt_wav_free(h)


def native_open_ggml(path: str):
    """mmap-backed GGML parse via the C++ sidecar.

    Returns (header_list, filters(np), tokens(list[bytes]),
    tensors: name -> np array (zero-copy views into the mapping are copied)),
    or None when the sidecar is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.wrt_open_ggml(path.encode())
    if not h:
        return None
    try:
        err = lib.wrt_ggml_error(h)
        if err:
            raise RuntimeError(err.decode())
        hdr_ptr = lib.wrt_ggml_header(h)
        header = [hdr_ptr[i] for i in range(11)]
        n_mel = ctypes.c_int()
        n_fft = ctypes.c_int()
        fptr = lib.wrt_ggml_filters(h, ctypes.byref(n_mel), ctypes.byref(n_fft))
        filters = np.ctypeslib.as_array(fptr, shape=(n_mel.value, n_fft.value)).copy()
        n_vocab = lib.wrt_ggml_n_vocab(h)
        tokens = []
        tlen = ctypes.c_int()
        for i in range(n_vocab):
            tp = lib.wrt_ggml_token(h, i, ctypes.byref(tlen))
            tokens.append(ctypes.string_at(tp, tlen.value))
        tensors = {}
        n_t = lib.wrt_ggml_n_tensors(h)
        ftype = ctypes.c_int()
        ndims = ctypes.c_int()
        ne = (ctypes.c_int * 4)()
        dptr = ctypes.c_void_p()
        for i in range(n_t):
            name = lib.wrt_ggml_tensor_name(h, i).decode()
            lib.wrt_ggml_tensor_info(h, i, ctypes.byref(ftype), ctypes.byref(ndims), ne, ctypes.byref(dptr))
            np_shape = tuple(reversed([ne[d] for d in range(ndims.value)]))
            dt = np.float32 if ftype.value == 0 else np.float16
            count = int(np.prod(np_shape))
            buf = (ctypes.c_char * (count * np.dtype(dt).itemsize)).from_address(dptr.value)
            tensors[name] = np.frombuffer(buf, dtype=dt).reshape(np_shape).copy()
        return header, filters, tokens, tensors
    finally:
        lib.wrt_ggml_close(h)


class NativeAudioLoader:
    """Threaded WAV prefetcher over the C++ sidecar.

    N worker threads decode (and downmix) files in the background while the
    caller consumes them in submission order — the serving engine's admission
    path overlaps disk/decode with device work. Falls back to synchronous
    Python decode when the sidecar is unavailable.

    >>> for idx, rate, audio in NativeAudioLoader(paths, n_threads=4):
    ...     engine_submit(audio)
    """

    def __init__(self, paths, n_threads: int = 4):
        self.paths = list(paths)
        self._lib = _load()
        self._h = None
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = self._lib.wrt_loader_open(
                arr, len(self.paths), int(n_threads))

    def get(self, index: int) -> Optional[Tuple[int, np.ndarray]]:
        """(rate, mono f32 PCM) for file ``index`` — blocks until decoded."""
        if self._h is None:  # python fallback
            return native_load_wav(self.paths[index]) or self._py_load(index)
        w = self._lib.wrt_loader_get(self._h, index)
        if not w:
            return None
        try:
            rate = self._lib.wrt_wav_rate(w)
            n = self._lib.wrt_wav_len(w)
            ptr = self._lib.wrt_wav_data(w)
            return rate, np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        finally:
            self._lib.wrt_wav_free(w)

    def _py_load(self, index: int):
        from ..io.wav import load_wav

        return 16000, load_wav(self.paths[index])

    def __iter__(self):
        for i in range(len(self.paths)):
            item = self.get(i)
            if item is not None:
                yield (i, item[0], item[1])

    def close(self):
        if self._h is not None:
            self._lib.wrt_loader_close(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
