"""Shared compile-and-load helper for the ctypes-bound C++ host libraries.

Both native decoders (native/wavloader.cpp, native/sphio.cpp) follow the
same lifecycle: optional env-var override to a prebuilt .so, mtime-based
staleness check against the source, g++ build to a temp file + atomic
rename (safe under concurrent builds), then a lock-guarded one-shot CDLL
load with signature configuration.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional


class NativeLib:
    """Lazy builder/loader for one shared library."""

    def __init__(self, src_path: str, so_name: str, env_var: str,
                 configure: Callable[[ctypes.CDLL], None],
                 extra_flags: tuple = ()):
        self._src = os.path.abspath(src_path)
        self._so_name = so_name
        self._env_var = env_var
        self._configure = configure
        self._extra_flags = tuple(extra_flags)
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def _build(self) -> Optional[str]:
        so_env = os.environ.get(self._env_var)
        if so_env and os.path.exists(so_env):
            return so_env
        if not os.path.exists(self._src):
            return None
        so = os.path.join(os.path.dirname(self._src), self._so_name)
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(self._src):
            return so
        tmp = f"{so}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 *self._extra_flags, self._src, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
            return so
        except (subprocess.SubprocessError, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None

    def get(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._tried:
                return self._lib
            self._tried = True
            so = self._build()
            if so is None:
                return None
            try:
                lib = ctypes.CDLL(so)
                self._configure(lib)
            except OSError:
                return None
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        return self.get() is not None
